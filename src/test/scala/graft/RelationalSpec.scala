package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.CatalogOps
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asOfJoin attaches the latest right value at or before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, "k1", ts(10)), (2L, "k1", ts(20)), (3L, "k2", ts(10)),
      (4L, "k3", ts(10))) // k3 has no right rows at all
      .toDF("event_id", "key", "ts")
    val right = Seq(
      ("k1", ts(5), 100L), ("k1", ts(15), 101L), ("k1", ts(20), 102L),
      ("k2", ts(11), 200L)) // k2's only right row is AFTER the left ts
      .toDF("key", "ts", "val")
    val out = Relational.asOfJoin(left, right, "key", "ts", "ts", "val", "asof")
      .select("event_id", "asof").as[(Long, Option[Long])].collect().toMap
    out(1L) shouldBe Some(100L) // 5 <= 10 wins
    out(2L) shouldBe Some(102L) // right at exactly leftTs is visible
    out(3L) shouldBe None       // nothing at or before
    out(4L) shouldBe None       // no right rows for the key
  }

  test("asOfJoinNative equals the composed asOfJoin and plans the custom exec") {
    import spark.implicits._
    // matches, a time tie on the right (→ max value), a left time
    // before any right row, a key absent on the right
    val left = Seq((1L, 10L), (1L, 25L), (1L, 5L), (2L, 50L), (3L, 7L))
      .toDF("k", "t")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 10L, 200.0), (1L, 20L, 300.0),
      (2L, 60L, 400.0)).toDF("k", "t", "v")
    val native = Relational
      .asOfJoinNative(left, right, "k", "t", "t", "v", "pv")
    val composed = Relational.asOfJoin(left, right, "k", "t", "t", "v", "pv")
    val got = native.as[(Long, Long, Option[Double])].collect().toSet
    got shouldBe composed.as[(Long, Long, Option[Double])].collect().toSet
    got shouldBe Set((1L, 10L, Some(200.0)), (1L, 25L, Some(300.0)),
      (1L, 5L, None), (2L, 50L, None), (3L, 7L, None))
    val plan = native.queryExecution.executedPlan.toString
    plan should include("AsOfJoin ") // TreeNode.nodeName strips "Exec"
    (plan should not).include("Window")
    "Exchange".r.findAllIn(plan).length shouldBe 2
  }

  test("asOfJoinNative: null times never match; self-scan inputs dedup cleanly") {
    import spark.implicits._
    // a null right time must be skipped (SQL three-valued <=), and a
    // null left time emits null — stricter than the composed window
    // form, same as SQL ASOF JOIN
    val left = Seq((1L, Some(8L)), (1L, None)).toDF("k", "t")
    val right = Seq((1L, None, 999.0), (1L, Some(6L), 1.0))
      .toDF("k", "t", "v")
    Relational.asOfJoinNative(left, right, "k", "t", "t", "v", "pv")
      .as[(Long, Option[Long], Option[Double])].collect().toSet shouldBe
      Set((1L, Some(8L), Some(1.0)), (1L, None, None))
    // null KEYS match nothing either (SQL equality), even though the
    // natural sort ordering groups them together
    val lNull = Seq((Option.empty[Long], 10L), (Some(2L), 10L))
      .toDF("k", "t")
    val rNull = Seq((Option.empty[Long], 5L, 7.0), (Some(2L), 5L, 8.0))
      .toDF("k", "t", "v")
    Relational.asOfJoinNative(lNull, rNull, "k", "t", "t", "v", "pv")
      .as[(Option[Long], Long, Option[Double])].collect().toSet shouldBe
      Set((None, 10L, None), (Some(2L), 10L, Some(8.0)))
    // both sides carved from ONE plan (q22's shape): attribute ids
    // collide and the builder must re-alias the right side
    val base = Seq((1L, 10L, 5.0), (1L, 20L, 6.0)).toDF("k", "t", "v")
    val out = Relational.asOfJoinNative(
      base.filter(col("t") === 20L), base.filter(col("t") === 10L),
      "k", "t", "t", "v", "pv")
    out.as[(Long, Long, Double, Option[Double])].collect().toSet shouldBe
      Set((1L, 20L, 6.0, Some(5.0)))
  }

  test("asOfJoinNative equals the composed asOfJoin on randomized collision-heavy inputs") {
    import spark.implicits._
    import org.scalacheck.Gen
    // tiny key/time domains force same-key pile-ups, exact time ties,
    // duplicate left rows, keys missing on either side
    val seed = org.scalacheck.rng.Seed(7L)
    val gen = for {
      k <- Gen.choose(0L, 6L)
      t <- Gen.choose(0L, 30L)
      v <- Gen.choose(0, 99).map(_.toDouble)
    } yield (k, t, v)
    val rows = Gen.listOfN(400, gen)
      .pureApply(Gen.Parameters.default, seed)
    val left = rows.take(150).map { case (k, t, _) => (k, t) }.toDF("k", "t")
    val right = rows.drop(150).toDF("k", "t", "v")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Option[Double])].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
    multiset(Relational.asOfJoinNative(
      left, right, "k", "t", "t", "v", "pv")) shouldBe
      multiset(Relational.asOfJoin(left, right, "k", "t", "t", "v", "pv"))
  }

  test("asOfJoinNative forward direction and tolerance") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 19L), (1L, 30L), (2L, 5L)).toDF("k", "t")
    val right = Seq(
      (1L, 20L, 1.0), (1L, 20L, 2.0), (1L, 28L, 3.0), (2L, 50L, 9.0))
      .toDF("k", "t", "v")
    // forward, unbounded: smallest right t >= left t; time tie → max value
    Relational.asOfJoinNative(left, right, "k", "t", "t", "v", "nv",
        direction = "forward")
      .as[(Long, Long, Option[Double])].collect().toSet shouldBe Set(
      (1L, 10L, Some(2.0)), (1L, 19L, Some(2.0)),
      (1L, 30L, None), (2L, 5L, Some(9.0)))
    // forward, tolerance 5: the 10→20 and 5→50 candidates are beyond
    // the window and null out WITHOUT dropping the row
    Relational.asOfJoinNative(left, right, "k", "t", "t", "v", "nv",
        direction = "forward", tolerance = 5L)
      .as[(Long, Long, Option[Double])].collect().toSet shouldBe Set(
      (1L, 10L, None), (1L, 19L, Some(2.0)),
      (1L, 30L, None), (2L, 5L, None))
    // backward, tolerance 5: only 30's candidate (28, two away) survives
    Relational.asOfJoinNative(left, right, "k", "t", "t", "v", "pv",
        tolerance = 5L)
      .as[(Long, Long, Option[Double])].collect().toSet shouldBe Set(
      (1L, 10L, None), (1L, 19L, None),
      (1L, 30L, Some(3.0)), (2L, 5L, None))
    // loud failures: bad direction; non-orderable (map) value column
    an[IllegalArgumentException] should be thrownBy
      Relational.asOfJoinNative(left, right, "k", "t", "t", "v", "pv",
        direction = "sideways")
    val rMap = right.withColumn("m", map(col("k"), col("v")))
    the[IllegalArgumentException] thrownBy {
      Relational.asOfJoinNative(left, rMap, "k", "t", "t", "m", "pm")
    } should have message
      "requirement failed: right value column m has non-orderable type map<bigint,double>"
  }

  test("asOfJoinNative forward equals a brute-force reference on randomized inputs") {
    import spark.implicits._
    import org.scalacheck.Gen
    val seed = org.scalacheck.rng.Seed(11L)
    val gen = for {
      k <- Gen.choose(0L, 6L)
      t <- Gen.choose(0L, 30L)
      v <- Gen.choose(0, 99).map(_.toDouble)
    } yield (k, t, v)
    val rows = Gen.listOfN(400, gen)
      .pureApply(Gen.Parameters.default, seed)
    val leftRows = rows.take(150).map { case (k, t, _) => (k, t) }
    val rightRows = rows.drop(150)
    def expected(tol: Long): Map[(Long, Long, Option[Double]), Int] =
      leftRows.map { case (k, t) =>
        val cands = rightRows.filter(r => r._1 == k && r._2 >= t &&
          (tol < 0 || r._2 - t <= tol))
        val v = if (cands.isEmpty) None
        else Some(cands.minBy(r => (r._2, -r._3))._3)
        (k, t, v)
      }.groupBy(identity).view.mapValues(_.length).toMap
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Option[Double])].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
    for (tol <- Seq(-1L, 0L, 3L)) {
      multiset(Relational.asOfJoinNative(
        leftRows.toDF("k", "t"), rightRows.toDF("k", "t", "v"),
        "k", "t", "t", "v", "nv",
        direction = "forward", tolerance = tol)) shouldBe expected(tol)
    }
  }

  test("sessionize opens a new session exactly past the gap") {
    import spark.implicits._
    val df = Seq(
      ("u1", ts(0)), ("u1", ts(100)), ("u1", ts(100 + 1800)), // gap == limit: same session
      ("u1", ts(100 + 1800 + 1801)),                          // gap > limit: new session
      ("u2", ts(50))).toDF("user", "ts")
    val out = Relational.sessionize(df, col("user"), col("ts"), 1800L)
      .select("user", "ts", "session_id").as[(String, Timestamp, Long)]
      .collect().sortBy(r => (r._1, r._2.getTime))
    out.map(_._3).toList shouldBe List(0L, 0L, 0L, 1L, 0L)
  }

  test("topKPerGroup keeps exactly k with deterministic tie-break") {
    import spark.implicits._
    val df = Seq(("g", 5, 1), ("g", 5, 2), ("g", 3, 3), ("g", 9, 4), ("h", 1, 5))
      .toDF("grp", "score", "id")
    val out = Relational.topKPerGroup(df, Seq(col("grp")),
      Seq(col("score").desc, col("id")), 2)
      .select("grp", "id").as[(String, Int)].collect().toSet
    out shouldBe Set(("g", 4), ("g", 1), ("h", 5))
  }

  test("capPerGroup caps per key, not globally") {
    import spark.implicits._
    val df = (1 to 10).flatMap(i => Seq(("a", i), ("b", i))).toDF("k", "v")
    val out = CatalogOps.capPerGroup(df, col("k"), Seq(col("v")), 4)
    out.groupBy("k").count().as[(String, Long)].collect().toMap shouldBe
      Map("a" -> 4L, "b" -> 4L)
    // and keeps the FIRST n in order
    out.filter(col("k") === "a").select("v").as[Int].collect().sorted shouldBe
      Array(1, 2, 3, 4)
  }

  test("trimHeadTail drops positional head and tail rows per group") {
    import spark.implicits._
    val df = (1 to 6).map(("g", _)).toDF("k", "v") // 6 rows
    val out = CatalogOps.trimHeadTail(df, col("k"), col("v"), 3, 1)
      .select("v").as[Int].collect().sorted
    out shouldBe Array(4, 5) // drop rn<=3 and the last
  }

  test("saltedCountDistinct is exact and matches plain countDistinct") {
    import spark.implicits._
    val r = new scala.util.Random(3L)
    val df = (1 to 2000).map(_ => ("hot", r.nextInt(300).toLong))
      .++((1 to 50).map(i => ("cold", i.toLong))).toDF("k", "v")
    val plain = df.groupBy("k").agg(countDistinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Relational.saltedCountDistinct(
      df, Seq(col("k")), col("v"), salt = 16, outCol = "n")
      .as[(String, Long)].collect().toMap
    salted shouldBe plain
  }

  test("skewedJoin equals the plain inner join, spreads hot keys, keeps misses out") {
    import spark.implicits._
    // key 7 is hot (80 of 100 fact rows); key 99 has no dim row;
    // dim key 5 has no fact rows
    val fact = ((1 to 80).map(i => (7L, i.toLong)) ++
      (1 to 19).map(i => (i.toLong % 4, 100L + i)) :+ ((99L, 200L)))
      .toDF("fk", "row_id")
    val dim = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (5L, "unmatched")).toDF("dk", "label")
    val out = Relational.skewedJoin(fact, dim, "fk", "dk",
      factId = col("row_id"), hotKeys = Seq(7L), salt = 8)
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "row_id", "dk", "label")
    out.columns.toSeq shouldBe Seq("fk", "row_id", "dk", "label")
    out.collect().toSet shouldBe plain.collect().toSet
    // the hot key's fact rows really land in more than one salt cell
    // (deterministic hash over 80 distinct ids across 8 cells)
    val cells = fact.filter(col("fk") === 7L)
      .select(pmod(xxhash64(col("row_id")), lit(8L)))
      .distinct().count()
    cells should be > 1L
  }

  test("skewedJoin plans a shuffled join keyed on (key, salt cell) when broadcast is off") {
    import spark.implicits._
    val fact = (1 to 50).map(i => (7L, i.toLong)).toDF("fk", "row_id")
    val dim = Seq((7L, "hot"), (8L, "cold")).toDF("dk", "label")
    val conf = spark.conf
    val old = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = Relational.skewedJoin(fact, dim, "fk", "dk",
        factId = col("row_id"), hotKeys = Seq(7L), salt = 4)
      val plan = out.queryExecution.executedPlan.toString
      // the join must be a shuffled one whose keys include the salt
      // cell — that is the property that spreads a hot key at scale
      plan should include("SortMergeJoin")
      plan should include("_gsalt")
      plan should not include "BroadcastHashJoin"
      out.count() shouldBe 50L
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("rangeJoin equals the naive theta join across cell boundaries") {
    import spark.implicits._
    // intervals chosen to cover: inside one cell, spanning cells,
    // exactly on cell edges, inclusive endpoints, zero-length, and
    // no-match; bucketWidth 10
    val pts = Seq(0L, 5L, 9L, 10L, 15L, 20L, 25L, 37L, 99L)
      .map(p => (p, s"p$p")).toDF("pt", "pname")
    val ivs = Seq((1L, 0L, 9L), (2L, 5L, 15L), (3L, 10L, 10L),
      (4L, 8L, 32L), (5L, 40L, 50L)).toDF("iv_id", "lo", "hi")
    val out = Relational.rangeJoin(pts, ivs, "pt", "lo", "hi", 10L)
      .select("iv_id", "pt").as[(Long, Long)].collect().toSet
    val naive = pts.join(ivs, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("iv_id", "pt").as[(Long, Long)].collect().toSet
    out shouldBe naive
    // sanity on the fixture itself: inclusive bounds + zero-length
    out should contain((3L, 10L))
    out should contain((2L, 5L))
    out should contain((2L, 15L))
    naive.map(_._1) should not contain 5L
  }

  test("rangeJoin buckets exactly above 2^53 (integral division, not double)") {
    import spark.implicits._
    // w and p chosen so double arithmetic buckets p into cell 472447
    // while the true cell is 472448 = p div w — the long->double cast
    // loses p's low bits (p ≈ 1.7e18 > 2^53). With the old double
    // division this match was silently dropped.
    val w = 3599999999999L
    val p = 1700812799999527552L
    (p - (p % w)) / w shouldBe 472448L // scala long div = the truth
    (p.toDouble / w.toDouble).toLong shouldBe 472447L // the double trap
    val pts = Seq((p, "big")).toDF("pt", "pname")
    val ivs = Seq((1L, p - 10L, p + 10L)).toDF("iv_id", "lo", "hi")
    Relational.rangeJoin(pts, ivs, "pt", "lo", "hi", w)
      .select("iv_id", "pt").as[(Long, Long)].collect().toSet shouldBe
      Set((1L, p))
  }

  test("readCliLines numbers a CLI output file and feeds parseCliTable") {
    import spark.implicits._
    val f = java.nio.file.Files.createTempFile("graft_cli", ".txt")
    java.nio.file.Files.writeString(f,
      "+----+\n| ID | NAME |\n+----+\n 0 tenant-x ok\n 1 tenant-y ok\n+----+")
    val lines = CatalogOps.readCliLines(spark, f.toString)
    lines.count() shouldBe 6
    CatalogOps.parseCliTable(lines, "line", "line_no", 3, 1, 1)
      .as[String].collect().sorted shouldBe Array("tenant-x", "tenant-y")
  }

  test("readCliLines with a trailing newline drops the phantom empty line") {
    import spark.implicits._
    val f = java.nio.file.Files.createTempFile("graft_cli_nl", ".txt")
    // ends with \n (the normal case) AND has a real footer line: the
    // footer must be trimmed, not the phantom empty line after the \n
    java.nio.file.Files.writeString(f,
      "+----+\n| ID | NAME |\n+----+\n 0 tenant-x ok\n 1 tenant-y ok\nTotal: 2\n")
    val lines = CatalogOps.readCliLines(spark, f.toString)
    lines.count() shouldBe 6
    CatalogOps.parseCliTable(lines, "line", "line_no", 3, 1, 1)
      .as[String].collect().sorted shouldBe Array("tenant-x", "tenant-y")
  }

  test("readCliLines strips exactly ONE trailing newline (blank last line survives)") {
    // "row2\n\n" ends with a deliberate blank line + newline: Java's $
    // would match before the final terminator too and eat both — the
    // \z anchor must keep the blank line as a real (empty) line
    val f = java.nio.file.Files.createTempFile("graft_cli_nl2", ".txt")
    java.nio.file.Files.writeString(f, "row1\nrow2\n\n")
    val got = CatalogOps.readCliLines(spark, f.toString)
      .orderBy("line_no").collect().map(_.getString(0))
    got shouldBe Array("row1", "row2", "")
  }

  test("parseCliTable trims header/footer and extracts the field") {
    import spark.implicits._
    val lines = Seq(
      (1L, "+--------+"), (2L, "| ID | NAME |"), (3L, "+--------+"),
      (4L, " 0 tenant-a active"), (5L, " 1 tenant-b active"),
      (6L, "+--------+"))
      .toDF("line_no", "line")
    CatalogOps.parseCliTable(lines, "line", "line_no", 3, 1, 1)
      .as[String].collect().sorted shouldBe Array("tenant-a", "tenant-b")
  }

  test("groupAwareSplit: a group never straddles folds; rescued docs counted") {
    import spark.implicits._
    // 60 docs in 12 groups of 5 (group = id / 5): the fold must be a
    // function of the GROUP alone
    val docs = (0 until 60).map(i =>
      (i.toLong, s"s${i % 2}", s"grp${i / 5}")).toDF("doc_id", "source", "grp")
    val out = Relational.groupAwareSplit(docs, "doc_id", "source",
      col("grp")).collect()
    out.map(_.getLong(2)).sum shouldBe 60L
    // group-level integrity recomputed independently: every group's
    // docs land in ONE fold, so Σ n_groups over (source, split) rows
    // equals Σ per-source distinct groups (a straddling group would
    // be counted twice)
    val distinctPerSource = docs
      .groupBy(col("source")).agg(countDistinct(col("grp")).as("g"))
      .collect().map(_.getLong(1)).sum
    out.map(_.getLong(3)).sum shouldBe distinctPerSource
    // determinism: identical input → identical table
    val again = Relational.groupAwareSplit(docs, "doc_id", "source",
      col("grp")).collect()
    again.map(_.toString).sorted shouldBe out.map(_.toString).sorted
    // rescued ≤ docs, and with single-doc groups keyed by the doc id
    // itself the two grains agree — nothing to rescue
    out.foreach(r => r.getLong(4) should be <= r.getLong(2))
    val solo = (0 until 30).map(i => (i.toLong, "s",
      i.toString)).toDF("doc_id", "source", "grp")
    Relational.groupAwareSplit(solo, "doc_id", "source", col("grp"))
      .collect().map(_.getLong(4)).sum shouldBe 0L
  }

  test("stratifiedSample: rate 0/1 extremes, determinism, rate validation") {
    import spark.implicits._
    val df = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    def run(rates: Map[String, Double]): Set[Long] =
      Relational.stratifiedSample(df, col("src"), col("id"), rates)
        .select("id").as[Long].collect().toSet
    run(Map("a" -> 0.0)).forall(_ % 2 == 1) shouldBe true // a all dropped
    run(Map("a" -> 1.0)).size shouldBe 400 // rate 1 and absent strata keep all
    val half = run(Map("a" -> 0.5, "b" -> 0.5))
    // hash-deterministic: same selection on every run AND independent
    // of row order/partitioning
    half shouldBe run(Map("a" -> 0.5, "b" -> 0.5))
    val shuffled = Relational.stratifiedSample(
      df.orderBy(rand(7)).repartition(7), col("src"), col("id"),
      Map("a" -> 0.5, "b" -> 0.5)).select("id").as[Long].collect().toSet
    shuffled shouldBe half
    // the fraction lands near the target (md5 is uniform)
    half.size.toDouble should (be > 120.0 and be < 280.0)
    an[IllegalArgumentException] should be thrownBy
      Relational.stratifiedSample(df, col("src"), col("id"), Map("a" -> 1.5))
  }

  test("temperatureMixCuts: √-weights flatten the allocation and " +
    "saturate small sources") {
    import spark.implicits._
    // big = 100 docs × 8 tokens = 800; small = 10 × 8 = 80
    val docs = ((0L until 100L).map(i => (i, "big", "a b c d e f g h")) ++
      (100L until 110L).map(i => (i, "small", "a b c d e f g h")))
      .toDF("doc_id", "source", "text")
    val cuts = Relational
      .temperatureMixCuts(docs, "source", "text", budgetTokens = 160L)
      .toMap
    // integer replay of the documented formula: w = floor(√n),
    // cut = min(1000, ⌊1000·budget·w / (Σw·n)⌋)
    val (wB, wS) = (math.sqrt(800.0).toLong, math.sqrt(80.0).toLong)
    val denom = wB + wS
    cuts("big") shouldBe
      math.min(1000L, 1000L * 160L * wB / (denom * 800L))
    cuts("small") shouldBe
      math.min(1000L, 1000L * 160L * wS / (denom * 80L))
    // temperature: the small source gets a strictly HIGHER rate than
    // the big one (α = 1/2 up-weights small sources per token)
    cuts("small") should be > cuts("big")
    // a budget beyond the corpus saturates every cut at 1000
    Relational.temperatureMixCuts(docs, "source", "text", 1000000L)
      .toMap.values.toSet shouldBe Set(1000L)
    // the stratum-cardinality guard fires BEFORE the collect when a
    // caller passes a high-cardinality column (e.g. an id) by mistake
    val ex = the[IllegalArgumentException] thrownBy
      Relational.temperatureMixCuts(
        docs.withColumn("source", col("doc_id").cast("string")),
        "source", "text", 160L, maxStrata = 50)
    ex.getMessage should include("maxStrata")
  }

  test("temperatureMix applies the cuts deterministically under " +
    "repartitioning") {
    import spark.implicits._
    val docs = (0L until 400L)
      .map(i => (i, if (i % 2 == 0) "a" else "b", "x y z"))
      .toDF("doc_id", "source", "text")
    val cuts = Relational.temperatureMixCuts(docs, "source", "text", 300L)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Relational.temperatureMix(df, col("source"), col("doc_id"), cuts)
        .select("doc_id").as[Long].collect().toSet
    val base = ids(docs)
    base.nonEmpty shouldBe true
    base.size should be < 400 // the budget is a strict subsample here
    ids(docs.orderBy(rand(3)).repartition(7)) shouldBe base
    // zero cut drops the stratum entirely
    Relational.temperatureMix(docs, col("source"), col("doc_id"),
      Seq("a" -> 0L, "b" -> 0L)).count() shouldBe 0L
  }

  test("epochMixMilli + epochUpsample: fractional epochs repeat docs " +
    "deterministically; sub-1000 strata reproduce temperatureMix") {
    import spark.implicits._
    // big = 100 × 8 = 800 tokens, small = 10 × 8 = 80: a 640-token
    // budget allocates small ≈ 2.3 epochs (upsample), big < 1 epoch
    val docs = ((0L until 100L).map(i => (i, "big", "a b c d e f g h")) ++
      (100L until 110L).map(i => (i, "small", "a b c d e f g h")))
      .toDF("doc_id", "source", "text")
    val es = Relational
      .epochMixMilli(docs, "source", "text", budgetTokens = 640L)
      .toMap
    // unclamped integer replay of the q124 formula
    val (wB, wS) = (math.sqrt(800.0).toLong, math.sqrt(80.0).toLong)
    val denom = wB + wS
    es("big") shouldBe 1000L * 640L * wB / (denom * 800L)
    es("small") shouldBe 1000L * 640L * wS / (denom * 80L)
    es("small") should be > 1000L // genuinely upsampled
    es("big") should be < 1000L
    val up = Relational.epochUpsample(docs, col("source"),
      col("doc_id"), es.toSeq)
    // every small doc appears at least base = e div 1000 times, at
    // most base + 1; epoch indices are exactly 0..n_copies-1
    val smallCopies = up.filter(col("source") === "small")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nc"), max(col("epoch")).as("me"),
        min(col("epoch")).as("m0"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val base = es("small") / 1000L
    all(smallCopies.map(_._1)) should (be >= base and be <= base + 1)
    smallCopies.foreach { case (nc, me, m0) =>
      me shouldBe nc - 1; m0 shouldBe 0L
    }
    // a sub-1000 stratum reproduces temperatureMix's kept set with
    // the SAME salt (base 0 + fractional selection ≡ selection)
    val viaMix = Relational.temperatureMix(docs, col("source"),
        col("doc_id"), Seq("big" -> es("big"), "small" -> 0L),
        saltPrefix = "epoch-")
      .select("doc_id").as[Long].collect().toSet
    up.filter(col("source") === "big")
      .select("doc_id").as[Long].collect().toSet shouldBe viaMix
    // determinism under repartitioning
    Relational.epochUpsample(docs.orderBy(rand(5)).repartition(7),
        col("source"), col("doc_id"), es.toSeq)
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSet shouldBe
      up.select("doc_id", "epoch").as[(Long, Long)].collect().toSet
    // the epoch guard fails loudly on an explosive allocation
    val ex = the[IllegalArgumentException] thrownBy
      Relational.epochMixMilli(docs, "source", "text",
        budgetTokens = 100000000L, maxEpochs = 100)
    ex.getMessage should include("maxEpochs")
  }
}
