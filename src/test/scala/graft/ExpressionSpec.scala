package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.vectors
import graft.plans.GraftExtensions

/** Native codegen'd expressions: bit-parity with the HOF formulation
  * (the oracle contract) and SQL registration. */
class ExpressionSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def randomVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(r.nextFloat() * 2 - 1)))
  }

  test("CosineSim is bit-identical to the HOF cosine on float arrays") {
    import spark.implicits._
    val df = randomVecs(200, 64, 7L).toDF("id", "v")
    val q = randomVecs(1, 64, 8L).map(_._2).head
    val out = df.select(
      vectors.cosineFast(col("v"), typedLit(q.toSeq)).as("fast"),
      vectors.cosineSimilarity(
        vectors.toDouble(col("v")),
        vectors.toDouble(typedLit(q.toSeq))).as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (fast, hof) =>
      java.lang.Double.doubleToLongBits(fast) shouldBe
        java.lang.Double.doubleToLongBits(hof) // exact, not approx
    }
  }

  test("cosine_sim is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c," +
        " cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS o")
      .collect().head
    row.getDouble(0) shouldBe 1.0
    row.getDouble(1) shouldBe 0.0
  }

  test("HyperplaneBuckets matches the HOF bucketer bit-for-bit") {
    import spark.implicits._
    val tables = (0 until 4).map(t => vectors.planeMatrix(100L + t, 6, 16))
    val df = randomVecs(100, 16, 11L).toDF("id", "v")
    val out = df.select(
      vectors.multiTableBuckets(col("v"), tables).as("hof"),
      vectors.multiTableBucketsFast(col("v"), tables).as("fast"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (hof, fast) => fast shouldBe hof }
  }

  test("NearestCentroids matches a Scala argmin with the same tie-breaks") {
    import spark.implicits._
    val cents = vectors.planeMatrix(3L, 8, 16)
    val vecs = randomVecs(100, 16, 13L)
    val got = vecs.toDF("id", "v")
      .select(col("id"), vectors.nearestCentroidsFast(col("v"), cents, 3).as("p"))
      .as[(Long, Seq[Int])].collect().toMap
    vecs.foreach { case (id, v) =>
      val d = cents.map(c =>
        v.zip(c).foldLeft(0.0) { case (acc, (x, y)) =>
          val t = x.toDouble - y; acc + t * t
        })
      val expected = d.zipWithIndex.sortBy { case (dist, i) => (dist, i) }
        .take(3).map(_._2)
      got(id).toList shouldBe expected.toList
    }
  }

  test("lshNearDupPairs is a subset of the exact all-pairs baseline") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tables = (0 until 8).map(t => vectors.planeMatrix(1000L + t, 6, 64))
    val threshold = 0.3 // low enough that pairs exist at sf0.001
    val exact = graft.operators.Similarity
      .nearDupPairsExact(emb, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.operators.Similarity
      .lshNearDupPairs(emb, threshold, tables)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lsh.subsetOf(exact) shouldBe true // never a false positive
    exact should not be empty
    // S-curve at cos=0.3 (θ≈72.5°, 6 planes, 8 tables) predicts
    // recall ≈ 1-(1-0.597^6)^8 ≈ 0.31 — low-cosine pairs are exactly
    // what LSH is NOT supposed to retrieve well; assert the ballpark
    lsh.size.toDouble / exact.size.toDouble should be > 0.15
  }

  test("ivfTopK: probe filter prunes cells; results are exact cosines") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = vectors.planeMatrix(7L, 16, 64)
    val out = graft.operators.Similarity
      .ivfTopK(emb, cents, queryVecId = 0, nProbe = 4, k = 5).collect()
    out.length shouldBe 5
    // every hit's cell is one of the query's probe cells
    val probes = emb.filter(col("vec_id") === 0)
      .select(vectors.nearestCentroidsFast(col("embedding"), cents, 4))
      .collect().head.getSeq[Int](0).toSet
    out.foreach(r => probes should contain(r.getAs[Int]("cell")))
  }

  test("SimHashMd5 kernel is bit-identical to the HOF simhash") {
    import spark.implicits._
    import graft.functions.{hashes, text}
    import graft.operators.Dedup
    val texts = Seq("the quick brown fox", "", "a", "x y z x y z",
      "Ünïcode towér ✓ tokens")
    val out = texts.toDF("text").select(
      Dedup.simhash(col("text"), 60, hashes.md5Hash60).as("hof"),
      Dedup.simhashFast(text.tokens(col("text"))).as("fast"))
      .as[(Long, Long)].collect()
    out.foreach { case (hof, fast) => fast shouldBe hof }
  }

  test("Tokenize and WordShingles kernels are element-identical to the HOF pipeline") {
    import spark.implicits._
    import graft.functions.text
    val edge = Seq("", "one", "a  b\t c \n d", "  leading and trailing  ",
      "Ünïcode TOKENS here", "x x x x x", "tabvt\ffeed\rcr")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).limit(200)
      .union(edge.toDF("text"))
    val out = docs.select(
      text.tokensHof(col("text")).as("tok_hof"),
      text.tokens(col("text")).as("tok_fast"),
      text.wordShingles(text.tokensHof(col("text")), 2).as("sh_hof"),
      text.wordShinglesFast(col("text"), 2).as("sh_fast"))
      .as[(Seq[String], Seq[String], Seq[String], Seq[String])].collect()
    out.foreach { case (th, tf, sh, sf) =>
      tf shouldBe th
      sf shouldBe sh
    }
  }

  test("CosineSim participates in whole-stage codegen") {
    // needs a non-local source — over a local relation the optimizer
    // constant-folds the whole projection away
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb
      .select(vectors.cosineFast(col("embedding"), col("embedding")).as("c"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen'd operators in toString
    plan should include("*(1) Project")
    plan should include("cosine_sim")
  }

  test("SortedLongIntersectCount matches size(array_intersect) on distinct sorted arrays") {
    import org.apache.spark.sql.graft.{Bridge, SortedLongIntersectCount}
    import spark.implicits._
    val r = new scala.util.Random(13L)
    // distinct sorted arrays (the shingle-set shape the operator feeds)
    val rows = (0 until 300).map { _ =>
      (r.shuffle((0L until 200L).toList).take(r.nextInt(50) + 1).sorted,
        r.shuffle((0L until 200L).toList).take(r.nextInt(50) + 1).sorted)
    }
    val df = rows.toDF("a", "b")
    def merge(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      Bridge.column(SortedLongIntersectCount(
        Bridge.expression(x), Bridge.expression(y)))
    val out = df.select(
      merge(col("a"), col("b")).as("kernel"),
      org.apache.spark.sql.functions.size(
        array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .as[(Long, Long)].collect()
    out.foreach { case (k, b) => k shouldBe b }
  }

  test("CmsEstimate never undercounts and matches the driver-side sketch probe") {
    import org.apache.spark.sql.graft.{Bridge, CmsEstimate}
    import spark.implicits._
    val r = new scala.util.Random(17L)
    // Zipf-ish stream: token i appears ~200/(i+1) times
    val stream = (0 until 50).flatMap(i =>
      Seq.fill(200 / (i + 1))(s"tok$i"))
    val shuffled = r.shuffle(stream)
    val df = shuffled.toDF("token")
    // the sketch the operator builds: Spark's builtin aggregate
    val bytes = df.agg(count_min_sketch(col("token"), lit(1e-3),
        lit(0.99), lit(42)).as("s"))
      .head.getAs[Array[Byte]]("s")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
    val truth = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = df.distinct().select(col("token"),
        Bridge.column(CmsEstimate(Bridge.expression(col("token")), cms))
          .as("est"))
      .as[(String, Long)].collect().toMap
    est.keySet shouldBe truth.keySet
    truth.foreach { case (tok, n) =>
      // the CMS contract: estimates are upper bounds of the true count
      est(tok) should be >= n
      // and agree with probing the same sketch object driver-side
      // (same UTF-8-bytes key the aggregate added)
      est(tok) shouldBe cms.estimateCount(
        tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  test("CmsEstimate participates in whole-stage codegen") {
    import org.apache.spark.sql.graft.{Bridge, CmsEstimate}
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(
      0.001, 0.99, 42)
    cms.addBinary("the".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(Bridge.column(
        CmsEstimate(Bridge.expression(col("lang")), cms)).as("e"))
      .queryExecution.executedPlan.toString
    plan should include("*(1) Project")
    plan should include("cms_estimate")
  }
}
