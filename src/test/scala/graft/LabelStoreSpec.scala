package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{Dedup, LabelStore}

/** Pins for the persisted union-find label store: on EVERY batch
  * prefix the store's current labels must equal a from-scratch
  * [[Dedup.componentGroups]] over everything seen so far — the store
  * is a physical move of the labeling, never a semantic one. */
class LabelStoreSpec extends AnyFunSuite with SparkSpec
    with Matchers {

  // three batches exercising: within-batch key edges, cross-batch
  // key inheritance through the anchor, a pair-edge merge that
  // REWRITES an existing component to a smaller label (batch 1's
  // doc 3 becomes the min of batch 0's {10,11,12} component), an
  // untouched component (doc 5), and an isolated late arrival
  private val batches: Seq[(Seq[(Long, String)], Seq[(Long, Long)])] =
    Seq(
      (Seq((10L, "k1"), (11L, "k1"), (12L, "k2"), (5L, "k3")),
        Seq((10L, 12L))),
      (Seq((3L, "k4"), (7L, "k2")), Seq((3L, 11L))),
      (Seq((100L, "k9")), Seq.empty))

  private def dfDocs(b: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    b.toDF("doc_id", "ckey")
  }

  private def dfPairs(p: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    p.toDF("doc_a", "doc_b")
  }

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id").cast("long"), col("group").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def oracle(upTo: Int): Set[(Long, Long)] = {
    val docs = dfDocs(batches.take(upTo + 1).flatMap(_._1))
    val pairs = dfPairs(batches.take(upTo + 1).flatMap(_._2))
    labelSet(Dedup.componentGroups(docs, "doc_id", col("ckey"),
      pairs))
  }

  private def runPrefixes(root: String, ufCap: Int): Unit = {
    batches.zipWithIndex.foreach { case ((docs, pairs), i) =>
      LabelStore.update(spark, root, dfDocs(docs), "doc_id", "ckey",
        dfPairs(pairs), s"b$i", ufCap = ufCap)
      withClue(s"after batch $i (ufCap=$ufCap): ") {
        labelSet(LabelStore.read(spark, root)) shouldBe oracle(i)
      }
    }
  }

  test("stored labels equal componentGroups' on every batch prefix " +
    "(driver union-find regime)") {
    val root = Files.createTempDirectory("graft_ls_").toString
    try runPrefixes(root, LabelStore.DefaultUfEdgeCap)
    finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("over-cap distributed regime labels identically (ufCap=0 " +
    "forces the semi-join + label-grain CC path)") {
    val root = Files.createTempDirectory("graft_lsd_").toString
    try runPrefixes(root, 0)
    finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("driver path with isin pushes disabled (pruneCap=0: every " +
    "store scan takes its semi-join twin) labels identically") {
    val root = Files.createTempDirectory("graft_lsj_").toString
    try batches.zipWithIndex.foreach { case ((docs, pairs), i) =>
      LabelStore.update(spark, root, dfDocs(docs), "doc_id", "ckey",
        dfPairs(pairs), s"b$i", pruneCap = 0)
      withClue(s"after batch $i (pruneCap=0): ") {
        labelSet(LabelStore.read(spark, root)) shouldBe oracle(i)
      }
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("a dup-dominated batch (clique edges past ufCap) collapses " +
    "to a spanning star and still labels exactly") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lss_").toString
    try {
      // one 40-clique (780 pairs) + an isolated doc, ufCap 100:
      // the star collapse fires, the result still fits the driver
      val ids = (10L to 49L)
      val docs = (ids :+ 900L).map(i => (i, s"u$i"))
      val clique = ids.flatMap(a => ids.filter(_ > a).map(b => (a, b)))
      LabelStore.update(spark, root, docs.toDF("doc_id", "ckey"),
        "doc_id", "ckey", clique.toDF("doc_a", "doc_b"), "b0",
        ufCap = 100)
      val expect = ids.map(i => (i, 10L)).toSet + ((900L, 900L))
      labelSet(LabelStore.read(spark, root)) shouldBe expect
      // batch 1 bridges the clique and the isolate through the store
      LabelStore.update(spark, root,
        Seq((5L, "u5")).toDF("doc_id", "ckey"), "doc_id", "ckey",
        Seq((5L, 900L), (5L, 11L)).toDF("doc_a", "doc_b"), "b1",
        ufCap = 100)
      labelSet(LabelStore.read(spark, root)) shouldBe
        (ids.map(i => (i, 5L)).toSet + ((900L, 5L)) + ((5L, 5L)))
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("sealed-segment retry: a committed tag returns the segment " +
    "verbatim and leaves the store unchanged") {
    val root = Files.createTempDirectory("graft_lsr_").toString
    try {
      val first = labelSet(LabelStore.update(spark, root,
        dfDocs(batches(0)._1), "doc_id", "ckey",
        dfPairs(batches(0)._2), "b0"))
      val again = labelSet(LabelStore.update(spark, root,
        dfDocs(batches(0)._1), "doc_id", "ckey",
        dfPairs(batches(0)._2), "b0"))
      again shouldBe first
      labelSet(LabelStore.read(spark, root)) shouldBe oracle(0)
      // rewrites ride the segment too: batch 1 relabels batch 0's
      // component to min 3, and the sealed segment carries BOTH the
      // batch rows and the rewritten rows
      val seg1 = labelSet(LabelStore.update(spark, root,
        dfDocs(batches(1)._1), "doc_id", "ckey",
        dfPairs(batches(1)._2), "b1"))
      seg1 shouldBe Set((3L, 3L), (7L, 3L), // batch rows
        (10L, 3L), (11L, 3L), (12L, 3L))    // rewritten rows
      labelSet(LabelStore.update(spark, root, dfDocs(batches(1)._1),
        "doc_id", "ckey", dfPairs(batches(1)._2),
        "b1")) shouldBe seg1
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("lookup point-fetches current labels; membersOf returns full " +
    "component membership from one group-filtered read") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lsm_").toString
    try {
      batches.zipWithIndex.foreach { case ((docs, pairs), i) =>
        LabelStore.update(spark, root, dfDocs(docs), "doc_id",
          "ckey", dfPairs(pairs), s"b$i")
      }
      labelSet(LabelStore.lookup(spark, root,
        Seq(11L, 5L).toDF("doc_id"))) shouldBe
        Set((11L, 3L), (5L, 5L))
      // an unseen doc is absent, not defaulted
      LabelStore.lookup(spark, root, Seq(999L).toDF("doc_id"))
        .count() shouldBe 0L
      labelSet(LabelStore.membersOf(spark, root,
        Seq(3L).toDF("group"))) shouldBe
        Set((3L, 3L), (7L, 3L), (10L, 3L), (11L, 3L), (12L, 3L))
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("property: random batch sequences keep store ≡ " +
    "componentGroups on every prefix (seeded, both regimes)") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      // 3 batches over ~24 docs: random keys from a small pool
      // (real same-key merges), random pair edges between ALREADY
      // SEEN docs and batch docs (the appendPairStore contract:
      // every new edge touches a batch doc)
      val ids = rnd.shuffle((1L to 60L).toVector).take(24)
      val bs = ids.grouped(8).toSeq.map(_.toSeq)
      var seen = Vector.empty[Long]
      val batchSpecs = bs.map { batchIds =>
        val docs = batchIds.map(id =>
          (id, s"k${rnd.nextInt(10)}"))
        val candidates = seen ++ batchIds
        val pairs = batchIds.flatMap { id =>
          if (rnd.nextBoolean()) {
            val other = candidates(rnd.nextInt(candidates.size))
            if (other != id) Seq((math.min(id, other),
              math.max(id, other))) else Seq.empty
          } else Seq.empty
        }.distinct
        seen = seen ++ batchIds
        (docs, pairs)
      }
      def oracleAt(upTo: Int): Set[(Long, Long)] = labelSet(
        graft.operators.Dedup.componentGroups(
          dfDocs(batchSpecs.take(upTo + 1).flatMap(_._1)),
          "doc_id", col("ckey"),
          dfPairs(batchSpecs.take(upTo + 1).flatMap(_._2))))
      Seq(LabelStore.DefaultUfEdgeCap, 0).foreach { cap =>
        val root = Files
          .createTempDirectory(s"graft_lsp_${seed}_$cap").toString
        try batchSpecs.zipWithIndex.foreach { case ((d, p), i) =>
          LabelStore.update(spark, root, dfDocs(d), "doc_id",
            "ckey", dfPairs(p), s"b$i", ufCap = cap)
          withClue(s"seed=$seed cap=$cap prefix=$i: ") {
            labelSet(LabelStore.read(spark, root)) shouldBe
              oracleAt(i)
          }
        } finally Scratch.deleteRecursively(new java.io.File(root))
      }
    }
  }

  test("compact-labels rewrites to one current row per doc; reads " +
    "and a post-compaction sealed retry are unchanged") {
    val root = Files.createTempDirectory("graft_lsc_").toString
    try {
      batches.zipWithIndex.foreach { case ((docs, pairs), i) =>
        LabelStore.update(spark, root, dfDocs(docs), "doc_id",
          "ckey", dfPairs(pairs), s"b$i")
      }
      // batch 1 rewrote batch 0's component: history > current docs
      val rowsBefore = spark.read
        .schema(LabelStore.LabelsSchema).parquet(s"$root/labels")
        .count()
      rowsBefore should be > labelSet(
        LabelStore.read(spark, root)).size.toLong
      val lines = Main.run(spark, Seq("compact-labels", root, "0.0"))
      lines.foreach(l => info(l))
      lines.last should include("compacted to")
      spark.read.schema(LabelStore.LabelsSchema)
        .parquet(s"$root/labels").count() shouldBe
        oracle(batches.size - 1).size.toLong
      labelSet(LabelStore.read(spark, root)) shouldBe
        oracle(batches.size - 1)
      // a batch re-delivered AFTER compaction still skips the merge:
      // its marker survives, its segment files are gone, and the
      // fast path recomputes the BATCH DOCS' current labels from the
      // store itself (never an empty frame — a replay whose crash
      // landed the label append but not the fold-sink write must
      // still hand the sink real rows), store untouched
      labelSet(LabelStore.update(spark, root, dfDocs(batches(0)._1),
        "doc_id", "ckey", dfPairs(batches(0)._2),
        "b0")) shouldBe Set((10L, 3L), (11L, 3L), (12L, 3L), (5L, 5L))
      labelSet(LabelStore.read(spark, root)) shouldBe
        oracle(batches.size - 1)
      // and a genuinely NEW batch keeps merging correctly
      Main.run(spark, Seq("compact-labels", root, "2.0"))
        .last should include("no compaction needed")
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("compact-labels with a docs dir retires anchors whose key " +
    "left the docs table; merge verdicts unchanged") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lsk_").toString
    val docsRoot = Files.createTempDirectory("graft_lskd_").toString
    try {
      LabelStore.update(spark, root, dfDocs(batches(0)._1), "doc_id",
        "ckey", dfPairs(batches(0)._2), "b0")
      // the docs table has moved on: doc 5's key renamed k3 → k9,
      // so anchor k3 is retired (k9 never anchored — it anchors
      // fresh on its next appearance)
      Seq((10L, "k1", "s"), (11L, "k1", "s"), (12L, "k2", "s"),
        (5L, "k9", "s")).toDF("doc_id", "ckey", "source")
        .write.parquet(s"$docsRoot/docs")
      val health = Main.run(spark, Seq("labels", root, docsRoot))
      health.foreach(l => info(l))
      health.find(_.contains("anchors")).get should
        include("2 live")
      val lines = Main.run(spark,
        Seq("compact-labels", root, "0.0", docsRoot))
      lines.foreach(l => info(l))
      lines.last should include("anchors compacted to 2 live keys")
      spark.read.schema(LabelStore.AnchorsSchema)
        .parquet(s"$root/anchors")
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .toSet shouldBe Set(("k1", 10L), ("k2", 12L))
      // merge verdicts unchanged: a live key still anchors (doc 50
      // joins k1's component through the kept anchor), a retired
      // key re-anchors fresh (doc 60 starts its own k3 group)
      LabelStore.update(spark, root,
        Seq((50L, "k1"), (60L, "k3")).toDF("doc_id", "ckey"),
        "doc_id", "ckey", dfPairs(Seq.empty), "b1")
      labelSet(LabelStore.lookup(spark, root,
        Seq(50L, 60L).toDF("doc_id"))) shouldBe
        Set((50L, 10L), (60L, 60L))
    } finally {
      Scratch.deleteRecursively(new java.io.File(root))
      Scratch.deleteRecursively(new java.io.File(docsRoot))
    }
  }

  test("an edge endpoint absent from both the store and the batch " +
    "gets a segment row when it merges into a smaller label " +
    "(both regimes)") {
    import spark.implicits._
    // doc 5 (batch) — doc 9 (absent everywhere): component min 5;
    // without 9's row a later lookup would coalesce it to 9
    Seq(LabelStore.DefaultUfEdgeCap, 0).foreach { cap =>
      val root = Files
        .createTempDirectory(s"graft_lsa_$cap").toString
      try {
        LabelStore.update(spark, root,
          Seq((5L, "ka")).toDF("doc_id", "ckey"), "doc_id", "ckey",
          Seq((5L, 9L)).toDF("doc_a", "doc_b"), "b0", ufCap = cap)
        withClue(s"ufCap=$cap: ") {
          labelSet(LabelStore.lookup(spark, root,
            Seq(9L).toDF("doc_id"))) shouldBe Set((9L, 5L))
          labelSet(LabelStore.read(spark, root)) shouldBe
            Set((5L, 5L), (9L, 5L))
          // an absent endpoint that stays its own component min
          // writes no row (own-id coalesce is already correct)
          LabelStore.update(spark, root,
            Seq((20L, "kb")).toDF("doc_id", "ckey"), "doc_id",
            "ckey", Seq((20L, 15L)).toDF("doc_a", "doc_b"), "b1",
            ufCap = cap)
          labelSet(LabelStore.lookup(spark, root,
            Seq(20L).toDF("doc_id"))) shouldBe Set((20L, 15L))
          LabelStore.lookup(spark, root, Seq(15L).toDF("doc_id"))
            .count() shouldBe 0L
        }
      } finally Scratch.deleteRecursively(new java.io.File(root))
    }
  }

  test("segmented bootstrap (tiny segmentRows) ≡ monolithic; " +
    "resumes at segment grain after a partial seal") {
    import spark.implicits._
    val rootA = Files.createTempDirectory("graft_lsg_a").toString
    val rootB = Files.createTempDirectory("graft_lsg_b").toString
    try {
      // A: 4 docs at 2 rows per segment → 2 sealed range segments;
      // B: the monolithic layout — stores must read identically
      LabelStore.bootstrap(spark, rootA, dfDocs(batches(0)._1),
        "doc_id", col("ckey"), dfPairs(batches(0)._2),
        segmentRows = 2L)
      LabelStore.bootstrap(spark, rootB, dfDocs(batches(0)._1),
        "doc_id", col("ckey"), dfPairs(batches(0)._2))
      labelSet(LabelStore.read(spark, rootA)) shouldBe oracle(0)
      labelSet(LabelStore.read(spark, rootA)) shouldBe
        labelSet(LabelStore.read(spark, rootB))
      def anchorSet(r: String): Set[(String, Long)] = spark.read
        .schema(LabelStore.AnchorsSchema).parquet(s"$r/anchors")
        .collect().map(x => (x.getString(0), x.getLong(1))).toSet
      anchorSet(rootA) shouldBe anchorSet(rootB)
      new java.io.File(s"$rootA/labels").listFiles()
        .count(_.getName.startsWith("seg-bootstrap-p")) shouldBe 2
      // resume: lose one segment AND the final marker (a crash
      // mid-seal) — the re-run re-seals only what is missing and
      // the union still equals the monolithic bootstrap
      new java.io.File(s"$rootA/_commits/bootstrap")
        .delete() shouldBe true
      new java.io.File(s"$rootA/_commits/bootstrap-p1")
        .delete() shouldBe true
      new java.io.File(s"$rootA/labels").listFiles()
        .filter(_.getName.startsWith("seg-bootstrap-p1"))
        .foreach(f => f.delete() shouldBe true)
      new java.io.File(s"$rootA/anchors").listFiles()
        .filter(_.getName.startsWith("seg-bootstrap-p1"))
        .foreach(f => f.delete() shouldBe true)
      LabelStore.bootstrap(spark, rootA, dfDocs(batches(0)._1),
        "doc_id", col("ckey"), dfPairs(batches(0)._2),
        segmentRows = 2L)
      labelSet(LabelStore.read(spark, rootA)) shouldBe oracle(0)
      anchorSet(rootA) shouldBe anchorSet(rootB)
      // a fully committed bootstrap is still skipped verbatim
      LabelStore.bootstrap(spark, rootA, dfDocs(Seq((777L, "zz"))),
        "doc_id", col("ckey"), dfPairs(Seq.empty), segmentRows = 2L)
      labelSet(LabelStore.read(spark, rootA)) shouldBe oracle(0)
    } finally {
      Scratch.deleteRecursively(new java.io.File(rootA))
      Scratch.deleteRecursively(new java.io.File(rootB))
    }
  }

  test("bootstrap seeds a pre-existing corpus once and update " +
    "continues from it (committed bootstrap skipped verbatim)") {
    val root = Files.createTempDirectory("graft_lsb_").toString
    try {
      LabelStore.bootstrap(spark, root, dfDocs(batches(0)._1),
        "doc_id", col("ckey"), dfPairs(batches(0)._2))
      labelSet(LabelStore.read(spark, root)) shouldBe oracle(0)
      // a second bootstrap (retry) is a no-op under the marker
      LabelStore.bootstrap(spark, root, dfDocs(Seq((777L, "zz"))),
        "doc_id", col("ckey"), dfPairs(Seq.empty))
      labelSet(LabelStore.read(spark, root)) shouldBe oracle(0)
      LabelStore.update(spark, root, dfDocs(batches(1)._1),
        "doc_id", "ckey", dfPairs(batches(1)._2), "b1")
      labelSet(LabelStore.read(spark, root)) shouldBe oracle(1)
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }
}
