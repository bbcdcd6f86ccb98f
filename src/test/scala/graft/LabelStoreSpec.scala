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
      // a batch re-delivered AFTER compaction still skips verbatim:
      // its marker survives, its segment files are gone, the fast
      // path returns an empty frame and the store stays untouched
      labelSet(LabelStore.update(spark, root, dfDocs(batches(0)._1),
        "doc_id", "ckey", dfPairs(batches(0)._2),
        "b0")) shouldBe Set.empty
      labelSet(LabelStore.read(spark, root)) shouldBe
        oracle(batches.size - 1)
      // and a genuinely NEW batch keeps merging correctly
      Main.run(spark, Seq("compact-labels", root, "2.0"))
        .last should include("no compaction needed")
    } finally Scratch.deleteRecursively(new java.io.File(root))
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
