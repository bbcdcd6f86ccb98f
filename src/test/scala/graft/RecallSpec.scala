package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.vectors
import graft.operators.Similarity

/** CI recall gates for the approximate ANN operators — the measured
  * counterpart of the sizing contracts (`lshTablesForRecall`,
  * `probeRadiusForRecall`). ProbeRecall (dev tool) sweeps these at
  * 1×/10× and tables them in PLANS.md; this spec pins the claims at
  * sf0.001 so a regression in the hashing kernels, the sizing
  * arithmetic, or the plane generation fails the suite instead of
  * silently shipping recall drift.
  *
  * The fixture vectors are near-orthogonal (recall against them
  * measures the BEST-EFFORT tier), so the CONTRACT tier is measured
  * on PLANTED near-duplicates: ±2% deterministic per-component noise
  * replicas (cos ≈ 0.9998 — far above the 0.9 floor the operators
  * promise for). Everything is seeded/hashed, so every measured rate
  * below is one fixed number for the fixture, asserted with margin —
  * stable, not flaky.
  */
class RecallSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val dim = 64
  private val sfDir = "/root/testdata/sf0.001"

  private def base: DataFrame = Tables(spark, sfDir, "embeddings")

  /** ONE planting definition, shared with ProbeRecall's sweep
    * (ProbeFixtures) — the gate and the measurement cannot drift. */
  private def plantNearDups(emb: DataFrame, replicas: Int): DataFrame =
    ProbeFixtures.plantNearDups(spark, emb, replicas)

  test("multi-table ANN finds planted >=floor neighbors at the pinned miss rate (q95 contract)") {
    val emb = plantNearDups(base, 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val approx = Similarity.lshTopKMultiAuto(
      emb, seed = 95L, dim = dim, k = 5, simFloor = 0.9)
    val planted = emb.select(col("vec_id").as("p_id"))
      .filter(pmod(col("p_id"), lit(2)) === 0)
      .withColumn("nb_id", col("p_id") + 1)
    val total = planted.count()
    val hit = planted.join(
      approx.select(col("vec_id").as("p_id"), col("nb_id")),
      Seq("p_id", "nb_id"), "left_semi").count()
    emb.unpersist(blocking = false)
    total shouldBe n / 2
    // contract: miss <= 1% per planted neighbor (lshTablesForRecall);
    // asserted with finite-sample margin. r6 measured 100% here.
    hit.toDouble / total should be >= 0.95
  }

  test("the at-rest quantized composition (q101/q104) finds planted neighbors end-to-end") {
    // the FULL stored pipeline, not just the bucket-distance proxy:
    // quantize -> clusteredWrite -> probe-ball prune -> dequantized
    // shortlist -> exact re-rank. Quantization drift (scale math,
    // codes, dequantized ranking) that silently eroded the capstone's
    // recall would pass the radius test above but fail here.
    val emb = plantNearDups(base, 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val nPlanes = Similarity.planesForSize(n)
    val planes = vectors.planeMatrix(97L, nPlanes, dim)
    val radius = Similarity.probeRadiusForRecall(
      nPlanes, simFloor = 0.9, targetMiss = 0.15)
    val store = java.nio.file.Files
      .createTempDirectory("graft_recall_store").toString + "/s"
    graft.sources.Layout.clusteredWrite(
      emb.withColumn("scale", vectors.quantizeScale(col("embedding")))
        .select(col("vec_id"),
          vectors.hyperplaneBucketFast(col("embedding"), planes)
            .as("bucket"),
          vectors.quantizeInt8(col("embedding"), col("scale")).as("codes"),
          col("scale")),
      store, numFiles = 8, col("bucket"))
    val at = spark.read.parquet(store)
    // a deterministic sample of planted originals; each must surface
    // its replica (vec_id + 1, cos ~ 0.9998) in the served top-5
    val qids: Seq[Long] = (0L until 24L by 2L)
    val qrows = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("embedding"),
        vectors.hyperplaneBucketFast(col("embedding"), planes).as("bucket"))
      .collect()
    qrows.length shouldBe qids.length
    val hits = qrows.count { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1)
      val probes = Similarity.probeBuckets(r.getLong(2), nPlanes, radius)
      val short = at
        .filter(col("bucket").isin(probes: _*) && col("vec_id") =!= qid)
        .orderBy(
          vectors.cosineFast(
            vectors.dequantizeInt8(col("codes"), col("scale")),
            typedLit(qv)).desc,
          col("vec_id"))
        .limit(20)
        .select("vec_id")
      val top = emb.join(short, Seq("vec_id"), "left_semi")
        .orderBy(vectors.cosineFast(col("embedding"), typedLit(qv)).desc,
          col("vec_id"))
        .limit(5)
        .select("vec_id").collect().map(_.getLong(0))
      top.contains(qid + 1)
    }
    emb.unpersist(blocking = false)
    Scratch.deleteRecursively(
      new java.io.File(store).getParentFile)
    // contract tier: miss <= 15% per planted neighbor (the derived
    // radius); PLANS.md measures 0.97-1.00 for the composition at this
    // scale — assert with finite-sample margin (deterministic fixture)
    hits.toDouble / qids.length should be >= 0.84
  }

  test("multi-probe radius: derived radius meets its planted contract; recall is monotone in radius") {
    val emb = plantNearDups(base, 2)
    val n = emb.count()
    val nPlanes = Similarity.planesForSize(n)
    val planes = vectors.planeMatrix(97L, nPlanes, dim)
    // planted pair (2b, 2b+1) is FOUND by a radius-r probe scan iff
    // their stored buckets differ in <= r bits — bucket distance is
    // the whole candidate decision, so measure it directly
    val b = emb.select(col("vec_id"),
      vectors.hyperplaneBucketFast(col("embedding"), planes).as("bucket"))
    val pairs = b.filter(pmod(col("vec_id"), lit(2)) === 0)
      .select(col("vec_id"), col("bucket").as("b_a"))
      .join(b.select((col("vec_id") - 1).as("vec_id"),
        col("bucket").as("b_b")), "vec_id")
      .select(expr("bit_count(b_a ^ b_b)").as("dist"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = pairs.count()
    def recallAt(radius: Int): Double =
      pairs.filter(col("dist") <= radius).count().toDouble / total
    val r0 = recallAt(0); val r1 = recallAt(1); val r2 = recallAt(2)
    pairs.unpersist(blocking = false)
    total shouldBe n / 2
    // the files-buy-recall ladder must not invert
    r0 should be <= r1
    r1 should be <= r2
    // the q98/q101 derivation: floor 0.9 / miss 0.15; a planted pair
    // (cos ~ 0.9998, far inside the floor) must land within the
    // derived radius at well above the contract rate
    val derived = Similarity.probeRadiusForRecall(
      nPlanes, simFloor = 0.9, targetMiss = 0.15)
    recallAt(derived) should be >= 0.85
  }
}
