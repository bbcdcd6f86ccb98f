package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.Layout

class LayoutSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("clusteredWrite yields non-overlapping per-file key spans and prunes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_layout").toString + "/t"
    // write keys shuffled so the clustering has real work to do
    val df = (1 to 10000).map(i => ((i * 7919) % 10007, s"v$i"))
      .toDF("k", "v")
    Layout.clusteredWrite(df, dir, numFiles = 8, col("k"))

    val spans = Layout.fileSpans(spark, dir, "k")
      .as[(String, Int, Int, Long)].collect().sortBy(_._2)
    spans.length shouldBe 8
    spans.map(_._4).sum shouldBe 10000L
    // non-overlapping: every file's hi < the next file's lo
    spans.sliding(2).foreach {
      case Array((_, _, hi, _), (_, lo, _, _)) => hi should be < lo
      case _ => ()
    }
    // range balance: sampled boundaries keep files within ~3x of even
    val ns = spans.map(_._4)
    ns.max.toDouble / ns.min.toDouble should be < 3.0

    // the read side actually prunes: a narrow range filter must touch
    // only the files whose span intersects it
    val probe = spark.read.parquet(dir).filter(col("k").between(100, 200))
    val touched = probe.select(input_file_name()).distinct().count()
    val expected = spans.count { case (_, lo, hi, _) => lo <= 200 && hi >= 100 }
    touched shouldBe expected.toLong
    expected should be < 8
  }

  test("LSH-bucket clustering prunes the similarity scan to colliding files") {
    import graft.functions.vectors
    val dir = Files.createTempDirectory("graft_layout_ann").toString + "/e"
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = vectors.planeMatrix(seed = 97L, nPlanes = 4, dim = 64)
    Layout.clusteredWrite(
      emb.withColumn("bucket",
        vectors.hyperplaneBucketFast(col("embedding"), planes)),
      dir, numFiles = 4, col("bucket"))
    val spans = Layout.fileSpans(spark, dir, "bucket")
      .select("lo", "hi").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the query's bucket (vec 0 through the same kernel)
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0)
    val qb = spark.range(1)
      .select(vectors.hyperplaneBucketFast(typedLit(qv), planes))
      .head.getLong(0)
    // the similarity scan touches ONLY files whose span covers the
    // query bucket — a strict minority (the IO win q97 is built on)
    val touched = spark.read.parquet(dir)
      .filter(col("bucket") === qb)
      .select(input_file_name()).distinct().count()
    val covering = spans.count { case (lo, hi) => lo <= qb && qb <= hi }
    touched shouldBe covering.toLong
    covering should be < spans.length
  }

  test("clusteredAppend: segments cluster independently, read as one table, never collide") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_layout_seg").toString + "/t"
    def batch(lo: Int, hi: Int) =
      (lo until hi).map(i => ((i * 7919) % 10007, s"v$i")).toDF("k", "v")
    Layout.clusteredAppend(batch(0, 4000), root, "base", 4, col("k"))
    Layout.clusteredAppend(batch(4000, 6000), root, "ingest1", 2, col("k"))
    Layout.clusteredAppend(batch(6000, 7000), root, "ingest2", 2, col("k"))
    // one logical table, complete, with seg discovered as a column
    val all = spark.read.parquet(root)
    all.count() shouldBe 7000
    all.select("seg").distinct().as[String].collect().toSet shouldBe
      Set("base", "ingest1", "ingest2")
    // the clustering property holds WITHIN each segment: per-file
    // spans are non-overlapping per segment (that is what lets a key
    // predicate prune files in every segment independently)
    val spans = Layout.fileSpans(spark, root, "k")
      .withColumn("seg", regexp_extract(col("file"), "seg=([^/]+)/", 1))
      .select("seg", "lo", "hi").as[(String, Int, Int)].collect()
    spans.groupBy(_._1).foreach { case (_, fs) =>
      fs.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, hi), (_, lo, _)) => hi should be < lo
        case _ => ()
      }
    }
    // a narrow key predicate reads a bounded file subset, not the store
    val probed = spark.read.parquet(root).filter(col("k") < 100)
      .select(input_file_name()).distinct().count()
    probed should be <= 3L // at most one boundary file per segment
    // appending the same segment id must fail loudly, never overwrite
    an[Exception] should be thrownBy
      Layout.clusteredAppend(batch(0, 10), root, "base", 1, col("k"))
    spark.read.parquet(root).count() shouldBe 7000
    // the documented maintenance cycle: compaction = clusteredWrite of
    // the union back to ONE clustered layout — global (not merely
    // per-segment) span disjointness is restored
    val compacted = Files.createTempDirectory("graft_layout_cmp").toString + "/t"
    Layout.clusteredWrite(
      spark.read.parquet(root).drop("seg"), compacted, 8, col("k"))
    spark.read.parquet(compacted).count() shouldBe 7000
    val cSpans = Layout.fileSpans(spark, compacted, "k")
      .as[(String, Int, Int, Long)].collect().sortBy(_._2)
    cSpans.length shouldBe 8
    cSpans.sliding(2).foreach {
      case Array((_, _, hi, _), (_, lo, _, _)) => hi should be < lo
      case _ => ()
    }
    Scratch.deleteRecursively(new java.io.File(compacted).getParentFile)
    Scratch.deleteRecursively(new java.io.File(root).getParentFile)
  }

  test("pruning dilution measures segment accumulation; compact restores it in place") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_layout_dil").toString + "/t"
    def batch(lo: Int, hi: Int) =
      (lo until hi).map(i => ((i * 7919) % 10007, s"v$i")).toDF("k", "v")
    // one segment, disjoint spans → dilution ~1, trigger quiet
    Layout.clusteredAppend(batch(0, 4000), root, "base", 4, col("k"))
    Layout.pruningDilution(spark, root, "k") shouldBe 1.0 +- 0.26
    Layout.needsCompaction(spark, root, "k") shouldBe false
    // each appended segment overlays another full key range: a point
    // probe now hits ~one file PER SEGMENT, and the measurement says so
    Layout.clusteredAppend(batch(4000, 6000), root, "ingest1", 2, col("k"))
    Layout.clusteredAppend(batch(6000, 8000), root, "ingest2", 2, col("k"))
    Layout.clusteredAppend(batch(8000, 9000), root, "ingest3", 2, col("k"))
    val diluted = Layout.pruningDilution(spark, root, "k")
    diluted should be > 2.0
    Layout.needsCompaction(spark, root, "k") shouldBe true
    // the trigger fires → compact IN PLACE: same path, same data, one
    // segment, dilution back to ~1, and ingest continues afterwards
    Layout.compact(spark, root, 8, col("k"))
    spark.read.parquet(root).count() shouldBe 9000
    Layout.segments(spark, root) shouldBe Seq("compacted")
    Layout.pruningDilution(spark, root, "k") shouldBe 1.0 +- 0.26
    Layout.needsCompaction(spark, root, "k") shouldBe false
    val probed = spark.read.parquet(root).filter(col("k") === 5000)
      .select(input_file_name()).distinct().count()
    probed shouldBe 1L
    Layout.clusteredAppend(batch(9000, 9100), root, "ingest4", 1, col("k"))
    spark.read.parquet(root).count() shouldBe 9100
    Scratch.deleteRecursively(new java.io.File(root).getParentFile)
  }

  test("the quantized at-rest layout (q101's stored shape) measures ~4x smaller than float32") {
    import graft.functions.vectors
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val planes = vectors.planeMatrix(97L, 4, 64)
    def dirBytes(path: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(path))
    }
    val root = Files.createTempDirectory("graft_layout_q").toString
    val bucketed = emb.withColumn("bucket",
      vectors.hyperplaneBucketFast(col("embedding"), planes))
    Layout.clusteredWrite(bucketed, s"$root/raw", 4, col("bucket"))
    Layout.clusteredWrite(
      bucketed
        .withColumn("scale", vectors.quantizeScale(col("embedding")))
        .select(col("vec_id"), col("bucket"),
          vectors.quantizeInt8(col("embedding"), col("scale"))
            .as("codes"),
          col("scale")),
      s"$root/quant", 4, col("bucket"))
    val raw = dirBytes(s"$root/raw")
    val quant = dirBytes(s"$root/quant")
    try {
      // float32 arrays are ~incompressible; int8-range codes dictionary/
      // bit-pack. The 4x claim is on the vector payload — file overhead
      // (footers, vec_id, scale) dilutes it, so assert a conservative 2x
      quant.toDouble should be < raw.toDouble / 2
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("zAddress interleaves bits (a odd positions, b even)") {
    import spark.implicits._
    // a=5 (101), b=3 (011), bits=3 → bit5=a2,b2=bit4,... = 100111 = 39
    val out = Seq((5L, 3L), (0L, 0L), (7L, 7L), (4L, 1L))
      .toDF("a", "b")
      .select(Layout.zAddress(col("a"), col("b"), 3).as("z"))
      .as[Long].collect()
    out shouldBe Array(39L, 0L, 63L, 33L)
    // locality: addresses within one 2x2 cell are contiguous 4-blocks
    val cell = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)).toDF("a", "b")
      .select(Layout.zAddress(col("a"), col("b"), 3).as("z"))
      .as[Long].collect().sorted
    cell shouldBe Array(0L, 1L, 2L, 3L)
  }

  test("zAddress roundtrip: deinterleaving recovers both dimensions on random points") {
    import spark.implicits._
    import org.scalacheck.Gen
    val seed = org.scalacheck.rng.Seed(11L)
    val gen = for {
      a <- Gen.choose(0L, 1023L); b <- Gen.choose(0L, 1023L)
    } yield (a, b)
    val pts = Gen.listOfN(300, gen).pureApply(Gen.Parameters.default, seed)
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zAddress(col("a"), col("b"), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      var ra = 0L
      var rb = 0L
      for (i <- 0 until 10) {
        ra |= ((z >> (2 * i + 1)) & 1L) << i
        rb |= ((z >> (2 * i)) & 1L) << i
      }
      (ra, rb) shouldBe ((a, b))
    }
  }

  test("zorderWrite bounds every file in BOTH dimensions and prunes on each") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zorder").toString + "/t"
    // full 64x64 grid, written in a scattered order
    val grid = (0 until 4096).map { i =>
      val j = (i * 2654435761L % 4096).toInt
      (j / 64L, j % 64L, i.toLong)
    }.toDF("u", "d", "v")
    Layout.zorderWrite(grid, dir, numFiles = 16, bits = 6,
      col("u"), col("d"))

    val uSpans = Layout.fileSpans(spark, dir, "u")
      .as[(String, Long, Long, Long)].collect()
    val dSpans = Layout.fileSpans(spark, dir, "d")
      .as[(String, Long, Long, Long)].collect()
    uSpans.map(_._4).sum shouldBe 4096L
    // files are bounded boxes in BOTH dims ON AVERAGE: 256-cell curve
    // segments are ~16x16 boxes; a segment straddling a quadrant
    // boundary can span wide in one dim (that is Z-order's known
    // boundary artifact), but the average must stay far below the
    // unclustered width of 63
    def avgWidth(spans: Array[(String, Long, Long, Long)]): Double =
      spans.map { case (_, lo, hi, _) => (hi - lo).toDouble }.sum / spans.length
    avgWidth(uSpans) should be < 32.0
    avgWidth(dSpans) should be < 32.0
    // and each dimension alone prunes: a point predicate on u (resp d)
    // touches only the files whose u-span (resp d-span) contains it —
    // at most ~a quarter of the 16 files plus boundary straddlers
    val uTouched = uSpans.count { case (_, lo, hi, _) => lo <= 5L && hi >= 5L }
    val dTouched = dSpans.count { case (_, lo, hi, _) => lo <= 40L && hi >= 40L }
    uTouched should be <= 8
    dTouched should be <= 8
    spark.read.parquet(dir).filter(col("u") === 5L)
      .select(input_file_name()).distinct().count() shouldBe uTouched.toLong
    spark.read.parquet(dir).filter(col("d") === 40L)
      .select(input_file_name()).distinct().count() shouldBe dTouched.toLong
  }
}
