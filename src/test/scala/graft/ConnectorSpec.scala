package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{AdminCatalog, CatalogOps, DdlSink}
import graft.operators.Multimodal
import graft.sources.ConfigIO

/** Connector-side seams (S6/S7/K6) and the multimodal plumbing:
  * injected fetchers/clients against fixture data. */
class ConnectorSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val fixtureNs = Map(
    "acme" -> Seq("acme/prod", "acme/stage"),
    "globex" -> Seq("globex/dev"),
    "empty-tenant" -> Seq.empty) // 404 → empty contract (P7)

  test("S6: REST catalog fan-out builds the 3-way deduped topic frame") {
    val tenants = AdminCatalog.tenantsDF(spark, () => fixtureNs.keys.toSeq)
    tenants.count() shouldBe 3
    val ns = AdminCatalog.namespacesDF(spark, fixtureNs.keys.toSeq, fixtureNs)
    ns.count() shouldBe 3
    val topics = AdminCatalog.topicsDF(spark,
      Seq("acme/prod", "globex/dev"),
      fetchPlain = n => Seq(s"persistent://$n/orders"),
      fetchPartitioned = n =>
        if (n == "acme/prod")
          Seq(s"persistent://$n/orders", // dup of plain: first wins
            s"persistent://$n/feed-partition-0")
        else Seq.empty,
      fetchSystem = n => Seq(s"persistent://$n/__change_events"))
    val rows = topics.collect().map(r => (r.getAs[String]("topic"),
      r.getAs[Int]("src_rank"), r.getAs[Boolean]("partitioned"),
      r.getAs[Boolean]("is_system"))).toSet
    rows should contain(("persistent://acme/prod/orders", 1, false, false))
    rows should contain(("persistent://acme/prod/feed-partition-0", 2, true, false))
    rows should contain(("persistent://acme/prod/__change_events", 3, false, true))
    topics.count() shouldBe 5 // dup collapsed
  }

  test("K6: DDL ordering — create parents first, delete children first") {
    import spark.implicits._
    val tenants = Seq("t1").toDF("tenant")
    val namespaces = Seq("t1/ns").toDF("namespace")
    val topics = Seq("persistent://t1/ns/a").toDF("topic")
    val applied = scala.collection.mutable.ArrayBuffer.empty[String]
    DdlSink.restore(tenants, namespaces, topics,
      t => applied += s"ct:$t", n => applied += s"cn:$n", p => applied += s"cp:$p")
    applied.toList shouldBe List("ct:t1", "cn:t1/ns", "cp:persistent://t1/ns/a")
    applied.clear()
    DdlSink.deleteAll(tenants, namespaces, topics,
      p => applied += s"dp:$p", n => applied += s"dn:$n", t => applied += s"dt:$t")
    applied.toList shouldBe List("dp:persistent://t1/ns/a", "dn:t1/ns", "dt:t1")
  }

  test("S7: config context parsing (reference's client config shape)") {
    val text =
      """# pulsar client config
        |contexts:
        |  prod-cluster:
        |    admin-service-url: https://admin.example:8443
        |    bootstrap-service-url: pulsar+ssl://broker.example:6651
        |  dev:
        |    admin-service-url: http://localhost:8080
        |
        |auth-info:
        |  prod-cluster:
        |    token: secret-token
        |""".stripMargin
    val cfg = ConfigIO.parseContexts(text)
    cfg("contexts")("prod-cluster")("admin-service-url") shouldBe
      "https://admin.example:8443"
    cfg("contexts")("dev")("admin-service-url") shouldBe "http://localhost:8080"
    cfg("auth-info")("prod-cluster")("token") shouldBe "secret-token"
    cfg("contexts").keySet shouldBe Set("prod-cluster", "dev")
  }

  test("multimodal: mime sniffing, frame sampling, batched decode seam") {
    import spark.implicits._
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++ Array.fill[Byte](40)(1)
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47) ++ Array.fill[Byte](7)(2)
    val txt = "hello world".getBytes("UTF-8")
    val df = Seq((1L, jpeg), (2L, png), (3L, txt)).toDF("id", "payload")
    val out = df.select(
      col("id"),
      Multimodal.sniffMime(col("payload")).as("mime"),
      org.apache.spark.sql.functions.size(
        Multimodal.frameSample(col("payload"), 16, 4)).as("n_frames"),
      Multimodal.hashFeatures(col("payload"), 4).as("f"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getSeq[Double](3))).toMap
    out(1L)._1 shouldBe "image/jpeg"
    out(2L)._1 shouldBe "image/png"
    out(3L)._1 shouldBe "application/octet-stream"
    out(1L)._2 shouldBe 3 // 42 bytes / 16 → 3 frames
    out(2L)._2 shouldBe 1
    out.values.foreach { case (_, _, f) =>
      f.length shouldBe 4
      f.foreach(x => x should (be >= 0.0 and be < 1.0))
    }
    // resize stub: short payloads pass through; long ones downsample
    val resized = df.select(col("id"),
      Multimodal.byteDownsample(col("payload"), 16).as("r"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("r")).toMap
    resized(3L).toList shouldBe txt.toList  // 11 bytes <= 16: unchanged
    resized(1L).length should be <= 16      // 42 bytes: downsampled
    resized(1L)(0) shouldBe jpeg(0)         // stride sampling keeps byte 0

    // the per-partition decode seam: one decoder "init" per partition
    val decoded = Multimodal.decodePartitions[(Long, Int)](
      df.repartition(2), { it =>
        val decoderInit = 1 // a real codec would init here, once
        it.map(r => (r.getAs[Long]("id"),
          r.getAs[Array[Byte]]("payload").length * decoderInit))
      })
    decoded.collect().toMap shouldBe Map(1L -> 42, 2L -> 11, 3L -> 11)
  }

  test("multimodal: REAL PNG encode/decode round-trip measures pixels") {
    import spark.implicits._
    // 10x4: left 5 columns red 200, right 5 blue 50 → exact means
    val bytes = Multimodal.encodePng(10, 4, 200 << 16, 50)
    // it really is a PNG (magic bytes), decodable by the kernel
    bytes.take(4).map(_ & 0xFF) shouldBe Array(0x89, 0x50, 0x4E, 0x47)
    val df = Seq((7L, bytes)).toDF("id", "payload")
    val stats = Multimodal.decodePartitions[graft.operators.ImageStats](
      df, Multimodal.decodeImageStats).collect().head
    stats shouldBe graft.operators.ImageStats(7L, 10, 4, 100.0, 0.0, 25.0)
    // an undecodable payload fails loudly, not silently
    val bad = Seq((8L, "not an image".getBytes("UTF-8"))).toDF("id", "payload")
    an[Exception] should be thrownBy Multimodal.decodePartitions[
      graft.operators.ImageStats](bad, Multimodal.decodeImageStats).collect()
  }

  test("multimodal: nearest-neighbor resize samples exactly the index-arithmetic grid") {
    import spark.implicits._
    // 10x4 two-tone: 5x3 sampling reads x = floor(i*10/5) = 0,2,4,6,8
    // → 3 left (red 200) + 2 right (blue 50) per row, 3 rows:
    // mean_r = 9*200/15 = 120, mean_b = 6*50/15 = 20
    val bytes = Multimodal.encodePng(10, 4, 200 << 16, 50)
    val df = Seq((7L, bytes)).toDF("id", "payload")
    val stats = Multimodal.decodePartitions[graft.operators.ImageStats](
      df, Multimodal.decodeResizedStats(5, 3)).collect().head
    stats shouldBe graft.operators.ImageStats(7L, 10, 4, 120.0, 0.0, 20.0)
    // upsampling duplicates source pixels deterministically: 2x1 →
    // 5x1 reads x = 0,0,0,1,1 → 3 left + 2 right of 5
    val tiny = Multimodal.encodePng(2, 1, 200 << 16, 50)
    val up = Multimodal.decodePartitions[graft.operators.ImageStats](
      Seq((8L, tiny)).toDF("id", "payload"),
      Multimodal.decodeResizedStats(5, 1)).collect().head
    up shouldBe graft.operators.ImageStats(8L, 2, 1, 120.0, 0.0, 20.0)
  }

  test("multimodal: decodeGridHash packs thresholded cell luma row-major") {
    import spark.implicits._
    // 16x16 of 2x2 solid cells on an 8x8 grid: bright (200) exactly
    // at cells 0, 5, 63 → hash has exactly those bits
    val bright = Set(0, 5, 63)
    val enc = new graft.operators.PngEncoder()
    val bytes = enc.encodePixels(16, 16, (x, y) => {
      val i = (y / 2) * 8 + (x / 2)
      val v = if (bright(i)) 200 else 60
      (v << 16) | (v << 8) | v
    })
    val hash = Multimodal.decodePartitions[(Long, Long)](
      Seq((3L, bytes)).toDF("id", "payload"),
      Multimodal.decodeGridHash(8, 8, 128)).collect().head
    hash shouldBe ((3L, (1L << 0) | (1L << 5) | (1L << 63)))
    // grid wider than 64 bits fails loudly at construction
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeGridHash(9, 8, 128)(Iterator.empty)
  }

  test("multimodal: GVID container samples every stride-th frame and decodes it") {
    import spark.implicits._
    // 3 frames of a 10x4 two-tone; stride 2 decodes frames 0 and 2
    // only — their colors differ from frame 1's, so the means prove
    // WHICH frames were read
    def frame(red: Int) = Multimodal.encodePng(10, 4, red << 16, 50)
    val vid = Multimodal.encodeVideo(Seq(frame(200), frame(99), frame(100)))
    new String(vid.take(4), "US-ASCII") shouldBe "GVID"
    val stats = Multimodal.decodePartitions[graft.operators.VideoStats](
      Seq((7L, vid)).toDF("id", "payload"),
      Multimodal.decodeSampledVideoStats(2)).collect().head
    // frames 0,2: mean_r = (200 + 100)/2 / 2 halves = 75; blue 25
    stats shouldBe graft.operators.VideoStats(7L, 3, 2, 10, 4,
      75.0, 0.0, 25.0)
    // stride 1 reads all three: mean_r = (200+99+100)/(2*3) = 66.5
    Multimodal.decodePartitions[graft.operators.VideoStats](
      Seq((7L, vid)).toDF("id", "payload"),
      Multimodal.decodeSampledVideoStats(1)).collect()
      .head.mean_r shouldBe 66.5
    // an EMPTY container is well-formed data: zero row, not a crash
    val empty = Multimodal.encodeVideo(Seq.empty)
    Multimodal.decodePartitions[graft.operators.VideoStats](
      Seq((6L, empty)).toDF("id", "payload"),
      Multimodal.decodeSampledVideoStats(2)).collect()
      .head shouldBe graft.operators.VideoStats(6L, 0, 0, 0, 0,
        0.0, 0.0, 0.0)
    // dimension drift between sampled frames fails loudly
    val drift = Multimodal.encodeVideo(
      Seq(frame(200), Multimodal.encodePng(4, 4, 200 << 16, 50)))
    an[Exception] should be thrownBy Multimodal.decodePartitions[
      graft.operators.VideoStats](
      Seq((8L, drift)).toDF("id", "payload"),
      Multimodal.decodeSampledVideoStats(1)).collect()
    // and so does a bad container magic
    an[Exception] should be thrownBy Multimodal.decodePartitions[
      graft.operators.VideoStats](
      Seq((9L, "nope".getBytes("UTF-8") ++ vid)).toDF("id", "payload"),
      Multimodal.decodeSampledVideoStats(1)).collect()
  }

  test("multimodal: REAL WAV encode/decode round-trip measures samples") {
    import spark.implicits._
    val samples = Array[Short](100, -200, 300, -400)
    val bytes = new graft.operators.WavEncoder().encode(samples, 8000)
    // it really is a RIFF/WAVE container, and sniffMime agrees
    new String(bytes.take(4), "US-ASCII") shouldBe "RIFF"
    // container fidelity PROVEN, not assumed: byte-identical to what
    // the JDK's own writer emits for the same samples (the kernel
    // hand-rolls the 44-byte header because AudioSystem.write takes a
    // synchronized registry lookup per file — a measured 32-task
    // serializer; this assertion keeps the two in lockstep)
    val jdk = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = samples.flatMap(s =>
        Array((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte))
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    bytes.toSeq shouldBe jdk.toSeq
    val df = Seq((9L, bytes)).toDF("id", "payload")
    df.select(Multimodal.sniffMime(col("payload"))).head.getString(0) shouldBe
      "audio/wav"
    val stats = Multimodal.decodePartitions[graft.operators.AudioStats](
      df, Multimodal.decodeAudioStats).collect().head
    // mean |amplitude| measured from DECODED frames: (100+200+300+400)/4
    stats shouldBe graft.operators.AudioStats(9L, 4, 8000, 1, 250.0)
    // extremes survive the 16-bit round trip (incl. Short.MinValue)
    val edge = new graft.operators.WavEncoder()
      .encode(Array[Short](Short.MinValue, Short.MaxValue, 0), 44100)
    val es = Multimodal.decodePartitions[graft.operators.AudioStats](
      Seq((10L, edge)).toDF("id", "payload"),
      Multimodal.decodeAudioStats).collect().head
    es.n_samples shouldBe 3
    es.sample_rate shouldBe 44100
    es.mean_abs shouldBe ((32768.0 + 32767.0 + 0.0) / 3)
    // an undecodable payload fails loudly, not silently
    val bad = Seq((11L, "not audio".getBytes("UTF-8"))).toDF("id", "payload")
    an[Exception] should be thrownBy Multimodal.decodePartitions[
      graft.operators.AudioStats](bad, Multimodal.decodeAudioStats).collect()
  }

  test("multimodal: audio energy hash thresholds decoded window means") {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    // 8 windows over 16 mono samples (2 per window): windows 0, 3, 5
    // loud (|s| = 2000), the rest quiet (|s| = 10); threshold 1000
    val loud = Set(0, 3, 5)
    val samples = Array.tabulate[Short](16) { i =>
      val a = if (loud(i / 2)) 2000 else 10
      (if (i % 2 == 0) a else -a).toShort
    }
    val bytes = new graft.operators.WavEncoder().encode(samples, 8000)
    Multimodal.decodePartitions[(Long, Long)](
      Seq((5L, bytes)).toDF("id", "payload"),
      Multimodal.decodeAudioEnergyHash(8, 1000))(enc)
      .collect().head shouldBe ((5L, loud.map(1L << _).sum))
    // a window mean EXACTLY at the threshold sets the bit (>=), and
    // uneven window sizes follow the integer boundary arithmetic:
    // 3 windows over 4 frames → windows [0,1), [1,2), [2,4)
    val edge = new graft.operators.WavEncoder()
      .encode(Array[Short](1000, 999, 2000, 0), 8000)
    Multimodal.decodePartitions[(Long, Long)](
      Seq((6L, edge)).toDF("id", "payload"),
      Multimodal.decodeAudioEnergyHash(3, 1000))(enc)
      .collect().head shouldBe ((6L, 1L | (1L << 2)))
    // fewer decoded frames than hash windows fails loudly — a
    // truncated fingerprint would silently mis-bucket the corpus
    val tiny = new graft.operators.WavEncoder()
      .encode(Array[Short](1, 2), 8000)
    an[Exception] should be thrownBy Multimodal.decodePartitions[
      (Long, Long)](Seq((7L, tiny)).toDF("id", "payload"),
      Multimodal.decodeAudioEnergyHash(3, 1000))(enc).collect()
  }

  test("multimodal: stereo and big-endian PCM decode through the same kernel") {
    import spark.implicits._
    def jdkContainer(fmt: javax.sound.sampled.AudioFormat,
        pcm: Array[Byte], frames: Long,
        tpe: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    // stereo little-endian WAV: 2 frames of (L, R) samples
    val stereo = jdkContainer(
      new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false),
      Array[Short](100, -200, 300, -400).flatMap(s =>
        Array((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)),
      frames = 2, javax.sound.sampled.AudioFileFormat.Type.WAVE)
    // big-endian 16-bit PCM rides the AIFF container (WAV is
    // little-endian by spec; AIFF is the big-endian interchange twin)
    val aiff = jdkContainer(
      new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true),
      Array[Short](100, -200, 300, -400).flatMap(s =>
        Array(((s >> 8) & 0xFF).toByte, (s & 0xFF).toByte)),
      frames = 4, javax.sound.sampled.AudioFileFormat.Type.AIFF)
    // ONE partition, mixed containers: the move-to-front provider
    // cache must keep falling back to the right reader per payload
    val df = Seq((1L, stereo), (2L, aiff)).toDF("id", "payload").coalesce(1)
    val stats = Multimodal.decodePartitions[graft.operators.AudioStats](
      df, Multimodal.decodeAudioStats).collect().sortBy(_.id)
    // stereo: 2 frames x 2 channels, mean |amp| over all samples;
    // AIFF: 4 mono frames — same DECODED statistic either way
    stats(0) shouldBe graft.operators.AudioStats(1L, 2, 8000, 2, 250.0)
    stats(1) shouldBe graft.operators.AudioStats(2L, 4, 8000, 1, 250.0)
  }

  test("K4: rate stream → producer sink seam delivers generated messages") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_prod_ckpt").toString
    ConnectorSpec.sent.clear()
    val q = graft.streaming.Streams.toProducerSink(
      graft.streaming.Streams.syntheticPublishStream(spark, rowsPerSecond = 200),
      ckpt,
      { it: Iterator[Row] =>
        it.foreach(r => ConnectorSpec.sent.add(r.getAs[String]("value")))
      })
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (ConnectorSpec.sent.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(200)
      ConnectorSpec.sent.isEmpty shouldBe false
      ConnectorSpec.sent.peek() should include("\"eventId\"")
    } finally q.stop()
  }
}

object ConnectorSpec {
  val sent = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
