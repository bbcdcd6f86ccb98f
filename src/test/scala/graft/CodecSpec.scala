package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.codec

/** Property tests for the payload/topic codecs — the two documented
  * reference bugs (lossy "_"↔"/" topic mapping at
  * pulsar_backup_restore.py:103,192 and the always-False
  * binary_encoded flag at :124,128) are exactly the cases these
  * properties pin down. Samples are generated with ScalaCheck and
  * evaluated in one batch DataFrame per property (not one job per
  * sample). */
class CodecSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val seed = org.scalacheck.rng.Seed(42L)

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, seed)

  // topic-ish strings, heavy on the marker characters
  private val topicGen: Gen[String] = for {
    parts <- Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.const("_"), Gen.const("/"), Gen.const("_u"), Gen.const("_s"),
      Gen.const("_us"), Gen.const("__"), Gen.const("persistent://")))
  } yield parts.mkString

  test("sanitizeTopic ∘ desanitizeTopic = id (incl. _, /, _us edge cases)") {
    val edge = List("a_b", "a/b", "a_us", "a__b", "a_u_s", "_", "/", "",
      "persistent://t_1/ns_2/topic_3", "_s", "_u", "a_sb", "x_u/y_s")
    val topics = edge ++ samples(topicGen, 300)
    import spark.implicits._
    val df = topics.toDF("topic")
      .withColumn("rt", codec.desanitizeTopic(codec.sanitizeTopic(col("topic"))))
      .withColumn("file", codec.sanitizeTopic(col("topic")))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(0),
        s"round-trip broke for '${r.getString(0)}' -> '${r.getString(2)}' -> '${r.getString(1)}'")
      assert(!r.getString(2).contains("/"),
        s"sanitized name still contains '/': ${r.getString(2)}")
    }
  }

  test("lossy compat mapping corrupts underscore topics (the reference bug)") {
    import spark.implicits._
    val df = List("tenant/ns/topic_v2").toDF("topic")
      .select(codec.desanitizeTopicLossy(codec.sanitizeTopicLossy(col("topic"))))
    df.collect().head.getString(0) shouldBe "tenant/ns/topic/v2" // corrupted
  }

  test("encodeContent ∘ decodeContent = id on arbitrary byte arrays") {
    val edge: List[Array[Byte]] = List(
      Array[Byte](),                        // empty
      "plain text".getBytes("UTF-8"),
      Array[Byte](-1, -2, -3),              // invalid UTF-8
      Array[Byte](0),                       // NUL is valid UTF-8
      Array[Byte](-64, -128),               // overlong encoding (invalid)
      "Ünïcodé ✓".getBytes("UTF-8"),
      Array[Byte](-19, -96, -128))          // UTF-16 surrogate (invalid)
    val rnd = edge ++ samples(Arbitrary.arbitrary[Array[Byte]], 300)
    import spark.implicits._
    val df = rnd.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "payload")
      .withColumn("enc", codec.encodeContent(col("payload")))
      .withColumn("rt", codec.decodeContent(
        col("enc.content"), col("enc.binary_encoded")))
      .withColumn("ok", coalesce(col("rt") === col("payload"),
        col("rt").isNull && col("payload").isNull))
    val bad = df.filter(!col("ok")).select("i").collect().map(_.getInt(0))
    assert(bad.isEmpty, s"byte-array round-trip failed for sample indexes: ${bad.take(10).mkString(",")}")
  }

  test("binary_encoded flag is set from the decode result, not always false") {
    import spark.implicits._
    val df = List(
      "text".getBytes("UTF-8"),
      Array[Byte](-1, -2)).toDF("payload")
      .select(codec.encodeContent(col("payload")).getField("binary_encoded"))
    df.collect().map(_.getBoolean(0)).toList shouldBe List(false, true)
  }

  test("event_timestamp 0 ↔ null wire normalization") {
    import spark.implicits._
    val df = List(0L, 1704067200123L).toDF("ms")
      .select(codec.eventTsToWire(codec.eventTsOrNull(col("ms"))).as("wire"))
    df.collect().map(_.getLong(0)).toList shouldBe List(0L, 1704067200123L)
  }
}
