package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.codec
import graft.sources.SnapshotIO

/** End-to-end drive of the graft.Main CLI over the golden snapshot —
  * the user-facing entry point the reference exposes as an argparse /
  * interactive menu. */
class MainSpec extends AnyFunSuite with SparkSpec with Matchers {

  private lazy val imported: String = {
    val tmp = Files.createTempDirectory("graft_main_golden").toString
    SnapshotIO.importReferenceSnapshot("src/test/resources/golden_snapshot", tmp)
    tmp
  }

  test("list-topics composes union->dedup->rollup->priority->limit over a snapshot") {
    val lines = Main.run(spark, Seq("list-topics", imported, "10"))
    lines.head should include("TOPIC")
    lines.tail.mkString("\n") should include("persistent://acme/prod/orders")
    lines.size should be > 2
  }

  test("restore dry-run emits DDL parents-first") {
    val lines = Main.run(spark, Seq("restore", imported))
    lines should contain("CREATE tenant acme")
    val kinds = lines.map(_.split(" ")(1))
    // every tenant precedes every namespace precedes every topic
    kinds.lastIndexOf("tenant") should be < kinds.indexOf("namespace")
    kinds.lastIndexOf("namespace") should be < kinds.indexOf("topic")
  }

  test("replay writes one payload file per topic, lines in seq order") {
    val out = Files.createTempDirectory("graft_main_replay").toString
    val lines = Main.run(spark, Seq("replay", imported, out))
    lines.head should include("2 topics")
    val ordersFile = new java.io.File(out,
      codec.sanitizeTopicStr("persistent://acme/prod/orders") + ".txt")
    ordersFile.exists() shouldBe true
    val payloads = Files.readAllLines(ordersFile.toPath)
    payloads.size() shouldBe 3
    new String(java.util.Base64.getDecoder.decode(payloads.get(0)),
      "UTF-8") shouldBe "order one"
    // the binary message ("/w==" with binary_encoded=true) decodes to 0xFF
    java.util.Base64.getDecoder.decode(payloads.get(1)) shouldBe Array(0xFF.toByte)
  }

  test("publish writes exactly count wire-format messages") {
    val out = Files.createTempDirectory("graft_main_pub").toString
    Main.run(spark, Seq("publish", out, "25")).head should include("25")
    spark.read.text(out).count() shouldBe 25
  }

  test("capture converts the native parquet layout into the snapshot layout") {
    import spark.implicits._
    val nat = Files.createTempDirectory("graft_main_nat").toString
    val snap = Files.createTempDirectory("graft_main_snap").toString
    val env = Seq(
      ("persistent://t/ns/a", "m0", false, Map.empty[String, String],
        new Timestamp(1704067200000L), Option.empty[Timestamp],
        Option.empty[String], 0L),
      ("persistent://t/ns/a", "m1", false, Map.empty[String, String],
        new Timestamp(1704067201000L), Option.empty[Timestamp],
        Option.empty[String], 1L),
      ("persistent://t/ns/b", "m2", false, Map.empty[String, String],
        new Timestamp(1704067202000L), Option.empty[Timestamp],
        Option.empty[String], 0L))
      .toDF("topic", "content", "binary_encoded", "properties",
        "publish_ts", "event_ts", "partition_key", "seq")
    SnapshotIO.writeNative(env, nat)
    Main.run(spark, Seq("capture", nat, snap)).head should include("3 messages")
    SnapshotIO.readMessages(spark, snap).count() shouldBe 3
    SnapshotIO.readTenants(spark, snap).collect()
      .map(_.getString(0)) shouldBe Array("t")
  }

  test("import rewrites a reference-layout snapshot that other commands can read") {
    val dest = Files.createTempDirectory("graft_main_import").toString
    Main.run(spark, Seq("import", "src/test/resources/golden_snapshot", dest))
      .head should include("imported")
    SnapshotIO.readMessages(spark, dest).count() shouldBe 5
    Main.run(spark, Seq("list-topics", dest, "10"))
      .tail.mkString("\n") should include("persistent://acme/prod/orders")
  }

  test("unknown command prints usage") {
    Main.run(spark, Seq("frobnicate")).head should include("usage")
  }
}
