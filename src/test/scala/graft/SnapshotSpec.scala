package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.replay.Replay
import graft.sources.SnapshotIO

/** Golden-file + round-trip tests for the reference's snapshot
  * interchange format (README.md:52-75) and the ordered replay
  * pipeline (L4/T6). */
class SnapshotSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val golden = "src/test/resources/golden_snapshot"

  /** The golden dir is in the REFERENCE's literal layout (colons in
    * file names — unrepresentable as Hadoop Paths), so reading starts
    * with the driver-side import shim. */
  private lazy val imported: String = {
    val tmp = Files.createTempDirectory("graft_golden_import").toString
    SnapshotIO.importReferenceSnapshot(golden, tmp)
    tmp
  }

  test("golden snapshot (reference layout) imports and reads with reference semantics") {
    val msgs = SnapshotIO.readMessages(spark, imported)
    val rows = msgs.orderBy("topic", "seq").collect()
    rows.length shouldBe 5
    // lossy topic recovery matches the reference ("_" → "/")
    rows.map(_.getAs[String]("topic")).distinct.sorted shouldBe
      Array("persistent://acme/prod/orders", "persistent://globex/dev/clicks")
    // seq follows array order within each file
    val orders = rows.filter(_.getAs[String]("topic").endsWith("orders"))
    orders.map(_.getAs[Long]("seq")).toList shouldBe List(0L, 1L, 2L)
    orders.map(_.getAs[String]("content")).toList shouldBe
      List("order one", "/w==", "order three")
    // event_timestamp 0 normalizes to null; nonzero survives
    orders.map(r => Option(r.getAs[Timestamp]("event_ts")).isDefined).toList shouldBe
      List(true, false, false)
    // properties: map, empty map, null
    orders.map(r => Option(r.getAs[Map[String, String]]("properties"))).toList shouldBe
      List(Some(Map("k" -> "v", "source" -> "test")), Some(Map.empty), None)
  }

  test("golden catalog text files read into catalog frames") {
    SnapshotIO.readTenants(spark, imported).collect().map(_.getString(0)).sorted shouldBe
      Array("acme", "globex")
    val ns = SnapshotIO.readNamespaces(spark, imported).collect()
    ns.map(r => (r.getString(0), r.getString(1))).sorted shouldBe
      Array(("acme", "acme/prod"), ("globex", "globex/dev"))
    SnapshotIO.readTopics(spark, imported, all = true).count() shouldBe 3
    SnapshotIO.readTopics(spark, imported).count() shouldBe 2
  }

  test("an EMPTY catalog writes empty files, not one phantom empty-string entry") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_snap_empty").toString
    val none = Seq.empty[String].toDF("tenant")
    SnapshotIO.writeCatalog(
      none,
      Seq.empty[String].toDF("namespace"),
      Seq.empty[String].toDF("topic"),
      Seq.empty[String].toDF("topic"), tmp)
    // a lone "\n" would read back as one empty-string tenant, and a
    // restore would then emit `CREATE tenant ` with an empty name
    SnapshotIO.readTenants(spark, tmp).count() shouldBe 0
    SnapshotIO.readNamespaces(spark, tmp).count() shouldBe 0
    SnapshotIO.readTopics(spark, tmp).count() shouldBe 0
  }

  test("capture → read round-trip is a fixed point (incl. underscore topics and binary payloads)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_snap").toString
    val env = Seq(
      ("persistent://t/ns/topic_v2", "hello", false, Map("a" -> "b"),
        new Timestamp(1704067200000L), Option(new Timestamp(1704067201000L)),
        Option("pk"), 0L),
      ("persistent://t/ns/topic_v2", "/w==", true, Map.empty[String, String],
        new Timestamp(1704067202000L), Option.empty[Timestamp],
        Option.empty[String], 1L),
      ("persistent://t/ns/other", "solo", false, Map.empty[String, String],
        new Timestamp(1704067203000L), Option.empty[Timestamp],
        Option("k2"), 0L))
      .toDF("topic", "content", "binary_encoded", "properties",
        "publish_ts", "event_ts", "partition_key", "seq")
    Replay.capture(env, tmp)

    // catalog files landed
    SnapshotIO.readTenants(spark, tmp).collect().map(_.getString(0)).toSet shouldBe Set("t")
    SnapshotIO.readTopics(spark, tmp).count() shouldBe 2

    // message round-trip: every field survives, seq order preserved
    val back = SnapshotIO.readMessages(spark, tmp)
    def key(r: Row) = (r.getAs[String]("topic"), r.getAs[Long]("seq"))
    val a = env.collect().map(r => key(r) -> r.toSeq.toList).toMap
    val b = back.select(env.columns.map(col): _*).collect()
      .map(r => key(r) -> r.toSeq.toList).toMap
    b.keySet shouldBe a.keySet
    b.keys.foreach { k =>
      // properties may come back as different Map impls — compare via toString-stable Rows
      b(k).toString shouldBe a(k).toString
    }
  }

  test("writeNative: parquet partitioned by topic, pruned on read, ordered by seq") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_native").toString
    val env = (for (t <- Seq("ta", "tb"); s <- 0 until 20) yield
      (t, s"m$s", false, Map.empty[String, String],
        new Timestamp(1704067200000L + s), Option.empty[Timestamp],
        Option.empty[String], s.toLong))
      .toDF("topic", "content", "binary_encoded", "properties",
        "publish_ts", "event_ts", "partition_key", "seq")
    SnapshotIO.writeNative(env, tmp)
    val back = spark.read.parquet(s"$tmp/messages_parquet")
    back.count() shouldBe 40
    // partition pruning: a topic filter reads only that partition
    val pruned = back.filter(col("topic") === "ta")
    pruned.count() shouldBe 20
    pruned.queryExecution.executedPlan.toString should include("PartitionFilters: [isnotnull(topic")
  }

  test("orderedReplay hands rows to the sink in per-topic seq order") {
    import spark.implicits._
    // shuffled input: seqs deliberately out of order across partitions
    val rows = scala.util.Random.shuffle(
      (for (t <- Seq("tA", "tB"); s <- 0 until 50) yield (t, s.toLong)).toList)
    val env = rows.toDF("topic", "seq").repartition(8)
    SnapshotSpec.collected.clear()
    Replay.orderedReplay(env, { it: Iterator[Row] =>
      it.foreach(r => SnapshotSpec.collected.add(
        (r.getAs[String]("topic"), r.getAs[Long]("seq"))))
    })
    val byTopic = SnapshotSpec.collected.toArray(Array.empty[(String, Long)])
      .groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
    byTopic.keySet shouldBe Set("tA", "tB")
    // within each topic, arrival order == seq order
    byTopic.values.foreach(seqs => seqs shouldBe seqs.sorted)
    byTopic.values.map(_.size).toList.sorted shouldBe List(50, 50)
  }

  test("replaySnapshot decodes binary payloads before send") {
    SnapshotSpec.payloads.clear()
    Replay.replaySnapshot(spark, imported, { it: Iterator[Row] =>
      it.foreach(r => SnapshotSpec.payloads.add(
        r.getAs[Array[Byte]]("payload").toList))
    })
    val got = SnapshotSpec.payloads.toArray(Array.empty[List[Byte]]).toSet
    got should contain(List[Byte](-1))            // "/w==" → 0xFF
    got should contain("order one".getBytes("UTF-8").toList)
  }
}

object SnapshotSpec {
  // executor-side collectors (local mode: same JVM)
  val collected = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
  val payloads = new java.util.concurrent.ConcurrentLinkedQueue[List[Byte]]()
}
