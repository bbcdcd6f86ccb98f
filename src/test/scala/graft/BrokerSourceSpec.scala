package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.connector.BrokerRegistry

/** The DataSource V2 broker connector (S1): schema, one partition per
  * topic, per-topic seq order, and composition with the engine's
  * downstream operators. */
class BrokerSourceSpec extends AnyFunSuite with SparkSpec with Matchers {

  private val fmt = "graft.sources.connector.BrokerSource"

  test("reads published messages with one input partition per topic, in seq order") {
    import spark.implicits._
    BrokerRegistry.clear()
    for (i <- 0 until 40) BrokerRegistry.publish(
      "persistent://t/ns/a", s"a-$i".getBytes("UTF-8"))
    for (i <- 0 until 10) BrokerRegistry.publish(
      "persistent://t/ns/b", s"b-$i".getBytes("UTF-8"))

    val df = spark.read.format(fmt).load()
    df.schema.fieldNames.toSeq shouldBe Seq("topic", "seq", "payload")
    df.count() shouldBe 50
    // one partition per topic — ingestion parallelism = topic count
    df.rdd.getNumPartitions shouldBe 2
    // per-topic seq order and payload fidelity
    val a = df.filter(col("topic") === "persistent://t/ns/a")
      .orderBy("seq")
      .select(col("seq"), col("payload").cast("string"))
      .as[(Long, String)].collect()
    a.map(_._1).toSeq shouldBe (0L until 40L)
    a.map(_._2).toSeq shouldBe (0 until 40).map(i => s"a-$i")
  }

  test("streaming read: each micro-batch drains only the per-topic delta, exactly once") {
    import spark.implicits._
    BrokerRegistry.clear()
    for (i <- 0 until 6) BrokerRegistry.publish(
      "persistent://t/ns/s", s"m-$i".getBytes("UTF-8"))
    val q = spark.readStream.format(fmt).load()
      .writeStream.format("memory").queryName("broker_stream")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_broker_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      spark.table("broker_stream").count() shouldBe 6
      // publish a delta — the next batch must read ONLY the new rows
      for (i <- 6 until 9) BrokerRegistry.publish(
        "persistent://t/ns/s", s"m-$i".getBytes("UTF-8"))
      BrokerRegistry.publish("persistent://t/ns/s2", "x".getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = spark.table("broker_stream")
        .select(col("topic"), col("seq")).as[(String, Long)].collect()
      rows.length shouldBe 10 // 6 + 3 delta + 1 new topic, no dups
      rows.filter(_._1.endsWith("/s")).map(_._2).sorted shouldBe (0L until 9L)
    } finally q.stop()
  }

  test("streaming restart from a multi-topic checkpoint resumes exactly-once") {
    import spark.implicits._
    BrokerRegistry.clear()
    // TWO topics before the first checkpoint: the offset json must
    // stay single-line or Spark's line-oriented OffsetSeqLog corrupts
    // and the restart below can never get past offset recovery
    for (i <- 0 until 4) BrokerRegistry.publish(
      "persistent://t/ns/r1", s"a-$i".getBytes("UTF-8"))
    for (i <- 0 until 3) BrokerRegistry.publish(
      "persistent://t/ns/r2", s"b-$i".getBytes("UTF-8"))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_broker_restart").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_broker_restart_out").toString
    // file sink: the memory sink refuses checkpoint recovery, and
    // recovery is exactly what this test exercises
    def start() = spark.readStream.format(fmt).load()
      .selectExpr("topic", "seq", "CAST(payload AS STRING) AS body")
      .writeStream.format("json").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    spark.read.json(out).count() shouldBe 7
    // delta published while the stream is DOWN; the restarted query
    // must resume from the checkpointed offsets, reading only this
    for (i <- 4 until 6) BrokerRegistry.publish(
      "persistent://t/ns/r1", s"a-$i".getBytes("UTF-8"))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val all = spark.read.json(out)
      .select(col("topic"), col("seq")).as[(String, Long)].collect()
    all.length shouldBe 9 // 7 + the 2-row delta, each exactly once
    all.filter(_._1.endsWith("/r1")).map(_._2).sorted shouldBe (0L until 6L)
  }

  test("topicsPattern scopes partition PLANNING, batch and streaming") {
    import spark.implicits._
    BrokerRegistry.clear()
    for (t <- Seq("persistent://acme/prod/a", "persistent://acme/prod/b",
        "persistent://globex/dev/c"); i <- 0 until 4)
      BrokerRegistry.publish(t, s"$t#$i".getBytes("UTF-8"))
    // batch: only matching topics are PLANNED — partition count shows
    // the pruning happened before the scan, not as a post-filter
    val scoped = spark.read.format(fmt)
      .option("topicsPattern", "persistent://acme/prod/.*").load()
    scoped.rdd.getNumPartitions shouldBe 2
    scoped.select("topic").distinct().as[String].collect().sorted shouldBe
      Array("persistent://acme/prod/a", "persistent://acme/prod/b")
    // explicit list composes as an intersection
    val both = spark.read.format(fmt)
      .option("topicsPattern", "persistent://acme/.*")
      .option("topics", "persistent://acme/prod/a, persistent://globex/dev/c")
      .load()
    both.rdd.getNumPartitions shouldBe 1
    // streaming: the offset snapshot itself is scoped, so out-of-scope
    // topics never enter the checkpoint either
    val q = spark.readStream.format(fmt)
      .option("topicsPattern", ".*globex.*").load()
      .writeStream.format("memory").queryName("broker_scoped")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_broker_scope").toString)
      .start()
    try {
      q.processAllAvailable()
      spark.table("broker_scoped").select("topic").distinct()
        .as[String].collect() shouldBe Array("persistent://globex/dev/c")
      spark.table("broker_scoped").count() shouldBe 4
    } finally q.stop()
  }

  test("connector rows flow into the catalog/capture operators unchanged") {
    BrokerRegistry.clear()
    for (t <- Seq("persistent://acme/prod/x", "persistent://acme/prod/x-partition-0",
        "persistent://globex/dev/y"); i <- 0 until 3)
      BrokerRegistry.publish(t, s"$t#$i".getBytes("UTF-8"))
    val df = spark.read.format(fmt).load()
    val rolled = graft.catalog.CatalogOps.rollupPartitions(
      df.select(col("topic")).distinct())
    rolled.count() shouldBe 2 // x (+ its partition shard) and y
    rolled.filter(col("parent_topic") === "persistent://acme/prod/x")
      .select("n_entries").collect().head.getLong(0) shouldBe 2
  }
}
