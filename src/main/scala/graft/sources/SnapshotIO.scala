package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.codec
import graft.model.Schemas

/** Reader/writer for the reference's on-disk snapshot format
  * (README.md:52-75; writer pulsar_backup_restore.py:59-96,142-143):
  *
  * {{{
  * <dir>/tenants.txt        one tenant per line
  * <dir>/namespaces.txt     one "tenant/ns" per line
  * <dir>/topics.txt         non-partition topics
  * <dir>/all_topics.txt     unfiltered topic list
  * <dir>/messages/<sanitized-topic>.json   JSON ARRAY per topic
  * }}}
  *
  * The engine's native at-rest format is Parquet partitioned by
  * topic; this module is the interchange boundary with the reference
  * tooling. Reads fan out one task per topic file; the per-topic
  * message order of the reference (array position) is preserved in an
  * explicit `seq` column, which is what replay sorts on — relying on
  * physical row order would not survive a shuffle on a cluster.
  */
object SnapshotIO {

  /** Read all per-topic message files into the envelope frame.
    * Topic name is recovered from the file name (reversible escaping
    * by default, the reference's lossy "_"→"/" under `compatLossy`).
    */
  def readMessages(spark: SparkSession, dir: String,
      compatLossy: Boolean = false): DataFrame = {
    // the single glob is deliberate: Spark expands it itself, so
    // sanitized file names containing glob metacharacters (e.g. a
    // topic named "data[1]") are never re-globbed the way concrete
    // user-supplied paths would be, and a missing/typo'd snapshot dir
    // fails loudly instead of reading as an empty success. The benign
    // FileStreamSink metadata-probe WARN this path triggers is
    // silenced at the logger level by Logs.quietBenignWarns.
    val raw = spark.read
      .schema(Schemas.snapshotMessage)
      .option("multiLine", true)   // reference writes a JSON ARRAY per file
      .json(s"$dir/messages/*.json")
      .withColumn("_file", input_file_name())
    // input_file_name() returns a URI: fully url-decode the stem (so
    // non-ASCII and literal-% topics round-trip, not just spaces) —
    // protecting literal '+' first, which URL decoding would
    // otherwise turn into a space it never was
    val stem = url_decode(regexp_replace(
      regexp_extract(col("_file"), "([^/]+)\\.json$", 1), "\\+", "%2B"))
    val topic =
      if (compatLossy) codec.desanitizeTopicLossy(stem)
      else codec.desanitizeTopic(stem)
    // per-topic arrival order := position in the file. For the local
    // multiLine array source row order within one file is the array
    // order within one partition; stamp it while it is still true.
    val w = Window.partitionBy(col("_file")).orderBy(monotonically_increasing_id())
    raw
      .withColumn("topic", topic)
      .withColumn("seq", row_number().over(w).cast("long") - 1L)
      .withColumn("publish_ts", timestamp_millis(col("publish_timestamp")))
      .withColumn("event_ts", codec.eventTsOrNull(col("event_timestamp")))
      .select("topic", "content", "binary_encoded", "properties",
        "publish_ts", "event_ts", "partition_key", "seq")
  }

  /** Driver-side interchange shim: copy a snapshot written by the
    * REFERENCE tooling (file names like "persistent:__tenant_ns_topic
    * .json", which Hadoop Path cannot represent because of the colon)
    * into `destDir` under our reversible colon-free names, recovering
    * each topic with the reference's own lossy "_"→"/" rule first.
    * Local filesystem only — which is the only place the reference's
    * layout can exist anyway. Catalog text files copy verbatim.
    * After importing, read with `readMessages(spark, destDir)`
    * (compatLossy = false: the lossy recovery already happened here,
    * faithfully including the reference's underscore corruption). */
  def importReferenceSnapshot(srcDir: String, destDir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dst = Paths.get(destDir)
    Files.createDirectories(dst.resolve("messages"))
    Seq("tenants.txt", "namespaces.txt", "topics.txt", "all_topics.txt")
      .foreach { f =>
        val s = Paths.get(srcDir, f)
        if (Files.exists(s))
          Files.copy(s, dst.resolve(f), StandardCopyOption.REPLACE_EXISTING)
      }
    val msgs = Paths.get(srcDir, "messages")
    if (Files.exists(msgs)) {
      val stream = Files.list(msgs) // directory handle: must be closed
      try {
        val it = stream.iterator()
        while (it.hasNext) {
          val p = it.next()
          val name = p.getFileName.toString
          if (name.endsWith(".json")) {
            val stem = name.stripSuffix(".json")
            val topicLossy = stem.replace("_", "/") // the reference's rule
            val safe = codec.sanitizeTopicStr(topicLossy) + ".json"
            Files.copy(p, dst.resolve("messages").resolve(safe),
              StandardCopyOption.REPLACE_EXISTING)
          }
        }
      } finally stream.close()
    }
  }

  def readTenants(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(s"$dir/tenants.txt").select(col("value").as("tenant"))

  def readNamespaces(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(s"$dir/namespaces.txt")
      .select(
        split(col("value"), "/").getItem(0).as("tenant"),
        col("value").as("namespace"))

  def readTopics(spark: SparkSession, dir: String, all: Boolean = false): DataFrame =
    spark.read.text(s"$dir/${if (all) "all_topics" else "topics"}.txt")
      .select(col("value").as("topic"))

  /** Write the envelope frame back out in the engine's native layout:
    * parquet partitioned by topic, ordered by seq within each file —
    * scales to any number of topics, preserves replay order, and
    * prunes on topic at read time. */
  def writeNative(env: DataFrame, dir: String): Unit =
    env
      .repartition(col("topic"))
      .sortWithinPartitions(col("topic"), col("seq"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("topic")
      .parquet(s"$dir/messages_parquet")

  /** Write messages in the reference's interchange format: one JSON
    * ARRAY per topic, wire-format fields. collect_list is bounded by
    * the reference's own per-topic cap semantics (10k msgs/topic) —
    * this writer exists for compatibility, not for 100 TB paths. */
  def writeCompat(env: DataFrame, dir: String,
      compatLossy: Boolean = false): Unit = {
    val wire = struct(
      col("content"), col("binary_encoded"), col("properties"),
      coalesce(unix_millis(col("publish_ts")), lit(0L))
        .as("publish_timestamp"),
      codec.eventTsToWire(col("event_ts")).as("event_timestamp"),
      col("partition_key"))
    val fileName =
      if (compatLossy) codec.sanitizeTopicLossy(col("topic"))
      else codec.sanitizeTopic(col("topic"))
    val perTopic = env
      .repartition(col("topic"))
      .sortWithinPartitions(col("topic"), col("seq"))
      .select(fileName.as("file"), wire.as("msg"))
      .groupBy(col("file"))
      .agg(to_json(collect_list(col("msg"))).as("body"))
    // a SNAPSHOT is a replacement, not a merge: clear the destination
    // first, or per-topic files from a previous capture of different
    // data survive and resurrect dead topics on restore
    val destBase = new org.apache.hadoop.fs.Path(dir, "messages")
    destBase.getFileSystem(new org.apache.hadoop.conf.Configuration())
      .delete(destBase, true)
    // one file per topic, written from the executors (scales with the
    // number of topics; no driver collect). Hadoop FileSystem API so
    // the files land in `dir` on whatever filesystem backs it —
    // java.nio would scatter them across executor-local disks on a
    // real cluster.
    perTopic.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val base = new org.apache.hadoop.fs.Path(dir, "messages")
        val fs = base.getFileSystem(new org.apache.hadoop.conf.Configuration())
        fs.mkdirs(base)
        rows.foreach { r =>
          val p = new org.apache.hadoop.fs.Path(base, r.getString(0) + ".json")
          val out = fs.create(p, true)
          try out.write(r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
      }
    }
  }

  /** Catalog text files (K2): newline-joined PLAIN single files —
    * the reference's tooling opens `<dir>/tenants.txt` directly, so a
    * Spark output DIRECTORY of part-files would break the interchange
    * contract. The catalog is control-plane-tiny by definition (the
    * reference keeps it in text files), so collecting it to write one
    * real file is the correct move, same as DdlSink. Lines are sorted
    * for determinism. */
  def writeCatalog(tenants: DataFrame, namespaces: DataFrame,
      topics: DataFrame, allTopics: DataFrame, dir: String): Unit = {
    def writeLines(df: DataFrame, colName: String, file: String): Unit = {
      val lines = df.select(col(colName)).collect()
        .map(_.getString(0)).sorted
      val p = new org.apache.hadoop.fs.Path(dir, file)
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val out = fs.create(p, true)
      // zero lines → empty file: a lone "\n" would read back as one
      // empty-string catalog entry (restore would emit `CREATE tenant `
      // with an empty name)
      val body = if (lines.isEmpty) "" else lines.mkString("\n") + "\n"
      try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    writeLines(tenants, "tenant", "tenants.txt")
    writeLines(namespaces, "namespace", "namespaces.txt")
    writeLines(topics, "topic", "topics.txt")
    writeLines(allTopics, "topic", "all_topics.txt")
  }
}
