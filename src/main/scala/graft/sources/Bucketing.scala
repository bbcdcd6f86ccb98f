package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed, co-located table support (SURVEY §7.5: "co-locate joins
  * via bucketing") — the storage-layout half of the 100 TB join story.
  *
  * Two fact tables bucketed (and sorted) on the same join key with the
  * same bucket count join with ZERO Exchange: every task merge-joins
  * bucket i of both sides where they already sit. At 100 TB that turns
  * the recurring fact-fact shuffle (the single largest cost in a
  * pipeline that joins the same keys every run) into a one-time write
  * layout decision — exactly what a lineitem⋈orders-shaped workload
  * wants when it runs daily.
  *
  * Spark only honors bucketing through the catalog, so these are
  * saveAsTable tables in the session warehouse; BucketingSpec asserts
  * the no-Exchange plan property.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table. Sorting by the
    * bucket key additionally removes the per-task Sort from
    * SortMergeJoin reads.
    *
    * The table is dropped first and a STALE warehouse location from a
    * previous session is deleted: a fresh session's catalog does not
    * know the old table, so Overwrite alone fails with
    * LOCATION_ALREADY_EXISTS on the orphaned directory. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys — the plan
    * this produces is the point: no Exchange on either side. */
  def cotableJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
