package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Range-clustered parquet layout (SURVEY §7.5's "push down and
  * prune", applied at WRITE time) — the other half of the storage
  * story next to [[Bucketing]]'s hash co-location.
  *
  * `repartitionByRange` on the cluster keys + `sortWithinPartitions`
  * gives every output file a tight, non-overlapping min/max span on
  * those keys. Parquet stores those spans as row-group statistics, so
  * a later filtered scan (`key BETWEEN a AND b`) prunes whole files
  * without opening them — at 100 TB the difference between reading a
  * shard and reading the lake. This is the single-dimension form of
  * what Z-order/Hilbert clustering generalizes to many dimensions;
  * for one or two correlated keys (time, tenant) range clustering is
  * strictly better (perfect spans, no curve interleaving).
  *
  * The sampled range boundaries are Spark's own (reservoir sample per
  * partition — an explicit, documented planning statistic inside
  * repartitionByRange), so skewed keys still land in balanced files.
  */
object Layout {

  /** Write `df` range-clustered into `numFiles` parquet files ordered
    * by `keys`. One shuffle (the range exchange); the per-file sort
    * feeds parquet's min/max stats. */
  def clusteredWrite(df: DataFrame, path: String, numFiles: Int,
      keys: Column*): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Per-file [min, max] spans of `key` for a parquet directory
    * written by [[clusteredWrite]] — the audit view proving the
    * clustering property (LayoutSpec asserts spans don't overlap).
    * Reads only the key column + the file name, not the data. */
  def fileSpans(spark: org.apache.spark.sql.SparkSession, path: String,
      key: String): DataFrame =
    spark.read.parquet(path)
      .select(col(key), input_file_name().as("file"))
      .groupBy(col("file"))
      .agg(min(col(key)).as("lo"), max(col(key)).as("hi"),
        count(lit(1)).as("n"))
}
