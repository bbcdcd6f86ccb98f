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

  /** INCREMENTAL form of [[clusteredWrite]]: append `df` as one new
    * SEGMENT of an existing clustered store — a fresh
    * `seg=<segmentId>` subdirectory, itself range-clustered and
    * sorted on `keys`. At 100 TB a store cannot be rewritten per
    * ingest batch; the lakehouse answer is segment-local clustering:
    * every segment keeps tight non-overlapping per-file spans, so a
    * key/bucket predicate prunes files WITHIN each segment and the
    * scan cost is (matching files) × (number of segments), not the
    * corpus. Readers see one table: `spark.read.parquet(root)`
    * partition-discovers `seg` as a column (drop it or keep it for
    * audit). Many small segments eventually dilute pruning — the
    * documented maintenance move is a periodic compaction
    * ([[clusteredWrite]] of the union back to one segment), exactly
    * the OPTIMIZE/compact cycle every log-structured store runs. */
  def clusteredAppend(df: DataFrame, root: String, segmentId: String,
      numFiles: Int, keys: Column*): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    require(segmentId.nonEmpty && !segmentId.exists(c => c == '/' || c == '='),
      s"segmentId must be a plain directory token: $segmentId")
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode(SaveMode.ErrorIfExists)
      .parquet(s"$root/seg=$segmentId")
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

  /** Morton (Z-order) address of two dimensions: interleaves the low
    * `bits` bits of `a` (odd positions) and `b` (even positions) into
    * one long, so rows close in BOTH dimensions are close on the
    * curve. Pure shift/and/or Column arithmetic — codegen'd, no UDF.
    * Inputs must be non-negative and < 2^bits; out-of-range inputs
    * only degrade clustering locality (the write stays correct —
    * layout is a performance property, never a correctness one). */
  def zAddress(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    // force LONG shift semantics: on IntegerType inputs Spark's
    // shiftleft/shiftright wrap the distance mod 32, which scrambles
    // the interleave for bit positions 2*i+1 >= 32 (i.e. bits > ~15)
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** Write `df` Z-order-clustered on two dimensions: range-partition +
    * sort on the Morton address, so every output file covers a small
    * contiguous curve segment — a bounded box in BOTH dimensions.
    * Parquet min/max stats on each ORIGINAL column then prune files
    * for predicates on either dimension (or both), which single-key
    * range clustering ([[clusteredWrite]]) can only do for its one
    * key. The multi-tenant × time scan is the canonical use. Same
    * single-shuffle cost as clusteredWrite; the address column is
    * dropped before writing. */
  def zorderWrite(df: DataFrame, path: String, numFiles: Int, bits: Int,
      dimA: Column, dimB: Column): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.withColumn("_zaddr", zAddress(dimA, dimB, bits))
      .repartitionByRange(numFiles, col("_zaddr"))
      .sortWithinPartitions(col("_zaddr"))
      .drop("_zaddr")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
