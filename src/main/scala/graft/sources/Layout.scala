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
    StoreLease.withLease(df.sparkSession, path, "clustered-write") {
      df.repartitionByRange(numFiles, keys: _*)
        .sortWithinPartitions(keys: _*)
        .write.mode(SaveMode.Overwrite).parquet(path)
    }
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
    // writer lease on the store root: two ingest pipelines appending
    // concurrently fail loudly instead of interleaving segments (the
    // ErrorIfExists clobber guard below only catches SAME-named ones)
    StoreLease.withLease(df.sparkSession, root, s"append-$segmentId") {
      df.repartitionByRange(numFiles, keys: _*)
        .sortWithinPartitions(keys: _*)
        .write.mode(SaveMode.ErrorIfExists)
        .parquet(s"$root/seg=$segmentId")
    }
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

  /** Segment ids present under a [[clusteredAppend]] store root —
    * driver-side directory listing, metadata-only. */
  def segments(spark: org.apache.spark.sql.SparkSession,
      root: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val entries = fs.listStatus(p).toSeq
      // both append conventions surface: `seg=<id>` subdirectories
      // (clusteredAppend — partition-discovered) and flat
      // `seg-<tag>-part-*` files (the tagged exactly-once appends of
      // the growing stores, Dedup.taggedSegmentAppend)
      (entries.filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("seg="))
        .map(_.stripPrefix("seg=")) ++
        entries.filter(_.isFile)
          .map(_.getPath.getName)
          .filter(n => n.startsWith("seg-") && n.contains("-part-"))
          // "-part-" cannot occur inside a tag — rejected at
          // Dedup.taggedSegmentAppend — so the split is exact
          .map(_.stripPrefix("seg-").split("-part-")(0))).distinct
    }
  }

  /** MEASURED pruning dilution of a clustered store: the mean number
    * of files a point lookup on `key` must read, estimated at each
    * file's span midpoint. A freshly [[clusteredWrite]]-compacted
    * store has disjoint spans → dilution ≈ 1.0; every appended
    * segment ([[clusteredAppend]]) overlays another full key range,
    * so N live segments ≈ N files per probe — this number IS the
    * "many small segments dilute pruning" hazard, quantified. The
    * estimate is driver-side over per-file span statistics (one row
    * per FILE — metadata-scale, bounded like the planning lookups;
    * production would read the same min/max straight from parquet
    * footers / table-format manifests). Null-keyed files are ignored
    * (they never match a point predicate). */
  def pruningDilution(spark: org.apache.spark.sql.SparkSession,
      root: String, key: String): Double = {
    val spans = fileSpans(spark, root, key)
      .filter(col("lo").isNotNull)
      .select(col("lo").cast("double"), col("hi").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    require(spans.nonEmpty, s"no non-null-keyed parquet files under $root")
    val mids = spans.map { case (lo, hi) => (lo + hi) / 2.0 }
    mids.map(m => spans.count { case (lo, hi) => lo <= m && m <= hi })
      .sum.toDouble / mids.length
  }

  /** The compaction TRIGGER: true when measured [[pruningDilution]]
    * exceeds `maxDilution`. The default budget of 2.0 tolerates one
    * in-flight ingest segment over a compacted base (the steady state
    * of an append-mostly store) and fires once further segments start
    * multiplying probe IO — at which point [[compact]] restores
    * dilution ≈ 1. */
  def needsCompaction(spark: org.apache.spark.sql.SparkSession,
      root: String, key: String, maxDilution: Double = 2.0): Boolean =
    pruningDilution(spark, root, key) > maxDilution

  /** The documented maintenance move, executed: rewrite the union of
    * all segments as ONE globally range-clustered segment (the
    * OPTIMIZE/compact cycle of every log-structured store). Writes to
    * a `.compacting` sibling first and swaps directories after — a
    * crash leaves either the old store intact or a stale sibling to
    * clean up, never a half-written store. The swap itself is two FS
    * operations, not one atomic commit: a production deployment gets
    * atomicity from its table format's commit protocol, which is
    * exactly the seam this path would plug into. The result is again
    * a segmented store (single segment `compacted`), so
    * [[clusteredAppend]] ingest continues unchanged afterwards. */
  def compact(spark: org.apache.spark.sql.SparkSession, root: String,
      numFiles: Int, keys: Column*): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    // hold the store's writer lease across read + swap: an ingest
    // appending mid-compaction would land a segment the rewrite
    // never read, silently dropped by the swap. The lease is a
    // SIBLING file, so it survives the delete+rename and releases
    // normally.
    StoreLease.withLease(spark, root, "compact") {
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val tmpPath = new org.apache.hadoop.fs.Path(root + ".compacting")
      val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(tmpPath, true) // a stale sibling from a crashed run
      val df = spark.read.parquet(root).drop("seg")
      clusteredAppend(df, tmpPath.toString, "compacted", numFiles, keys: _*)
      require(fs.delete(rootPath, true), s"could not remove old store $root")
      require(fs.rename(tmpPath, rootPath),
        s"could not move compacted store into place at $root")
    }
  }

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
    StoreLease.withLease(df.sparkSession, path, "zorder-write") {
      df.withColumn("_zaddr", zAddress(dimA, dimB, bits))
        .repartitionByRange(numFiles, col("_zaddr"))
        .sortWithinPartitions(col("_zaddr"))
        .drop("_zaddr")
        .write.mode(SaveMode.Overwrite).parquet(path)
    }
  }
}
