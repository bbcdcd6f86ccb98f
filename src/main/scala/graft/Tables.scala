package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central fixture-table loader (TESTDATA.md).
  *
  * All driver fixtures are plain parquet; the one wrinkle is
  * `events.parquet`, whose `ts` column is physical INT64
  * TIMESTAMP(NANOS) — Spark 4.x refuses that type unless
  * `spark.sql.legacy.parquet.nanosAsLong` is set, in which case it
  * surfaces as a raw nanosecond LongType. We convert it to a proper
  * micro-precision TimestampType with integer division (`div 1000`,
  * exact on Long — a double division would lose precision above
  * 2^53), which matches DuckDB's own nanos→micros truncation, so
  * oracle comparisons agree.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        spark.read.parquet(s"$sfDir/$other.parquet")
    }

  /** Registers every fixture as a temp view (`lineitem`, `events`, …)
    * so flows can also be expressed via `spark.sql`. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
