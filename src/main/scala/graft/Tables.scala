package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central fixture-table loader (TESTDATA.md).
  *
  * All driver fixtures are plain parquet; the one wrinkle is
  * `events.parquet`, whose `ts` physical type has CHANGED across
  * driver fixture generations: rounds 1–8 shipped INT64
  * TIMESTAMP(NANOS) (readable only via
  * `spark.sql.legacy.parquet.nanosAsLong`, surfacing as raw
  * nanosecond LongType), round 9 ships a plain `timestamp[us]`
  * without UTC adjustment (surfacing as TIMESTAMP_NTZ). One
  * schema-adaptive conversion ([[eventsTsToMicros]]) keeps every
  * consumer — batch loader, streaming source, the q56 ms-truncated
  * variant — on a single definition that lands on the same
  * micro-precision TimestampType either way, so query code and the
  * DuckDB oracle agree regardless of which generation is on disk.
  */
object Tables {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

  /** Raw events `ts` → micro-precision TimestampType, by physical
    * type. Legacy INT64 nanos uses integer division (`div 1000`,
    * exact on Long — a double division would lose precision above
    * 2^53), matching DuckDB's nanos→micros truncation; NTZ casts to
    * session-zone timestamps (identity on the stored micros under
    * the UTC session this engine pins). Loud on anything else: a
    * silent passthrough of a future third type would skew every
    * event-time query at once. */
  def eventsTsToMicros(raw: DataType): Column = raw match {
    case LongType         => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType => col("ts").cast(TimestampType)
    case TimestampType    => col("ts")
    case other => sys.error(
      s"events.ts: unsupported physical type $other — " +
        "extend Tables.eventsTsToMicros for this fixture generation")
  }

  /** Millisecond-truncated twin (q56's session windows truncate to
    * ms so gap arithmetic mirrors exactly in the ms-precision
    * oracle). Both branches use FLOOR-division semantics:
    * `unix_millis` floors micros→millis (Math.floorDiv inside), and
    * the legacy-nanos branch floors explicitly — SQL `div` truncates
    * toward zero, which would disagree with the timestamp branches
    * (and the oracle) by 1 ms on every pre-epoch timestamp. */
  def eventsTsToMillis(raw: DataType): Column = raw match {
    case LongType => timestamp_millis(
      when(col("ts") >= 0, expr("ts div 1000000"))
        .otherwise(expr("(ts - 999999) div 1000000")))
    case TimestampNTZType | TimestampType =>
      timestamp_millis(unix_millis(col("ts").cast(TimestampType)))
    case other => sys.error(
      s"events.ts: unsupported physical type $other — " +
        "extend Tables.eventsTsToMillis for this fixture generation")
  }
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The RAW physical type of events.ts for whatever fixture
    * generation is on disk — the ONE probe the batch loader, the
    * streaming sources, and the specs all share (it sets the legacy
    * nanos reader conf first: the old generation cannot even expose
    * a schema without it). */
  def eventsRawTsType(spark: SparkSession, sfDir: String): DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // one read: probe the raw type on the SAME resolved frame
        // (eventsRawTsType exists for callers that need only the
        // type; going through it here would resolve the parquet
        // footer twice on the hottest Tables path)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        raw.withColumn("ts", eventsTsToMicros(raw.schema("ts").dataType))
      case other =>
        spark.read.parquet(s"$sfDir/$other.parquet")
    }

  /** Registers every fixture as a temp view (`lineitem`, `events`, …)
    * so flows can also be expressed via `spark.sql`. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
