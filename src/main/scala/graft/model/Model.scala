package graft.model

import org.apache.spark.sql.types._

/** Core row types of the engine (SURVEY.md §1).
  *
  * The message envelope is the fixed frame every message flows in;
  * open-schema bodies stay as a JSON string column (`content`) and are
  * projected on demand with `from_json`/`get_json_object` — we never
  * infer schemas per-batch (nondeterministic at 100 TB).
  *
  * Derived from the reference capture record
  * (pulsar_backup_restore.py:126-133) plus a `topic` and a `seq`
  * column: `seq` is the per-topic arrival position, the ordering
  * contract replay must preserve across shuffles (SURVEY §7.5.1).
  */
final case class MessageEnvelope(
    topic: String,
    content: String,
    binary_encoded: Boolean,
    properties: Map[String, String],
    publish_timestamp: java.sql.Timestamp,
    event_timestamp: Option[java.sql.Timestamp],
    partition_key: Option[String],
    seq: Long)

/** Catalog hierarchy (tenant → namespace → topic), each level a plain
  * DataFrame so membership tests and expansions are ordinary
  * (broadcast) joins rather than nested loops. */
final case class Tenant(tenant: String)
final case class Namespace(tenant: String, namespace: String)
final case class Topic(
    namespace: String,
    topic: String,
    partitioned: Boolean,
    is_system: Boolean)

object Schemas {
  /** Wire-format message element as written by the reference snapshot
    * (README.md:64-75): timestamps still epoch millis, 0 = unset. */
  val snapshotMessage: StructType = StructType(Seq(
    StructField("content", StringType),
    StructField("binary_encoded", BooleanType),
    StructField("properties", MapType(StringType, StringType)),
    StructField("publish_timestamp", LongType),
    StructField("event_timestamp", LongType),
    StructField("partition_key", StringType)))

  val envelope: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("content", StringType),
    StructField("binary_encoded", BooleanType, nullable = false),
    StructField("properties", MapType(StringType, StringType)),
    StructField("publish_timestamp", TimestampType),
    StructField("event_timestamp", TimestampType),
    StructField("partition_key", StringType),
    StructField("seq", LongType, nullable = false)))

  /** Nested synthetic `emailSend` body
    * (pulsar_remote_inspector.py:208-256): 5 levels, mixed timestamp
    * string formats — pinned here so `from_json` is deterministic. */
  val emailSend: StructType = {
    val telemetry = StructType(Seq(
      StructField("ingestStartTime", StringType),
      StructField("processingTime", StringType),
      StructField("emitTime", StringType)))
    val esContext = StructType(Seq(
      StructField("documentId", StringType),
      StructField("rawDocumentId", StringType),
      StructField("createdAt", StringType),
      StructField("updatedAt", StringType)))
    val metadata = StructType(Seq(
      StructField("telemetry", telemetry),
      StructField("esContext", esContext),
      StructField("source", StructType(Seq(StructField("action", StringType))))))
    val itblInternal = StructType(Seq(
      StructField("documentCreatedAt", StringType),
      StructField("documentUpdatedAt", StringType)))
    val diff = StructType(Seq(
      StructField("templateId", IntegerType),
      StructField("campaignId", IntegerType),
      StructField("email", StringType),
      StructField("messageId", StringType),
      StructField("createdAt", StringType),
      StructField("itblInternal", itblInternal)))
    val data = StructType(Seq(
      StructField("data", MapType(StringType, StringType)),
      StructField("diff", diff)))
    val payload = StructType(Seq(
      StructField("projectId", IntegerType),
      StructField("userKey", StringType),
      StructField("docType", StringType),
      StructField("metadata", metadata),
      StructField("data", data)))
    StructType(Seq(
      StructField("eventId", StringType),
      StructField("correlationId", StringType),
      StructField("createdAt", StringType),
      StructField("payloadVersion", IntegerType),
      StructField("payloadType", StringType),
      StructField("payload", payload)))
  }
}
