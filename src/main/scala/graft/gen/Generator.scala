package graft.gen

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic synthetic `emailSend` generator (SURVEY §2.1 S8;
  * reference pulsar_remote_inspector.py:208-256).
  *
  * The reference draws UUIDs and random choices per message; for
  * oracle-parity every "random" value here is a deterministic function
  * of the row id (md5 stand-ins for UUIDs, LCG steps for choices) —
  * same spirit, reproducible everywhere. Shared by the batch query
  * (q34) and the streaming publish pipeline, so the generation logic
  * is defined once.
  */
object Generator {

  /** LCG choice step, overflow-free: (id·a + c) mod m computed with
    * id reduced mod m FIRST — identical value for every id (modular
    * arithmetic), but `id * a` on the raw id overflows Long at
    * id ≈ 8.4e9, which under ANSI mode would kill an unbounded rate
    * stream after a few hours of publishing. */
  private def lcgMod(id: Column, a: Long, c: Long, m: Long): Column =
    ((id % m) * (a % m) + c % m) % m

  /** Flat projection of the generator fields from (id, ts). */
  def emailSendColumns(id: Column, ts: Column): Seq[Column] = Seq(
    id.as("id"),
    md5(concat(lit("evt-"), id.cast("string"))).as("event_id"),
    md5(concat(lit("corr-"), id.cast("string"))).as("correlation_id"),
    (lit(100) + lcgMod(id, 1103515245L, 12345L, 7L)).as("project_id"),
    concat(lit("user+"), lcgMod(id, 69069L, 1L, 1000L).cast("string"),
      lit("@example.com")).as("user_key"),
    (lit(7000) + lcgMod(id, 40014L, 3L, 25L)).as("campaign_id"),
    (lit(5000) + lcgMod(id, 48271L, 7L, 10L)).as("template_id"),
    // the reference's three distinct timestamp string formats
    // (pulsar_remote_inspector.py:218,228,234)
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("created_at"),
    date_format(ts, "yyyy-MM-dd HH:mm:ss.SSS'Z'").as("ingest_start_time"),
    date_format(ts, "yyyy-MM-dd HH:mm:ss +00:00").as("es_created_at"))

  /** The full 5-level nested envelope (graft.model.Schemas.emailSend
    * shape; pulsar_remote_inspector.py:208-256), as one struct. */
  def emailSendEnvelope(id: Column, ts: Column): Column = {
    val m = Seq(
      "id", "event_id", "correlation_id", "project_id", "user_key",
      "campaign_id", "template_id", "created_at", "ingest_start_time",
      "es_created_at").zip(emailSendColumns(id, ts)).toMap
    struct(
      m("event_id").as("eventId"),
      m("correlation_id").as("correlationId"),
      m("created_at").as("createdAt"),
      lit(1).as("payloadVersion"),
      lit("emailSend").as("payloadType"),
      struct(
        m("project_id").cast("int").as("projectId"),
        m("user_key").as("userKey"),
        lit("email").as("docType"),
        struct(
          struct(
            m("ingest_start_time").as("ingestStartTime"),
            m("created_at").as("processingTime"),
            m("created_at").as("emitTime")).as("telemetry"),
          struct(
            md5(concat(lit("doc-"), id.cast("string"))).as("documentId"),
            md5(concat(lit("raw-"), id.cast("string"))).as("rawDocumentId"),
            m("es_created_at").as("createdAt"),
            m("es_created_at").as("updatedAt")).as("esContext"),
          struct(lit("send").as("action")).as("source")).as("metadata"),
        struct(
          map(lit("k"), id.cast("string")).as("data"),
          struct(
            m("template_id").cast("int").as("templateId"),
            m("campaign_id").cast("int").as("campaignId"),
            m("user_key").as("email"),
            md5(concat(lit("msg-"), id.cast("string"))).as("messageId"),
            m("created_at").as("createdAt"),
            struct(
              m("es_created_at").as("documentCreatedAt"),
              m("es_created_at").as("documentUpdatedAt")).as("itblInternal"))
            .as("diff")).as("data")).as("payload"))
  }

  /** The envelope serialized as the wire JSON string. */
  def emailSendJson(id: Column, ts: Column): Column =
    to_json(emailSendEnvelope(id, ts))

  /** F1: project-ID auto-detection from a topic name — the publish
    * flow's unanchored search for "(?:post-)?ingestion-<digits>"
    * anywhere in the topic (pulsar_remote_inspector.py:188-195).
    * No match → null (Spark's regexp_extract returns an empty string
    * there; the reference returns None). The publish flow then falls
    * back to project 1 (`:270-275`) — that default is the caller's
    * policy, kept out of the extractor itself. */
  def projectIdFromTopic(topic: Column): Column =
    nullif(
      regexp_extract(topic, "(?:post-)?ingestion-(\\d+)", 1), lit(""))
      .cast("int")

  /** Campaign-range derivation (generate_campaign_range,
    * pulsar_remote_inspector.py:197-199): [start, start+count) as an
    * array column. count ≤ 0 → empty, like Python's range — an
    * unguarded sequence(start, start-1) would DESCEND and invent two
    * campaigns that don't exist. */
  def campaignRange(start: Column, count: Column): Column =
    when(count > 0, sequence(start, start + count - lit(1)))
      .otherwise(filter(sequence(start, start), _ => lit(false)))

  /** The generator's built-in ID ranges, printed by the `ranges` CLI
    * verb (pulsar_remote_inspector.py:701-706). Derived from the LCG
    * fields above so the CLI and the generator can never disagree. */
  val campaignIdRange: Range = 7000 until 7025
  val templateIdRange: Range = 5000 until 5010
  val userKeyPattern: String = "user+<0..999>@example.com"
}
