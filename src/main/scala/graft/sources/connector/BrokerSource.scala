package graft.sources.connector

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a REAL Spark connector: a DataSource V2 batch source over a
  * message broker (SURVEY §2.1; the reference's consumer loop,
  * pulsar_backup_restore.py:100-117). The connector machinery —
  * `TableProvider` → `Table` → `Scan` → one `InputPartition` PER
  * TOPIC → `PartitionReader` emitting rows in per-topic seq order —
  * is exactly the integration surface a production Pulsar reader
  * implements; on a cluster each topic's reader runs in its own task,
  * so ingestion parallelism is the topic count, and the per-topic
  * order contract (T6) holds because one reader owns one topic.
  *
  * The TRANSPORT is the injected seam, as everywhere in this
  * zero-egress build: [[BrokerRegistry]] is an in-process stand-in
  * the tests publish into; a production build replaces the registry
  * calls inside [[BrokerPartitionReader]] with a subscriber client
  * and touches nothing else.
  *
  * Usage: `spark.read.format("graft.sources.connector.BrokerSource")
  * .load()` → (topic string, seq long, payload binary). Options
  * (SURVEY §4.2 topic scoping — pushdown into PARTITION PLANNING, so
  * a capture of one namespace out of thousands never plans, fetches,
  * or post-filters the others):
  *  - `topics`: comma-separated explicit topic list
  *  - `topicsPattern`: whole-name regex (the Pulsar consumer's
  *    pattern-subscribe semantics); both given → intersection
  */
class BrokerSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BrokerSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new BrokerTable
}

object BrokerSource {
  val schema: StructType = new StructType()
    .add("topic", StringType, nullable = false)
    .add("seq", LongType, nullable = false)
    .add("payload", BinaryType, nullable = false)
}

/** The injected in-process broker: per-topic append-ordered logs.
  * One concurrency mechanism — every access holds the object lock
  * (the map is read-modify-written on publish, so a lock-free map
  * alone would not protect it anyway). */
object BrokerRegistry {
  private val log = scala.collection.mutable.Map.empty[String, Vector[Array[Byte]]]

  def publish(topic: String, payload: Array[Byte]): Unit = synchronized {
    log.put(topic, log.getOrElse(topic, Vector.empty) :+ payload)
  }

  def topics: Seq[String] = synchronized(log.keys.toSeq.sorted)

  def fetch(topic: String): Vector[Array[Byte]] =
    synchronized(log.getOrElse(topic, Vector.empty))

  def clear(): Unit = synchronized(log.clear())
}

/** Topic scoping parsed from the read options; admits(t) decides at
  * PLANNING time which topics get partitions at all. */
private[connector] case class TopicSelector(
    explicit: Option[Set[String]],
    pattern: Option[java.util.regex.Pattern]) {
  def admits(t: String): Boolean =
    explicit.forall(_.contains(t)) &&
      pattern.forall(_.matcher(t).matches())
}

private[connector] object TopicSelector {
  def fromOptions(options: CaseInsensitiveStringMap): TopicSelector =
    TopicSelector(
      Option(options.get("topics")).map(
        _.split(",").map(_.trim).filter(_.nonEmpty).toSet),
      Option(options.get("topicsPattern"))
        .map(java.util.regex.Pattern.compile))
}

private class BrokerTable extends Table with SupportsRead {
  override def name(): String = "graft_broker"
  override def schema(): StructType = BrokerSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val selector = TopicSelector.fromOptions(options)
    new ScanBuilder {
      override def build(): Scan = new BrokerScan(selector)
    }
  }
}

private class BrokerScan(selector: TopicSelector) extends Scan with Batch {
  override def readSchema(): StructType = BrokerSource.schema
  override def toBatch: Batch = this
  // one partition per ADMITTED topic: ingestion parallelism = topic
  // count, per-topic order is free because one reader owns one topic,
  // and out-of-scope topics are never planned at all
  override def planInputPartitions(): Array[InputPartition] =
    BrokerRegistry.topics
      .filter(selector.admits)
      .map(t => BrokerRangePartition(t, 0L, BrokerRegistry.fetch(t).length)
        : InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    BrokerReaderFactory
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BrokerMicroBatchStream(selector)
}

/** The streaming form (T1/T3): per-topic log lengths ARE the offsets
  * — each micro-batch reads every topic's [start, end) delta, one
  * partition per advanced topic, so exactly-once recovery falls out
  * of the offset log like any production broker connector. */
private class BrokerMicroBatchStream(selector: TopicSelector)
    extends MicroBatchStream {
  private def snapshot(): BrokerOffset = BrokerOffset(
    BrokerRegistry.topics
      .filter(selector.admits)
      .map(t => t -> BrokerRegistry.fetch(t).length.toLong).toMap)
  override def initialOffset(): Offset = BrokerOffset(Map.empty)
  override def latestOffset(): Offset = snapshot()
  override def deserializeOffset(json: String): Offset =
    BrokerOffset.fromJson(json)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BrokerOffset].lens
    val e = end.asInstanceOf[BrokerOffset].lens
    e.toSeq.sortBy(_._1).flatMap { case (t, until) =>
      val from = s.getOrElse(t, 0L)
      if (until > from) Some(BrokerRangePartition(t, from, until): InputPartition)
      else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    BrokerReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offsets serialized on ONE line: Spark's OffsetSeqLog writes one
  * offset json per line per source, so an embedded newline would
  * corrupt the checkpoint and break restart. Topic names are base64-
  * encoded so no topic character can collide with the separators:
  * "<len>:<base64(topic)>" joined by ",". */
private case class BrokerOffset(lens: Map[String, Long]) extends Offset {
  override def json(): String =
    lens.toSeq.sortBy(_._1).map { case (t, n) =>
      s"$n:" + java.util.Base64.getEncoder
        .encodeToString(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }.mkString(",")
}

private object BrokerOffset {
  def fromJson(s: String): BrokerOffset = BrokerOffset(
    s.split(",").iterator.filter(_.nonEmpty).map { entry =>
      val sp = entry.indexOf(':')
      require(sp > 0, s"malformed broker offset entry: $entry")
      val topic = new String(
        java.util.Base64.getDecoder.decode(entry.substring(sp + 1)),
        java.nio.charset.StandardCharsets.UTF_8)
      topic -> entry.substring(0, sp).toLong
    }.toMap)
}

private case class BrokerRangePartition(topic: String, from: Long,
    until: Long) extends InputPartition

private object BrokerReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val bp = p.asInstanceOf[BrokerRangePartition]
    new BrokerPartitionReader(bp.topic, bp.from, bp.until)
  }
}

/** One task's reader: drains one topic's [from, until) slice in
  * publish (seq) order. A production implementation replaces the
  * registry fetch with a subscriber client; the row contract is
  * unchanged. */
private class BrokerPartitionReader(topic: String, from: Long, until: Long)
    extends PartitionReader[InternalRow] {
  private val msgs = BrokerRegistry.fetch(topic)
    .slice(from.toInt, until.toInt)
  // the in-process registry only exists in the planning JVM: on a
  // non-local master an executor-side fetch would silently return
  // empty and the scan would "succeed" with missing data — fail
  // loudly instead (a production subscriber client replaces this)
  require(msgs.length == (until - from).toInt,
    s"broker registry for '$topic' holds ${msgs.length} of the " +
      s"planned [$from,$until) slice — reader is running in a JVM " +
      "without the in-process registry (non-local master?)")
  private var i = -1
  override def next(): Boolean = { i += 1; i < msgs.length }
  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(topic), from + i, msgs(i))
  override def close(): Unit = ()
}
