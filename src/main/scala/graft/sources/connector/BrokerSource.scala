package graft.sources.connector

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
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
  * .load()` → (topic string, seq long, payload binary).
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

/** The injected in-process broker: per-topic append-ordered logs. */
object BrokerRegistry {
  private val log = TrieMap.empty[String, Vector[Array[Byte]]]

  def publish(topic: String, payload: Array[Byte]): Unit = synchronized {
    log.put(topic, log.getOrElse(topic, Vector.empty) :+ payload)
  }

  def topics: Seq[String] = log.keys.toSeq.sorted

  def fetch(topic: String): Vector[Array[Byte]] =
    log.getOrElse(topic, Vector.empty)

  def clear(): Unit = synchronized(log.clear())
}

private class BrokerTable extends Table with SupportsRead {
  override def name(): String = "graft_broker"
  override def schema(): StructType = BrokerSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new BrokerScan
    }
}

private class BrokerScan extends Scan with Batch {
  override def readSchema(): StructType = BrokerSource.schema
  override def toBatch: Batch = this
  // one partition per topic: ingestion parallelism = topic count,
  // and per-topic order is free because one reader owns one topic
  override def planInputPartitions(): Array[InputPartition] =
    BrokerRegistry.topics.map(t => BrokerTopicPartition(t): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new BrokerPartitionReader(p.asInstanceOf[BrokerTopicPartition].topic)
    }
}

private case class BrokerTopicPartition(topic: String) extends InputPartition

/** One task's reader: drains one topic in publish (seq) order. A
  * production implementation replaces the registry fetch with a
  * subscriber client; the row contract is unchanged. */
private class BrokerPartitionReader(topic: String)
    extends PartitionReader[InternalRow] {
  private val msgs = BrokerRegistry.fetch(topic)
  private var i = -1
  override def next(): Boolean = { i += 1; i < msgs.length }
  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(topic), i.toLong, msgs(i))
  override def close(): Unit = ()
}
