package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2.11: typed bounded-heap top-k accumulator.
  *
  * The window-function form ([[Relational.topKPerGroup]]) shuffles
  * every row to its group's partition and sorts; this Aggregator keeps
  * only k (score, id) entries per group in the aggregation buffer, so
  * partial (map-side) aggregation discards the long tail before the
  * shuffle — the shape that wins when k ≪ rows-per-group, e.g. top-10
  * per key over 100 TB. Deterministic: ties break on the smaller id.
  */
object TopK {

  /** min-heap entry ordering: worst (lowest score, then HIGHEST id)
    * first. Explicit comparator, for two reasons a tuple Ordering.by
    * gets wrong: scores compare under Spark's SQL double order
    * (-0.0 == 0.0, NaN greatest — scala's TotalOrdering splits ±0.0),
    * and a `-id` negation would corrupt Long.MinValue. */
  private val entryOrd: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(x: (Double, Long), y: (Double, Long)): Int = {
        val c = org.apache.spark.sql.graft.TopKAgg.cmpScore(x._1, y._1)
        if (c != 0) c else java.lang.Long.compare(y._2, x._2)
      }
    }

  final class TopKAggregator(k: Int)
      extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)],
        Seq[(Double, Long)]] {

    // PriorityQueue dequeues the MAX under the ordering, so reverse:
    // head = worst survivor
    override def zero: mutable.PriorityQueue[(Double, Long)] =
      mutable.PriorityQueue.empty(entryOrd.reverse)

    override def reduce(
        b: mutable.PriorityQueue[(Double, Long)],
        a: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
      b.enqueue(a)
      while (b.size > k) b.dequeue()
      b
    }

    override def merge(
        b1: mutable.PriorityQueue[(Double, Long)],
        b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
      b2.foreach(b1.enqueue(_))
      while (b1.size > k) b1.dequeue()
      b1
    }

    override def finish(b: mutable.PriorityQueue[(Double, Long)]): Seq[(Double, Long)] =
      b.toSeq.sorted(entryOrd.reverse) // best first

    override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
      Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Top-k (score, id) per group over a typed Dataset of
    * (group, score, id). Output: (group, ranked entries best-first). */
  def topKPerKey(ds: Dataset[(String, Double, Long)], k: Int): Dataset[(String, Seq[(Double, Long)])] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapValues { case (_, s, id) => (s, id) }
      .agg(new TopKAggregator(k).toColumn.name("top"))
  }

  /** The production form: a native TypedImperativeAggregate whose
    * buffer serializes as a flat primitive ByteBuffer instead of a
    * Kryo blob (see org.apache.spark.sql.graft.TopKAgg). Usable as a
    * Column in any groupBy().agg(), and as SQL `top_k(score, id, k)`
    * via GraftExtensions. Output: array<struct<score,id>> best-first. */
  def topKFast(score: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.{Bridge, TopKAgg}
    Bridge.column(TopKAgg(
      Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())
  }
}
