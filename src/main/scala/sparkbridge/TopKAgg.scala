// Hosted in an org.apache.spark.sql subpackage for the same reason as
// CosineSim.scala: the aggregate framework types it extends are
// private[sql]-adjacent, and this is the standard packaging for
// third-party Catalyst aggregates.
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded-heap top-k aggregate (§2.11): keeps only k
  * (score, id) entries per group in the aggregation buffer, so
  * partial (map-side) aggregation discards the long tail BEFORE the
  * shuffle — the shape that wins when k ≪ rows-per-group.
  *
  * This is the production form of graft.operators.TopK's typed
  * Aggregator: the buffer serializes as a flat 16-byte-per-entry
  * ByteBuffer (8-byte score + 8-byte id) instead of a Kryo blob of a
  * Scala PriorityQueue (the r2 verdict's remaining TopK cost — every
  * partial merge round-tripped Kryo). Deterministic: ties break on
  * the smaller id. Output: array<struct<score,id>> best-first.
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] with ExpectsInputTypes {
  require(k >= 1, "top_k needs k >= 1")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buffer: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    var i = 0
    while (i < other.size) {
      buffer.add(other.scores(i), other.ids(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKAgg.Heap): Any = {
    val out = buffer.sortedBestFirst
    new GenericArrayData(out.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKAgg.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new TopKAgg.Heap(k)
    var i = 0
    while (i < n) {
      h.add(bb.getDouble(), bb.getLong())
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Bounded binary min-heap on (score asc, id desc): the root is the
    * WORST survivor — evicted first when a better entry arrives.
    * Flat primitive arrays, no boxing. */
  final class Heap(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size: Int = 0

    // entry a is worse than entry b (lower score, tie: higher id).
    // Score comparison matches Spark's SQL double ordering exactly:
    // NaN greatest (a raw < would make every comparison against a NaN
    // root false and freeze the heap) AND -0.0 == 0.0 (a bare
    // Double.compare would treat them as distinct and break ties
    // differently from the window form).
    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = TopKAgg.cmpScore(sa, sb)
      c < 0 || (c == 0 && ia > ib)
    }

    def add(s: Double, i: Long): Unit =
      if (size < k) {
        var c = size
        scores(c) = s; ids(c) = i
        size += 1
        while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftDown(start: Int): Unit = {
      var c = start
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = 2 * c + 2
        var w = c // find the worst among c and children; it belongs on top
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == c) done = true
        else { swap(c, w); c = w }
      }
    }

    def sortedBestFirst: Array[(Double, Long)] = {
      val out = (0 until size).map(i => (scores(i), ids(i))).toArray
      // explicit comparator: score desc under Spark's SQL double
      // ordering (NaN greatest, -0.0 == 0.0), ties by id asc —
      // sortBy(-s) would flip NaN to the wrong end
      java.util.Arrays.sort(out, (a: (Double, Long), b: (Double, Long)) => {
        val c = TopKAgg.cmpScore(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      })
      out
    }
  }

  /** Spark SQL's total order on doubles: -0.0 == 0.0, NaN greatest,
    * NaN == NaN (the semantics of nan-safe comparison used by sorts
    * and windows — what the `top_k` ↔ window-form parity contract
    * requires). */
  def cmpScore(a: Double, b: Double): Int =
    if (a == b || (a.isNaN && b.isNaN)) 0
    else if (a.isNaN) 1
    else if (b.isNaN) -1
    else java.lang.Double.compare(a, b)
}
