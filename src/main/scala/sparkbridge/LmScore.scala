// Hosted in an org.apache.spark.sql subpackage because the expression
// framework types it needs are private[sql] — see CosineSim.scala.
package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Plan-time bigram LM model: real hash maps + smoothing constants,
  * built driver-side from bounded aggregate rows and shipped to
  * executors ONCE via `sparkContext.broadcast` (the expression holds
  * only the broadcast stub — see [[BigramNllSum]]). Why not a
  * broadcast MapType column: Catalyst's `element_at` on a map is a
  * LINEAR scan of the key array — at a ~10³-entry bigram map probed
  * twice per token it dominated q112's scoring pass (measured ~25
  * CPU-seconds at sf0.1); a HashMap probe is O(1). */
final class BigramLm(
    val uni: java.util.HashMap[String, Long],
    val bi: java.util.HashMap[String, Long],
    val v: Double) extends Serializable {

  /** Sum of -ln p(w2|w1) over consecutive token pairs, p = (c2+1) /
    * (c1+V) — the SAME strict left-to-right double fold as the
    * MapType/HOF formulation (CorpusStatsSpec pins hand-computed
    * values), so results are bit-identical and the q112 oracle is
    * unchanged. 0.0 for arrays below 2 elements (the caller divides
    * by n-1 behind its own null guard). */
  def nllSum(arr: ArrayData): Double = {
    val n = arr.numElements()
    var acc = 0.0d
    var i = 0
    while (i < n - 1) {
      val w1 = arr.getUTF8String(i).toString
      val c2 = bi.getOrDefault(
        w1 + " " + arr.getUTF8String(i + 1).toString, 0L)
      val c1 = uni.getOrDefault(w1, 0L)
      acc -= java.lang.Math.log((c2 + 1.0d) / (c1 + v))
      i += 1
    }
    acc
  }
}

/** Codegen'd per-document bigram negative-log-likelihood sum against
  * a broadcast [[BigramLm]]: one static-shaped call per row, O(1)
  * model probes, stays inside whole-stage codegen.
  *
  * The expression references the `Broadcast` STUB, not the model: an
  * `addReferenceObj` of the model itself rides the task closure of
  * EVERY stage the expression appears in (at sf0.1 that was seconds
  * of per-stage driver serialization — the r12 q112 regression; at
  * 100 TB vocabularies near the 4M cap it is hundreds of MB per
  * stage). The stub serializes in bytes; each executor torrent-fetches
  * the maps once and the codegen'd class caches the dereferenced
  * model in a mutable field, so the per-row path never re-probes the
  * broadcast manager. */
case class BigramNllSum(child: Expression, model: Broadcast[BigramLm])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bigram_nll_sum"

  override def nullSafeEval(v: Any): Any =
    model.value.nllSum(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramLmBc", model,
      "org.apache.spark.broadcast.Broadcast")
    val lm = ctx.addMutableState("org.apache.spark.sql.graft.BigramLm",
      "bigramLm",
      v => s"$v = (org.apache.spark.sql.graft.BigramLm) $ref.value();")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $lm.nllSum($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Plan-time UNIGRAM LM model — the order-1 twin of [[BigramLm]],
  * and the r20 replacement for the broadcast-MapType formulation of
  * CorpusStats.unigramNllSum: Catalyst's `element_at` on a map is a
  * LINEAR scan of the key array (the measured BigramLm rationale
  * above), so a ~10³-entry vocabulary probed once per token was
  * whole cpu-seconds per corpus scan across the unigram-loss family
  * (q106/q173/q181/q189). HashMap probes are O(1); the fold below is
  * the SAME strict left-to-right double sum as the HOF formulation
  * (CorpusStatsSpec pins hand-computed values), so results are
  * bit-identical and the shared oracles are unchanged. */
final class UnigramLm(
    val m: java.util.HashMap[String, Long],
    val n: Double,
    val v: Double) extends Serializable {

  /** Sum of -ln p(tok) over the array, p = (c+1) / (N+V) with c = 0
    * for tokens outside the stored map (sub-minCount and never-seen
    * tokens score identically — the OOV contract). */
  def nllSum(arr: ArrayData): Double = {
    val k = arr.numElements()
    var acc = 0.0d
    var i = 0
    while (i < k) {
      val c = m.getOrDefault(arr.getUTF8String(i).toString, 0L)
      acc -= java.lang.Math.log((c + 1.0d) / (n + v))
      i += 1
    }
    acc
  }
}

/** Codegen'd per-document unigram negative-log-likelihood sum against
  * a broadcast [[UnigramLm]] — same broadcast-stub discipline as
  * [[BigramNllSum]] (the model ships once per executor, never with
  * task closures). */
case class UnigramNllSum(child: Expression, model: Broadcast[UnigramLm])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "unigram_nll_sum"

  override def nullSafeEval(v: Any): Any =
    model.value.nllSum(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramLmBc", model,
      "org.apache.spark.broadcast.Broadcast")
    val lm = ctx.addMutableState("org.apache.spark.sql.graft.UnigramLm",
      "unigramLm",
      v => s"$v = (org.apache.spark.sql.graft.UnigramLm) $ref.value();")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $lm.nllSum($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
