// Hosted in an org.apache.spark.sql subpackage because the expression
// framework types it needs are private[sql] — see CosineSim.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Plan-time bigram LM model: real hash maps + smoothing constants,
  * built driver-side from bounded aggregate rows and shipped to
  * executors as a codegen reference object (the [[CmsEstimate]]
  * convention). Why not a broadcast MapType column: Catalyst's
  * `element_at` on a map is a LINEAR scan of the key array — at a
  * ~10³-entry bigram map probed twice per token it dominated q112's
  * scoring pass (measured ~25 CPU-seconds at sf0.1); a HashMap probe
  * is O(1). */
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
  * a plan-time [[BigramLm]]: one static-shaped call per row, O(1)
  * model probes, stays inside whole-stage codegen. */
case class BigramNllSum(child: Expression, model: BigramLm)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bigram_nll_sum"

  override def nullSafeEval(v: Any): Any =
    model.nllSum(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramLm", model,
      "org.apache.spark.sql.graft.BigramLm")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.nllSum($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
