package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{CosineSim, MinHashAgg, SimHashMd5, Tokenize, TopKAgg, WordShingles}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration of the engine's native expressions, for
  * sessions built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` —
  * after which `spark.sql("SELECT cosine_sim(a, b) …")` plans the
  * codegen'd kernel. [[GraftExtensions.register]] does the same
  * imperatively on an already-running session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // optimizer rule: intersection-count overlap tests short-circuit
    // as arrays_overlap (see IntersectNonEmptyToOverlap)
    ext.injectOptimizerRule(_ => IntersectNonEmptyToOverlap)
    // optimizer rule (opt-in via AnnIndex.register): cosine top-k over
    // a table with a registered at-rest quantized index → probe-pruned
    // shortlist semi-join (AnnTopKToIndexScan). Injected BEFORE the
    // LSH prune so the more specific rewrite wins; each defers to a
    // subtree the other already rewrote.
    ext.injectOptimizerRule(_ => AnnTopKToIndexScan)
    // optimizer rule (opt-in via spark.graft.ann.rewrite): literal-
    // query cosine top-k → LSH bucket-pruned plan (AnnTopKToLshPrune)
    ext.injectOptimizerRule(_ => AnnTopKToLshPrune)
    // planner strategy: AsOfJoinPlan → AsOfJoinExec (sort-merge as-of)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"cosine_sim(a, b) takes 2 arguments, got ${children.size}")
        CosineSim(children.head, children(1))
      }),
    (new FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"top_k(score, id, k) takes 3 arguments, got ${children.size}")
        val k = children(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"top_k(score, id, k): k must be an integer literal, got $other")
        }
        TopKAgg(children.head, children(1), k)
      }),
    (new FunctionIdentifier("minhash_sketch"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"minhash_sketch(h0, k) takes 2 arguments, got ${children.size}")
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sketch(h0, k): k must be an integer literal, got $other")
        }
        MinHashAgg(children.head, k)
      }),
    (new FunctionIdentifier("tokenize"),
      new ExpressionInfo(classOf[Tokenize].getName, "tokenize"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"tokenize(text) takes 1 argument, got ${children.size}")
        Tokenize(children.head)
      }),
    (new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"word_shingles(text, n) takes 2 arguments, got ${children.size}")
        val n = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles(text, n): n must be an integer literal, got $other")
        }
        WordShingles(children.head, n)
      }),
    (new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHashMd5].getName, "simhash60"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"simhash60(tokens) takes 1 argument, got ${children.size}")
        SimHashMd5(children.head, 60)
      }))

  /** Imperative registration into an existing session — functions AND
    * the optimizer rule (via experimental.extraOptimizations, the
    * post-hoc seam; already-registered rules are not re-added), so
    * both setup paths yield the same session behavior. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(IntersectNonEmptyToOverlap))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntersectNonEmptyToOverlap
    if (!spark.experimental.extraOptimizations.contains(AnnTopKToIndexScan))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AnnTopKToIndexScan
    if (!spark.experimental.extraOptimizations.contains(AnnTopKToLshPrune))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AnnTopKToLshPrune
    if (!spark.experimental.extraStrategies
        .contains(org.apache.spark.sql.graft.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+
          org.apache.spark.sql.graft.AsOfJoinStrategy
  }
}
