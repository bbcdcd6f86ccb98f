package graft

import org.apache.spark.sql.catalyst.expressions.ArraysOverlap
import org.apache.spark.sql.{functions => F, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Dedup

class RulesSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def overlapCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.expressions
      .map(_.collect { case o: ArraysOverlap => o }.size).sum

  // RDD-backed input: a LocalRelation would be constant-folded by
  // ConvertToLocalRelation before the injected rule could matter
  private def arraysDf(containsNull: Boolean): DataFrame = {
    val schema = StructType(Seq(
      StructField("x", ArrayType(StringType, containsNull), nullable = false),
      StructField("y", ArrayType(StringType, containsNull), nullable = false)))
    val rows = Seq(
      Row(Seq("a", "b"), Seq("b", "c")),
      Row(Seq("a"), Seq("c")))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  test("intersection-count overlap tests rewrite to arrays_overlap") {
    val df = arraysDf(containsNull = false)
    val gt = df.filter(F.size(array_intersect(col("x"), col("y"))) > 0)
    overlapCount(gt) shouldBe 1
    gt.count() shouldBe 1L
    val eq = df.filter(F.size(array_intersect(col("x"), col("y"))) === 0)
    overlapCount(eq) shouldBe 1
    eq.count() shouldBe 1L
  }

  test("the rewrite fires in flagContaminated's plan and preserves flags") {
    import spark.implicits._
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "the key agg rose"), Row(2L, "nothing shared here")), 1),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))
    val flagged = Dedup.flagContaminated(docs, "text", 2, Seq("key agg"))
    // the flag is a projection (CASE over the predicate); the
    // short-circuit must appear in the optimized plan
    overlapCount(flagged) shouldBe 1
    flagged.select("doc_id", "contaminated").as[(Long, Boolean)]
      .collect().toMap shouldBe Map(1L -> true, 2L -> false)
  }

  test("arrays with nullable elements are NOT rewritten (null semantics differ)") {
    val df = arraysDf(containsNull = true)
    val q = df.filter(F.size(array_intersect(col("x"), col("y"))) > 0)
    overlapCount(q) shouldBe 0
    q.count() shouldBe 1L
  }
}
