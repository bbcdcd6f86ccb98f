package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.TopK

class TopKSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("bounded-heap Aggregator matches a full sort per key") {
    import spark.implicits._
    val r = new scala.util.Random(5L)
    val rows = (for {
      g <- Seq("a", "b", "c")
      i <- 0 until 500
    } yield (g, r.nextDouble(), i.toLong)).toList
    val k = 5
    val got = TopK.topKPerKey(rows.toDS(), k).collect().toMap
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(t => (t._2, t._3))
        .sortBy { case (s, id) => (-s, id) }.take(k)).toMap
    got.keySet shouldBe expected.keySet
    got.keys.foreach(g => got(g).toList shouldBe expected(g).toList)
  }

  test("partial aggregation keeps buffers bounded (many partitions)") {
    import spark.implicits._
    val ds = spark.range(0, 10000).repartition(8)
      .map(i => ("only", (i % 997).toDouble, i.toLong))
    val top = TopK.topKPerKey(ds, 3).collect()
    top.length shouldBe 1
    top.head._2.map(_._1).toList shouldBe List(996.0, 996.0, 996.0)
  }

  test("native top_k aggregate matches the window form and the typed Aggregator") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = new scala.util.Random(11L)
    val df = (for {
      g <- Seq("a", "b", "c"); i <- 0 until 400
    } yield (g, r.nextInt(50).toDouble, i.toLong)) // many score ties
      .toDF("g", "score", "id").repartition(8)
    val k = 4
    val native = df.groupBy("g")
      .agg(TopK.topKFast(col("score"), col("id"), k).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.score"), col("e.id"))
      .as[(String, Double, Long)].collect().toSet
    val window = graft.operators.Relational.topKPerGroup(
      df, Seq(col("g")), Seq(col("score").desc, col("id")), k)
      .select(col("g"), col("score"), col("id"))
      .as[(String, Double, Long)].collect().toSet
    native shouldBe window
  }

  test("native top_k orders NaN scores like Spark's desc sort (NaN greatest)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(("g", Double.NaN, 0L), ("g", 5.0, 1L), ("g", 3.0, 2L),
      ("g", 7.0, 3L)).toDF("g", "score", "id").repartition(3)
    val native = df.groupBy("g")
      .agg(TopK.topKFast(col("score"), col("id"), 2).as("top"))
      .selectExpr("top[0].id", "top[1].id").as[(Long, Long)].head()
    // Spark's score.desc puts NaN first, then 7.0 — a naive < heap
    // would freeze on the NaN root and return {NaN, 5.0}
    native shouldBe (0L, 3L)
  }

  test("top_k is registered as a SQL function via GraftExtensions") {
    import spark.implicits._
    Seq(("g", 1.0, 10L), ("g", 3.0, 11L), ("g", 2.0, 12L))
      .toDF("g", "score", "id").createOrReplaceTempView("topk_sql_in")
    val out = spark.sql(
      "SELECT g, top_k(score, id, 2) AS top FROM topk_sql_in GROUP BY g")
      .selectExpr("g", "top[0].id", "top[1].id")
      .as[(String, Long, Long)].head()
    out shouldBe ("g", 11L, 12L)
  }
}
