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
}
