package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.Layout

class LayoutSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("clusteredWrite yields non-overlapping per-file key spans and prunes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_layout").toString + "/t"
    // write keys shuffled so the clustering has real work to do
    val df = (1 to 10000).map(i => ((i * 7919) % 10007, s"v$i"))
      .toDF("k", "v")
    Layout.clusteredWrite(df, dir, numFiles = 8, col("k"))

    val spans = Layout.fileSpans(spark, dir, "k")
      .as[(String, Int, Int, Long)].collect().sortBy(_._2)
    spans.length shouldBe 8
    spans.map(_._4).sum shouldBe 10000L
    // non-overlapping: every file's hi < the next file's lo
    spans.sliding(2).foreach {
      case Array((_, _, hi, _), (_, lo, _, _)) => hi should be < lo
      case _ => ()
    }
    // range balance: sampled boundaries keep files within ~3x of even
    val ns = spans.map(_._4)
    ns.max.toDouble / ns.min.toDouble should be < 3.0

    // the read side actually prunes: a narrow range filter must touch
    // only the files whose span intersects it
    val probe = spark.read.parquet(dir).filter(col("k").between(100, 200))
    val touched = probe.select(input_file_name()).distinct().count()
    val expected = spans.count { case (_, lo, hi, _) => lo <= 200 && hi >= 100 }
    touched shouldBe expected.toLong
    expected should be < 8
  }
}
