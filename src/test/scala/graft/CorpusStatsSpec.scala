package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.CorpusStats

class CorpusStatsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("rareTokenStats counts distinct tokens and df<=maxDf tokens per doc") {
    import spark.implicits._
    // df: the=3, cat=2, sat=1, dog=1, mat=1, cat(along with repeats) —
    // repeated tokens inside one doc count once (distinct semantics)
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the cat cat"), // 'cat' repeated: distinct_tokens = 2
      (3L, "the dog mat")).toDF("doc_id", "text")
    val out = CorpusStats.rareTokenStats(docs, "doc_id", "text", maxDf = 1L)
      .as[(Long, Long, Long)].collect()
      .map { case (d, n, r) => d -> ((n, r)) }.toMap
    // doc 1: tokens {the, cat, sat} → sat has df 1 → rare = 1
    // doc 2: tokens {the, cat}      → none rare
    // doc 3: tokens {the, dog, mat} → dog, mat rare
    out shouldBe Map(
      1L -> ((3L, 1L)), 2L -> ((2L, 0L)), 3L -> ((3L, 2L)))
  }

  test("rareTokenStats boundary: df == maxDf counts as rare; empty docs emit no row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha beta"),
      (3L, "   ")).toDF("doc_id", "text")
    val out = CorpusStats.rareTokenStats(docs, "doc_id", "text", maxDf = 2L)
      .as[(Long, Long, Long)].collect()
      .map { case (d, n, r) => d -> ((n, r)) }.toMap
    // alpha/beta have df 2 = maxDf → rare; doc 3 has no tokens → absent
    out shouldBe Map(1L -> ((2L, 2L)), 2L -> ((2L, 2L)))
  }
}
