package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite with SparkSpec with Matchers {

  // Four documents with known term statistics: "apple" in 3 docs,
  // "rare" in 1, "pear" in 2, doc 4 shares nothing with the queries.
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple pear apple"),          // dl 3
      (2L, "apple rare"),                // dl 2
      (3L, "pear apple banana banana"),  // dl 4
      (4L, "kiwi kiwi kiwi"))            // dl 3
      .toDF("doc_id", "text")
  }

  /** One term's 6-decimal-rounded contribution, as the engine's
    * decimal accumulator sees it (sum contributions as BigDecimal
    * before converting — matching the order-free decimal sum). */
  private def bm25(tf: Long, df: Long, dl: Long, n: Double,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): BigDecimal = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    val tfn = (tf * (k1 + 1.0)) /
      (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
    BigDecimal(idf * tfn).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  }

  test("bm25TopK matches the hand-computed ranking and scores") {
    val out = Retrieval
      .bm25TopK(corpus, "doc_id", "text", Seq((1, "apple rare")), k = 10)
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val n = 4.0
    val avgdl = 12.0 / 4.0
    // doc 2: apple tf1 df3 + rare tf1 df1 — the rare term dominates
    val d2 = (bm25(1, 3, 2, n, avgdl) + bm25(1, 1, 2, n, avgdl)).toDouble
    // doc 1: apple tf2; doc 3: apple tf1 at dl 4
    val d1 = bm25(2, 3, 3, n, avgdl).toDouble
    val d3 = bm25(1, 3, 4, n, avgdl).toDouble
    out shouldBe Array((1, 2L, d2), (2, 1L, d1), (3, 3L, d3))
  }

  test("documents sharing no query term never appear; k truncates") {
    val out = Retrieval
      .bm25TopK(corpus, "doc_id", "text", Seq((7, "apple pear")), k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    out.map(_._3) should not contain 4L // kiwi-only doc has score 0
    out.length shouldBe 2               // k caps the per-query list
    out.map(_._2).sorted shouldBe Array(1, 2)
  }

  test("query tokenization dedups terms and normalizes case") {
    // "APPLE apple" is ONE distinct term — the score must equal the
    // single-term query's, not double it
    val once = Retrieval
      .bm25TopK(corpus, "doc_id", "text", Seq((1, "apple")), k = 1)
      .collect()(0).getDouble(3)
    val twice = Retrieval
      .bm25TopK(corpus, "doc_id", "text", Seq((1, "APPLE  apple")), k = 1)
      .collect()(0).getDouble(3)
    twice shouldBe once
  }

  test("ties rank by ascending doc id") {
    import spark.implicits._
    val tied = Seq((5L, "x y"), (2L, "x y"), (9L, "x y"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(tied, "doc_id", "text",
      Seq((1, "x")), k = 3).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    out shouldBe Array((1, 2L), (2, 5L), (3, 9L))
  }

  test("indexed form equals the dataflow form and prunes the store") {
    import spark.implicits._
    // enough distinct tokens to spread across buckets/files: 200 docs
    // over a 60-token vocabulary plus per-doc unique noise tokens
    val docs = (0L until 200L).map { i =>
      val shared = (0 until 6)
        .map(j => s"w${(i * 7 + j * 13) % 60}").mkString(" ")
      (i, s"$shared uniq$i")
    }.toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_retr_idx_").toString
    val store = root + "/postings"
    try {
      Retrieval.writePostingsIndex(docs, "doc_id", "text", store,
        nBuckets = 32, numFiles = 8)
      val queries = Seq((1, "w3 w17"), (2, "uniq42 w55"))
      val direct = Retrieval
        .bm25TopK(docs, "doc_id", "text", queries, k = 5)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2))
      val indexed = Retrieval
        .bm25TopKIndexed(spark, store, queries, k = 5)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2))
      indexed shouldBe direct
      direct.nonEmpty shouldBe true

      // the bucket predicate actually prunes: the posting scan for
      // one term must touch fewer files than the store holds
      val buckets = Seq("w3").toDF("tok")
        .select(pmod(xxhash64(col("tok")), lit(32L))).as[Long].collect()
      val touched = spark.read.parquet(s"$store/postings")
        .filter(col("bucket").isin(buckets: _*))
        .select(input_file_name()).distinct().count()
      val total = spark.read.parquet(s"$store/postings")
        .select(input_file_name()).distinct().count()
      total shouldBe 8L
      touched should be < total
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("rrfFuse: hand-computed fusion, union semantics, id tiebreak") {
    import spark.implicits._
    // list A ranks docs 1,2,3; list B ranks 2,1,9 — doc 2 wins
    // (1/61 + 1/62 > 1/61 + 1/62 for doc 1? both symmetric: doc1 A:1
    // B:2 → 1/61+1/62; doc2 A:2 B:1 → 1/62+1/61 — a TIE broken by
    // id), doc 9 appears only in B (union semantics)
    val a = Seq((1, 1L, 1), (1, 2L, 2), (1, 3L, 3))
      .toDF("qid", "doc_id", "rank")
    val b = Seq((1, 2L, 1), (1, 1L, 2), (1, 9L, 3))
      .toDF("qid", "doc_id", "rank")
    val out = graft.operators.Retrieval.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    def c(r: Int) = BigDecimal(1.0 / (60.0 + r.toDouble))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    out shouldBe Array(
      (1, 1L, (c(1) + c(2)).toDouble), // tie with doc 2 → smaller id
      (2, 2L, (c(2) + c(1)).toDouble),
      (3, 3L, c(3).toDouble),          // ties doc 9 at 1/63 → id wins
      (4, 9L, c(3).toDouble))
  }

  test("segment-appended store equals a from-scratch build; bucket " +
    "mismatch fails loudly") {
    import spark.implicits._
    val docs = (0L until 120L).map { i =>
      (i, (0 until 5).map(j => s"w${(i * 3 + j * 11) % 40}").mkString(" "))
    }.toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_retr_seg_").toString
    val whole = root + "/whole"
    val grown = root + "/grown"
    try {
      Retrieval.writePostingsIndex(docs, "doc_id", "text", whole,
        nBuckets = 16, numFiles = 4)
      Retrieval.appendPostingsSegment(docs.filter($"doc_id" < 60L),
        "doc_id", "text", grown, "base", nBuckets = 16, numFiles = 4)
      Retrieval.appendPostingsSegment(docs.filter($"doc_id" >= 60L),
        "doc_id", "text", grown, "ingest1", nBuckets = 16, numFiles = 2)
      val queries = Seq((1, "w0 w13"), (2, "w39"))
      def run(store: String) = Retrieval
        .bm25TopKIndexed(spark, store, queries, k = 4)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2))
      run(grown) shouldBe run(whole)
      // a segment appended with a different bucket count corrupts
      // bucket routing — the query must refuse, not silently misread
      Retrieval.appendPostingsSegment(
        Seq((999L, "w0")).toDF("doc_id", "text"),
        "doc_id", "text", grown, "bad", nBuckets = 8, numFiles = 1)
      an[IllegalArgumentException] should be thrownBy
        Retrieval.bm25TopKIndexed(spark, grown, queries, k = 4)
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("mmrRerank: redundancy demotes a near-duplicate of the top hit") {
    import spark.implicits._
    // B (doc 20) is nearly as relevant as A (doc 10) but near-identical
    // to it; C (doc 30) is less relevant but different. Pure relevance
    // ranks A,B,C; MMR at λ=0.5 ranks A,C,B: step 2 scores
    // B = .5·.89−.5·.99 = −.05 < C = .5·.5−.5·.1 = .2.
    val cands = Seq((1L, 10L, 0.9), (1L, 20L, 0.89), (1L, 30L, 0.5))
      .toDF("qid", "doc_id", "rel")
    val sims = Seq(
      (1L, 10L, 20L, 0.99), (1L, 20L, 10L, 0.99),
      (1L, 10L, 30L, 0.1), (1L, 30L, 10L, 0.1),
      (1L, 20L, 30L, 0.1), (1L, 30L, 20L, 0.1))
      .toDF("qid", "doc_a", "doc_b", "sim")
    val out = Retrieval
      .mmrRerank(cands, sims, lambda = BigDecimal("0.5"), select = 3)
      .select(col("rank"), col("doc_id"),
        col("mmr").cast("double"))
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    out.map(_._2).toSeq shouldBe Seq(10L, 30L, 20L)
    // exact decimal scores: rank2 = .5·.5−.5·.1 = .2;
    // rank3 docs 20's max sim to {10,30} is .99 → .5·.89−.5·.99 = −.05
    out(0)._3 shouldBe 0.9
    out(1)._3 shouldBe 0.2
    out(2)._3 shouldBe -0.05
    // a pure-relevance λ=1 degenerates to the relevance order
    Retrieval.mmrRerank(cands, sims, lambda = BigDecimal(1), select = 3)
      .select(col("rank"), col("doc_id")).as[(Int, Long)]
      .collect().sortBy(_._1).map(_._2).toSeq shouldBe Seq(10L, 20L, 30L)
  }
}
