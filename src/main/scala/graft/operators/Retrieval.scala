package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.text
import graft.sources.Layout

/** Sparse lexical retrieval over the document corpus: BM25 top-k — the
  * classic inverted-index ranking function, in two forms: a pure
  * dataflow (no materialized index) for one-shot batch retrieval, and
  * an AT-REST POSTINGS INDEX (the text analog of the quantized ANN
  * store, Layout.clusteredWrite) for repeated query batches over a
  * static corpus.
  *
  * The reference has no text retrieval at all (its only lookup is
  * regex topic filtering, pulsar_remote_inspector.py:434-442); this is
  * north-star surface (BASELINE.json "text analysis").
  *
  * Scale shape, dataflow form (100 TB): the ONLY body-grain work is
  * one pruned scan — tokenize, keep the tokens that appear in ANY
  * query (an `array_intersect`-style filter pushed into the same
  * codegen stage), explode the survivors. Everything after that scan
  * is posting-grain (rows ∝ docs containing a query term), exactly the
  * volume a real inverted index would read: the per-(doc,term) tf
  * aggregate, the term-keyed df aggregate (bounded by the query
  * vocabulary — always broadcast back), and the per-query top-k.
  * Corpus statistics (N, total token count) come from one planning
  * aggregate over a column-pruned second scan — the q114 nDocs
  * convention. The final ranking window partitions by query id: few
  * partitions, but WindowGroupLimit prunes every task to its local
  * top-k BEFORE the shuffle, so the skew ceiling is k·tasks rows per
  * query, not the posting volume.
  *
  * Scale shape, indexed form: the corpus is tokenized ONCE at build
  * time into a bucket-clustered posting store (token-hash buckets —
  * every term's postings are contiguous in one bucket's files); a
  * query batch then reads ONLY the files whose bucket span intersects
  * its terms' buckets (the q101 clustered-scan pruning), never the
  * corpus. Build cost amortizes across query batches; query cost is
  * (matching postings) + a bounded stats lookup.
  *
  * Exactness: each per-term contribution is rounded to 6 decimals and
  * DECIMAL-summed (order-free — the q113/q120 convention), and the
  * rank compares the ROUNDED sum with the doc-id tiebreak, so both
  * engines order identical values and ulp-level ln() divergence
  * cannot flip ranks. The two forms share one scoring chain and are
  * result-equal by construction (spec-pinned).
  */
object Retrieval {

  private def tokenizeQueries(
      queries: Seq[(Int, String)]): Seq[(Int, String)] =
    queries.flatMap { case (qid, q) =>
      // Locale.ROOT: the engine's lower() is locale-independent —
      // a Turkish default locale would otherwise fold "I" to "ı" here
      // and silently miss every posting for it
      q.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty).distinct
        .map(t => (qid, t))
    }

  /** The shared BM25 scoring chain over a posting frame
    * (doc_id, tok, dl, tf): idf · saturated-tf per (query, doc, term),
    * rounded and decimal-summed per (query, doc), ranked per query. */
  private def scoreAndRank(tf: DataFrame, qTerms: Seq[(Int, String)],
      nDocs: Double, avgDl: Double, k: Int, k1: Double,
      b: Double): DataFrame = {
    val spark = tf.sparkSession
    import spark.implicits._
    // df over the (already query-pruned) postings: a document counts
    // once per term it contains. Bounded by the query vocabulary —
    // AQE broadcasts it back.
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val qTab = qTerms.toDF("qid", "tok")
    val tfD = col("tf").cast("double")
    val idf = log(
      (lit(nDocs) - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfn = (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgDl))))
    val contrib = tf.join(dfTab, "tok")
      .join(broadcast(qTab), "tok")
      .select(col("qid"), col("doc_id"),
        round(idf * tfn, 6).cast("decimal(20,6)").as("c"))
    val scored = contrib.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).cast("double").as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
  }

  /** BM25 top-`k` documents per query, dataflow form. `queries` are
    * (query id, raw query text) — tokenized with the corpus tokenizer,
    * deduplicated (BM25 sums each distinct query term once). Output:
    * (qid, rank, doc_id, score), rank 1..k by (rounded score desc,
    * doc_id asc). Documents sharing no term with a query never appear
    * (their score is 0 and BM25 contributions are strictly
    * positive). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, String)], k: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    require(k >= 1, s"k must be >= 1: $k")
    val qTerms = tokenizeQueries(queries)
    val allTerms: Seq[String] = qTerms.map(_._2).distinct

    // ONE planning aggregate for the two corpus statistics BM25 needs
    // (the q114/q108 statistic convention — a 1-row broadcast
    // crossJoin would plan a BNLJ for a scalar). Both derived values
    // are plain integer-ratio doubles, so the oracle recomputes them
    // bit-identically from the same integers.
    val stats = docs.agg(
      count(lit(1)).as("n"),
      sum(size(text.tokens(col(textCol))).cast("long")).as("toks"))
      .collect()(0)
    require(stats.getLong(0) > 0L && !stats.isNullAt(1),
      "bm25TopK needs a non-empty corpus with at least one non-null " +
        s"$textCol (an empty one has no N/avgdl to score against)")
    val nDocs = stats.getLong(0).toDouble
    val avgDl = stats.getLong(1).toDouble / nDocs

    // the single body-grain pass: doc length + query-term postings.
    // The HOF filter against the (small, literal) query vocabulary
    // runs inside the scan stage, so only matching tokens explode.
    val termsLit = array(allTerms.map(lit): _*)
    val postings = docs.select(
      col(idCol).as("doc_id"),
      size(text.tokens(col(textCol))).cast("double").as("dl"),
      explode(filter(text.tokens(col(textCol)),
        t => array_contains(termsLit, t))).as("tok"))
    val tf = postings.groupBy(col("doc_id"), col("tok"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
    scoreAndRank(tf, qTerms, nDocs, avgDl, k, k1, b)
  }

  /** Build the at-rest postings index under `root`: the full
    * (doc, term) posting list — term-hash `bucket`, doc_id, tf, and
    * the doc length dl denormalized onto every posting (the standard
    * inverted-index payload, so scoring needs no doc-table join) —
    * clustered on bucket via Layout.clusteredWrite (contiguous
    * non-overlapping bucket spans per file → a term predicate prunes
    * files), plus a one-row `stats` table (N, total tokens, bucket
    * count) the query side needs. ONE tokenize pass over the corpus;
    * the single shuffle is the (doc, tok) aggregate. Writer-safe via
    * the store lease inside clusteredWrite. */
  private def postingsOf(docs: DataFrame, idCol: String,
      textCol: String, nBuckets: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        size(text.tokens(col(textCol))).cast("double").as("dl"),
        explode(text.tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .withColumn("bucket",
        pmod(xxhash64(col("tok")), lit(nBuckets.toLong)))

  private def statsOf(docs: DataFrame, textCol: String,
      nBuckets: Int): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(size(text.tokens(col(textCol))).cast("long")).as("n_tokens"),
      lit(nBuckets).as("n_buckets"))

  def writePostingsIndex(docs: DataFrame, idCol: String, textCol: String,
      root: String, nBuckets: Int = 64, numFiles: Int = 8): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    Layout.clusteredWrite(postingsOf(docs, idCol, textCol, nBuckets),
      s"$root/postings", numFiles, col("bucket"))
    statsOf(docs, textCol, nBuckets)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/stats")
  }

  /** Build-if-absent + read-marker for [[writePostingsIndex]] (the
    * Dedup.ensurePairStore convention): `stats/_SUCCESS` — the stats
    * table is written LAST by the build — is the publish marker, so
    * its presence proves the postings landed first; absence
    * (including a crashed half-write) triggers a rebuild whose
    * overwrite modes clobber the residue. Concurrent builders
    * serialize on the store's writer lease with a double-check after
    * acquisition. The build is phase-tagged (`index_build`) so any
    * wall that includes it decomposes from the bench artifact
    * alone. */
  def ensurePostingsIndex(docs: DataFrame, idCol: String,
      textCol: String, root: String, nBuckets: Int = 64,
      numFiles: Int = 8): Unit = {
    val spark = docs.sparkSession
    val marker = new org.apache.hadoop.fs.Path(s"$root/stats/_SUCCESS")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(marker)) {
      graft.sources.StoreLease.withLease(spark, root,
        "postings-index-build") {
        if (!fs.exists(marker)) // double-check under the lease
          graft.Phases.time("index_build") {
            writePostingsIndex(docs, idCol, textCol, root, nBuckets,
              numFiles)
          }
      }
    }
  }

  /** INCREMENTAL form of [[writePostingsIndex]] (the
    * Layout.clusteredAppend lifecycle — a 100 TB index is grown per
    * crawl batch, never rewritten): append `docs`' postings as one new
    * bucket-clustered SEGMENT plus a per-segment ADDITIVE stats row
    * (N, token total — summed at query time, so stats never need a
    * corpus rescan). Because postings are doc-local, segmenting by
    * document never changes a term's global posting set: a store grown
    * by appends is RESULT-EQUAL to a from-scratch build over the union
    * (spec-pinned). The caller contract is that each document lands in
    * exactly ONE segment — re-appending a doc would double-count it
    * (deduplicating re-crawls is the near-dup ingest operator's job,
    * upstream of indexing). Concurrent appends fail loudly via the
    * store lease inside clusteredAppend; `nBuckets` must match across
    * segments (checked loudly at query time). */
  def appendPostingsSegment(docs: DataFrame, idCol: String,
      textCol: String, root: String, segmentId: String,
      nBuckets: Int = 64, numFiles: Int = 8): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    Layout.clusteredAppend(postingsOf(docs, idCol, textCol, nBuckets),
      s"$root/postings", segmentId, numFiles, col("bucket"))
    statsOf(docs, textCol, nBuckets)
      .write.mode(SaveMode.ErrorIfExists)
      .parquet(s"$root/stats/seg=$segmentId")
  }

  /** IDEMPOTENT [[appendPostingsSegment]] for retried writers (the
    * q111 exactly-once convention, applied to the postings store):
    * the stats partition's `_SUCCESS` marker — written LAST — seals
    * the segment. A retried `segmentId` whose seal exists skips the
    * append entirely (returns false); a half-landed attempt (crash
    * between postings and stats, or mid-write) is cleaned and redone,
    * so the store converges to exactly the single-run state whatever
    * step the first attempt died at. Returns true when this call did
    * the append. */
  def appendPostingsSegmentIdempotent(docs: DataFrame, idCol: String,
      textCol: String, root: String, segmentId: String,
      nBuckets: Int = 64, numFiles: Int = 8): Boolean = {
    val spark = docs.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val postSeg = new org.apache.hadoop.fs.Path(
      s"$root/postings/seg=$segmentId")
    val statSeg = new org.apache.hadoop.fs.Path(
      s"$root/stats/seg=$segmentId")
    val fs = postSeg.getFileSystem(hconf)
    def sealed_(p: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    if (sealed_(postSeg) && sealed_(statSeg)) false
    else {
      // clean any half-landed attempt — ErrorIfExists inside the
      // plain append would otherwise refuse the redo
      if (fs.exists(postSeg)) fs.delete(postSeg, true)
      if (fs.exists(statSeg)) fs.delete(statSeg, true)
      appendPostingsSegment(docs, idCol, textCol, root, segmentId,
        nBuckets, numFiles)
      true
    }
  }

  /** BM25 top-k against a [[writePostingsIndex]] store: result-equal
    * to [[bm25TopK]] over the same corpus (same scoring chain, same
    * exact df/tf/dl/N inputs), but the corpus is never touched — the
    * scan reads only the posting files whose bucket span intersects
    * the query terms' buckets (bucket + term predicates both reach
    * the parquet scan). Query-term buckets come from the SAME hash
    * kernel as the stored column, evaluated through a bounded
    * planning job (the q101 query-bucket convention). */
  /** RECIPROCAL-RANK FUSION — the standard hybrid-retrieval combiner
    * (Cormack et al. 2009; what production RAG runs to merge a
    * lexical BM25 list with an embedding-similarity list): each input
    * ranking contributes 1/(kRrf + rank) per (query, doc), summed
    * over lists, re-ranked. Rank-based, so the input scores need no
    * calibration against each other — the reason RRF is the default
    * hybrid everywhere.
    *
    * Inputs are (qid, doc_id, rank) frames — any ranked id list
    * qualifies (the operator is retrieval-agnostic). A doc missing
    * from a list simply contributes nothing from it (union
    * semantics).
    *
    * Scale shape: the inputs arrive already top-N-pruned by their own
    * rankers (WindowGroupLimit on each arm), so fusion touches
    * N·|queries|·|lists| rows — driver-trivial volumes regardless of
    * corpus size; the only shuffles are the tiny union aggregate and
    * the final per-query rank. Exactness: contributions are
    * 1/(kRrf + rank) over INTEGER ranks, rounded to 9 decimals and
    * DECIMAL-summed — order-free, engine-mirrorable exactly. */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 10,
      kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k >= 1 && kRrf >= 1, s"need k,kRrf >= 1: k=$k kRrf=$kRrf")
    val contribs = lists.map(_.select(col("qid"), col("doc_id"),
      round(lit(1.0) / (lit(kRrf.toDouble) + col("rank").cast("double")),
        9).cast("decimal(20,9)").as("c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).cast("double").as("rrf"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("rrf"))
  }

  def bm25TopKIndexed(spark: SparkSession, root: String,
      queries: Seq[(Int, String)], k: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopKIndexed needs at least one query")
    require(k >= 1, s"k must be >= 1: $k")
    import spark.implicits._
    val qTerms = tokenizeQueries(queries)
    val allTerms: Seq[String] = qTerms.map(_._2).distinct

    // one row for a clusteredWrite store, one PER SEGMENT for an
    // appended store — the additive merge is the same read either way
    val st = spark.read.parquet(s"$root/stats")
      .agg(sum(col("n_docs")), sum(col("n_tokens")),
        collect_set(col("n_buckets")))
      .collect()(0)
    require(!st.isNullAt(0) && st.getLong(0) > 0L && !st.isNullAt(1),
      s"postings store at $root indexes an empty corpus — nothing to " +
        "score against")
    val nDocs = st.getLong(0).toDouble
    val avgDl = st.getLong(1).toDouble / nDocs
    val nbSet = st.getSeq[Int](2)
    require(nbSet.size == 1,
      s"segments disagree on nBuckets: $nbSet — the store is corrupt " +
        "(all segments must be appended with the same bucket count)")
    val nBuckets = nbSet.head

    // term → bucket through the same engine kernel as the store
    // (bounded planning job over the query vocabulary)
    val buckets: Seq[Long] = allTerms.toDF("tok")
      .select(pmod(xxhash64(col("tok")), lit(nBuckets.toLong)))
      .as[Long].collect().distinct.toSeq
    val tf = spark.read.parquet(s"$root/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("tok").isin(allTerms: _*))
      .select(col("doc_id"), col("tok"), col("dl"), col("tf"))
    scoreAndRank(tf, qTerms, nDocs, avgDl, k, k1, b)
  }

  /** MAXIMAL MARGINAL RELEVANCE re-rank (Carbonell & Goldstein 1998)
    * — the diversification step a RAG pipeline runs between retrieval
    * and the context window: greedily pick the next result maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-picked, so five
    * near-identical top hits collapse to one plus four that add
    * information.
    *
    * Inputs arrive already bounded: `candidates` (qid, doc_id, rel)
    * is each query's top-N from any upstream ranker (WindowGroupLimit
    * prunes it before a row reaches this operator), and `sims`
    * (qid, doc_a, doc_b, sim) holds the N² within-query candidate
    * similarities — both ∝ |queries|·N(²), INDEPENDENT of corpus
    * size, which is what makes the greedy loop safe to unroll into
    * the plan. The selection depth is a compile-time constant, so the
    * loop becomes `select` declarative stages (per-qid anti-join →
    * max-sim aggregate → argmax window); every stage shuffles only
    * candidate-grain rows.
    *
    * Exactness: `rel` and `sim` arrive pre-rounded (6 decimals), and
    * the MMR score is computed in EXACT DECIMAL — λ·rel − (1−λ)·msim
    * over 6-dp inputs is a 7-dp decimal, which double arithmetic
    * would park within an ulp of every 6-dp rounding boundary (half
    * of all products end in …5·10⁻⁷), exactly where engine round()
    * implementations disagree. Decimal keeps the score exact, the
    * argmax compares exact values with the doc_id tiebreak, and the
    * emitted double is the exact 7-dp value — no rounding anywhere.
    *
    * Each step eagerly materializes its selection (|queries|·step
    * rows — bounded): the fold references the previous selection
    * three times per step (anti-join, sim join, union), so leaving it
    * lazy re-plans step i−1's subtree 3× per step — an exponential
    * plan tree (measured: 267 exchanges at depth 5 vs 2 per step
    * materialized). */
  def mmrRerank(candidates: DataFrame, sims: DataFrame,
      lambda: BigDecimal, select: Int): DataFrame = {
    require(select >= 1, s"select must be >= 1: $select")
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1]: $lambda")
    val oneMinus = BigDecimal(1) - lambda
    val wRel = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("doc_id").asc)
    val first = candidates
      .withColumn("rk", row_number().over(wRel))
      .filter(col("rk") === 1)
      .select(col("qid"), col("doc_id"), lit(1).as("rank"),
        col("rel").cast("decimal(20,6)").cast("decimal(24,7)")
          .as("mmr"))
      .localCheckpoint(eager = true)
    (2 to select).foldLeft(first) { (selected, i) =>
      val selSet = selected.select(col("qid"), col("doc_id"))
      val remaining = candidates
        .join(selSet, Seq("qid", "doc_id"), "left_anti")
      // LEFT join to sims: a candidate pair absent from `sims` scores
      // sim = 0 instead of silently vanishing from every rank >= 2.
      // The 0 floor is the THRESHOLD-SPARSIFICATION contract: sims
      // dropped by a nonnegative cutoff are "below threshold ~ 0",
      // and those missing pairs are exactly the diverse candidates
      // MMR exists to surface. Callers whose sims carry MEANINGFUL
      // negatives (anti-aligned embeddings) must pass full pairwise
      // coverage — a 0 floor would rank an unknown pair as MORE
      // redundant than an explicit negative one.
      val scored = remaining
        .join(selSet.toDF("qid", "sel_doc"), Seq("qid"))
        .join(sims.toDF("qid", "doc_id", "sel_doc", "sim"),
          Seq("qid", "doc_id", "sel_doc"), "left")
        .groupBy(col("qid"), col("doc_id"), col("rel"))
        .agg(max(coalesce(col("sim"), lit(0.0))).as("msim"))
        .withColumn("mmr",
          (lit(lambda) * col("rel").cast("decimal(20,6)") -
            lit(oneMinus) * col("msim").cast("decimal(20,6)"))
            .cast("decimal(24,7)"))
      val wMmr = Window.partitionBy(col("qid"))
        .orderBy(col("mmr").desc, col("doc_id").asc)
      val next = scored.withColumn("rk", row_number().over(wMmr))
        .filter(col("rk") === 1)
        .select(col("qid"), col("doc_id"), lit(i).as("rank"),
          col("mmr"))
      selected.unionByName(next).localCheckpoint(eager = true)
    }
  }
}
