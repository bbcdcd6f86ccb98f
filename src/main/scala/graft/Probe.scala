package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{text, vectors}
import graft.operators.{Dedup, Similarity}

/** Ad-hoc plan-fragment timing harness (dev tool, not part of the
  * driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("docs_tokenize") {
      docs.select(size(text.tokens(col("text"))).as("n")).agg(sum("n")).head(); 1L
    }
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 2)
    time("shingle_sets") {
      sets.select(size(col("shingles")).as("n")).agg(sum("n")).head(); 1L
    }
    val sh = sets.select(col("doc"), explode(col("shingles")).as("shingle"))
    time("explode_count") { sh.count() }
    val posting = sh.groupBy("shingle")
      .agg(sort_array(collect_list(col("doc"))).as("docs"))
      .filter(size(col("docs")) >= 2)
    time("posting_lists") { posting.count() }
    time("posting_pair_volume") {
      // long arithmetic: a >65k-doc posting list would overflow Int
      posting.select((size(col("docs")).cast("long") *
          (size(col("docs")).cast("long") - 1) / 2).as("p"))
        .agg(sum("p")).head().getAs[Number](0).longValue()
    }
    val pairExpr = flatten(transform(col("docs"), (x, i) =>
      transform(slice(col("docs"), i + lit(2), size(col("docs"))),
        y => struct(x.as("doc_a"), y.as("doc_b")))))
    val inter = posting.select(explode(pairExpr).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter_g"))
    time("pair_agg") { inter.count() }
    time("full_q27") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.18, Some(100)).count()
    }
    // q30 stage breakdown
    val sets30 = Dedup.shingleSets(docs, "doc_id", "text", 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("q30_sets_materialize") { sets30.count() }
    val sh30 = sets30.select(col("doc"), explode(col("shingles")).as("shingle"))
      .select(col("doc"), xxhash64(col("shingle")).as("h0"))
    // the ONE shared signature definition — a re-implementation here
    // could silently drift from what q30 actually runs
    val sigs = Dedup.signaturesFromBaseHashes(sh30, 64)
    time("q30_signatures") { sigs.count() }
    // minBandMatches = 2, matching minhashNearDupPairs' real call —
    // the default 1 would time a candidate set orders of magnitude
    // larger than the stage q30 executes
    val cand = Dedup.minhashCandidatePairs(sigs, 32, 64, minBandMatches = 2)
    time("q30_candidates") { cand.count() }
    time("q30_full") {
      Dedup.minhashNearDupPairs(docs, "doc_id", "text", 2, 64, 32, 0.5).count()
    }
    spark.stop()
  }
}

/** Occupancy-vs-scale measurement (dev tool): candidate-stage volumes
  * for the bucketed dedup/ANN operators (q30 MinHash bands, q46
  * SimHash pigeonhole, q54 auto-sized hyperplane LSH) measured at
  * growing corpus sizes, against the formulas PLANS.md argues from.
  * Two sweeps:
  *  - NATURAL: the sf0.001 → sf0.01 → sf0.1 fixtures (100× span, the
  *    real generator distribution);
  *  - SYNTHETIC beyond sf0.1: documents re-sampled token-by-token from
  *    the fixture's own vocabulary with per-(doc, replica, position)
  *    hashes (same vocabulary and length distribution, so shingle dfs
  *    keep growing linearly — the dense-corpus regime); embeddings
  *    replicated with deterministic per-component perturbation (local
  *    density preserved, replicas spread across hyperplanes).
  * Prints one PROBE_SCALE line per measurement (markdown-ready cells).
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Σ over buckets of C(c,2) — the rows a same-bucket self-join
    // emits, i.e. the cost driver of every bucketed candidate stage
    def bucketPairs(buckets: DataFrame): (Long, Long, Long) = {
      val r = buckets.groupBy(buckets.columns.map(col): _*)
        .agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).as("pairs"),
          max(col("c")).as("maxc"), count(lit(1)).as("nbuckets"))
        .head()
      (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue(),
        r.getAs[Number](2).longValue())
    }

    def measureDocs(tag: String, docs: DataFrame): Unit = {
      val n = docs.count()
      // q30: band-bucket emissions + surviving >=2-band candidates.
      // sets is consumed exactly once (while sigs materializes), so
      // persisting it would only add memory pressure to the very
      // occupancy measurement being taken.
      val sets = Dedup.shingleSets(docs, "doc_id", "text", 2)
      val sh = sets.select(col("doc"), explode(col("shingles")).as("s"))
        .select(col("doc"), xxhash64(col("s")).as("h0"))
      val sigs = Dedup.signaturesFromBaseHashes(sh, 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val banded = sigs.select(col("doc"),
        posexplode(transform(sequence(lit(0), lit(31)),
          b => xxhash64(b, concat_ws(",",
            slice(col("signature"), b * 2 + 1, lit(2))))))
          .as(Seq("band", "band_hash")))
      val (q30emit, q30max, _) = bucketPairs(banded.select("band", "band_hash"))
      val q30cand = Dedup.minhashCandidatePairs(sigs, 32, 64,
        minBandMatches = 2).count()
      sigs.unpersist(blocking = false)
      // q46: pigeonhole bucket emissions at the minimal (6,1) and the
      // widened (10,3) parameterizations (same exact output)
      def simhashEmissions(blocks: Int, keyBlocks: Int): (Long, Long) = {
        val width = 60
        val blockBits = width / blocks
        val mask = (1L << blockBits) - 1
        val fp = docs.select(col("doc_id").as("doc"),
          Dedup.simhashFast(text.tokens(col("text")), width).as("fp"))
        def blockVal(b: Int) =
          shiftrightunsigned(col("fp"), b * blockBits).bitwiseAND(lit(mask))
        val keys = (0 until blocks).combinations(keyBlocks).toSeq.map(combo =>
          combo.foldLeft(lit(0L))((acc, b) =>
            shiftleft(acc, blockBits).bitwiseOR(blockVal(b))))
        val blocked = fp.select(col("doc"),
          posexplode(array(keys: _*)).as(Seq("tbl", "bkey")))
        val (p, m, _) = bucketPairs(blocked.select("tbl", "bkey"))
        (p, m)
      }
      val (q46e61, q46m61) = simhashEmissions(6, 1)
      val (q46e103, q46m103) = simhashEmissions(10, 3)
      println(s"PROBE_SCALE docs $tag n=$n " +
        s"q30_emissions=$q30emit q30_max_bucket=$q30max q30_candidates=$q30cand " +
        s"q46_61_emissions=$q46e61 q46_61_max=$q46m61 " +
        s"q46_103_emissions=$q46e103 q46_103_max=$q46m103")
    }

    def measureEmb(tag: String, emb: DataFrame): Unit = {
      val n = emb.count()
      val nPlanes = Similarity.planesForSize(n)
      val planes = vectors.planeMatrix(54L, nPlanes, 64)
      val buckets = emb.select(
        vectors.hyperplaneBucketFast(col("embedding"), planes).as("b"))
      val (pairs, maxc, nb) = bucketPairs(buckets)
      println(s"PROBE_SCALE emb $tag n=$n planes=$nPlanes " +
        s"q54_inbucket_pairs=$pairs max_bucket=$maxc buckets=$nb " +
        s"pred_pairs=${n.toDouble * 31 / 2}")
    }

    // `ProbeScale spans` runs only the q81 sweep; no arg = everything
    val mode = args.headOption.getOrElse("full")

    // ── natural sweep over the generated fixtures ──
    if (mode == "full") {
      for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
        val dir = s"/root/testdata/$sf"
        if (new java.io.File(dir).isDirectory) {
          measureDocs(sf, Tables(spark, dir, "documents"))
          measureEmb(sf, Tables(spark, dir, "embeddings"))
        }
      }
    }

    // ── synthetic sweep beyond sf0.1 ──
    val docs01 = Tables(spark, "/root/testdata/sf0.1", "documents")
    val vocab = docs01
      .select(explode(text.tokens(col("text"))).as("t"))
      .distinct().orderBy("t").as[String].collect()
    val vocabLit = array(vocab.map(lit(_)): _*)
    def resampleDocs(replicas: Int): DataFrame =
      docs01
        .select(col("doc_id"), size(text.tokens(col("text"))).as("len"))
        .crossJoin(spark.range(replicas).toDF("rep"))
        .select(
          (col("doc_id") * replicas + col("rep")).as("doc_id"),
          array_join(transform(sequence(lit(1), col("len")),
            i => element_at(vocabLit,
              (pmod(xxhash64(col("doc_id"), col("rep"), i),
                lit(vocab.length)) + 1).cast("int"))), " ").as("text"))
    val emb01 = Tables(spark, "/root/testdata/sf0.1", "embeddings")
    def perturbEmb(replicas: Int): DataFrame =
      emb01
        .crossJoin(spark.range(replicas).toDF("rep"))
        .select(
          (col("vec_id") * replicas + col("rep")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + lit(0.5) *
              ((pmod(xxhash64(col("vec_id"), col("rep"), i), lit(2001))
                - 1000).cast("double") / 1000.0))).as("embedding"))

    // growth regime B: the VOCABULARY grows with the corpus (each
    // replica draws from its own suffixed token space — the way a real
    // corpus grows by adding new content domains, where shingle dfs
    // stay ~constant instead of growing linearly)
    def resampleDocsScaledVocab(replicas: Int): DataFrame =
      docs01
        .select(col("doc_id"), size(text.tokens(col("text"))).as("len"))
        .crossJoin(spark.range(replicas).toDF("rep"))
        .select(
          (col("doc_id") * replicas + col("rep")).as("doc_id"),
          array_join(transform(sequence(lit(1), col("len")),
            i => concat(element_at(vocabLit,
              (pmod(xxhash64(col("doc_id"), col("rep"), i),
                lit(vocab.length)) + 1).cast("int")),
              lit("~"), col("rep").cast("string"))), " ").as("text"))

    // q81's cost drivers at scale: the gram-support table size, the
    // shared fraction, and the hottest gram's position count (the
    // join-back skew driver). Same two growth regimes as measureDocs.
    def measureSpans(tag: String, docs: DataFrame): Unit = {
      val pos = docs.select(col("doc_id").as("doc"),
        explode(text.positionalShingles(text.tokens(col("text")), 5))
          .as("g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val positions = pos.count()
      val r = pos.groupBy("g")
        .agg(countDistinct(col("doc")).as("d"), count(lit(1)).as("c"))
        .agg(count(lit(1)).as("grams"),
          sum(when(col("d") >= 2, 1L).otherwise(0L)).as("shared"),
          max(col("c")).as("hottest"))
        .head()
      pos.unpersist(blocking = false)
      println(s"PROBE spans/$tag positions=$positions " +
        s"grams=${r.getLong(0)} shared=${r.getLong(1)} " +
        s"hottest_gram_positions=${r.getLong(2)}")
    }

    if (mode == "full") {
      for (r <- Seq(1, 4, 10)) measureDocs(s"dense${r}x", resampleDocs(r))
      for (r <- Seq(4, 10)) measureDocs(s"grow${r}x", resampleDocsScaledVocab(r))
      for (r <- Seq(1, 10, 100)) measureEmb(s"synth${r}x", perturbEmb(r))
    }
    for (r <- Seq(1, 4, 10)) measureSpans(s"dense${r}x", resampleDocs(r))
    for (r <- Seq(4, 10)) measureSpans(s"grow${r}x", resampleDocsScaledVocab(r))
    spark.stop()
  }
}
