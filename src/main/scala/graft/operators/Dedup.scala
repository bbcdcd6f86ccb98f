package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.text

/** Deduplication family for the documents pipeline: exact, n-gram
  * Jaccard (exact, inverted-index), MinHash+LSH (approximate, the
  * 100 TB path), and SimHash.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison.
  * Exact dedup is one hash aggregate; Jaccard/MinHash build an
  * inverted index (explode → self-join on the index key) so only
  * documents sharing a shingle/band ever meet in the join, and the
  * band join is a shuffle on a high-cardinality key. Ultra-frequent
  * shingles (stop-shingles) are droppable via `maxShingleDf` to cap
  * skew on a 1000-executor cluster.
  */
object Dedup {

  /** Exact dedup on a set of columns: keep the row with the minimum
    * `idCol` per duplicate group (deterministic keeper — a bare
    * dropDuplicates keeps an arbitrary row, which would never be
    * oracle-stable). */
  def exactGroups(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Exact near-dup pairs by n-gram Jaccard similarity >= threshold,
    * via an inverted index on shingles:
    *   docs → distinct shingles → explode → self-join on shingle
    *   → pair intersection counts → |A∩B| / (|A|+|B|-|A∩B|).
    * Exact (same result as brute force) but only materializes pairs
    * that share at least one shingle. `maxShingleDf` drops shingles
    * appearing in more than that many docs (skew guard; None = exact).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = docs.select(
        col(idCol).as("doc"),
        explode(text.wordShingles(text.tokens(col(textCol)), n)).as("shingle"))
    val filtered = maxShingleDf match {
      case Some(m) =>
        // inverted-index skew guard: drop stop-shingles
        val hot = sh.groupBy("shingle").count().filter(col("count") > m)
          .select("shingle")
        sh.join(broadcast(hot), Seq("shingle"), "left_anti")
      case None => sh
    }
    val sizes = filtered.groupBy("doc").agg(count(lit(1)).as("sz"))
    val a = filtered.toDF("doc_a", "shingle")
    val b = filtered.toDF("doc_b", "shingle")
    val inter = a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("doc_a", "sz_a"), "doc_a")
      .join(sizes.toDF("doc_b", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "inter", "sz_a", "sz_b", "jaccard")
  }

  /** MinHash signatures: k independent permutations approximated by
    * xxhash64(shingle, seed=i); signature[i] = min over the doc's
    * shingles. Computed with one explode + one hash aggregate (the
    * k mins fold into an array column, no k-fold shuffle). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, k: Int): DataFrame = {
    val sh = docs.select(
      col(idCol).as("doc"),
      explode(text.wordShingles(text.tokens(col(textCol)), shingleN))
        .as("shingle"))
    val hashed = sh.withColumn("hashes",
      array((0 until k).map(i => xxhash64(lit(i), col("shingle"))): _*))
    // element-wise min across the doc's shingle hash arrays
    hashed.groupBy("doc")
      .agg((0 until k).map(i => min(col("hashes")(i)).as(s"h$i")).head,
        (1 until k).map(i => min(col("hashes")(i)).as(s"h$i")): _*)
      .select(col("doc"),
        array((0 until k).map(i => col(s"h$i")): _*).as("signature"))
  }

  /** MinHash LSH candidate pairs: split the k-wide signature into
    * `bands` bands of k/bands rows, hash each band, and join docs
    * landing in the same (band, bandHash) bucket. Approximate: recall
    * is governed by the (bands, rows) S-curve; callers verify
    * candidates with [[ngramJaccardPairs]]-style exact scoring. */
  def minhashCandidatePairs(signatures: DataFrame, bands: Int): DataFrame = {
    val k = signatures.select(size(col("signature"))).first().getInt(0)
    require(k % bands == 0, s"bands=$bands must divide signature width $k")
    val r = k / bands
    val banded = signatures.select(
      col("doc"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, concat_ws(",",
          slice(col("signature"), b * r + 1, lit(r))))))
        .as(Seq("band", "band_hash")))
    val l = banded.toDF("doc_a", "band", "band_hash")
    val rr = banded.toDF("doc_b", "band", "band_hash")
    l.join(rr, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** 64-bit SimHash over the token stream: per token a 64-bit hash
    * votes ±1 on each bit position; the sign of each accumulated
    * position becomes the output bit. Pure fold — no shuffle.
    * (Bit positions are unrolled at plan-build time because Spark's
    * shift functions take a literal shift amount.) */
  def simhash(textCol: Column): Column = {
    val hashes = transform(text.tokens(textCol), t => xxhash64(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => array((0 until 64).map { j =>
        element_at(acc, j + 1) +
          when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L))
      }: _*))
    val powers = array((0 until 64).map(j => lit(1L << j)): _*)
    aggregate(
      zip_with(votes, powers, (v, p) => when(v >= 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
