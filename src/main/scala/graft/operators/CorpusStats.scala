package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.text

/** Corpus-statistics signals: per-document measures that need a pass
  * over the WHOLE corpus (document frequencies), unlike the pure
  * scan-time signals in graft.functions.text (quality ratios,
  * repetition, lang-id). The reference's tooling has no corpus-level
  * text statistics; this family covers the training-data-pipeline
  * side (OOV/rare-token filtering, IDF-style weighting inputs).
  */
object CorpusStats {

  /** Per-document rare-token counts against corpus document
    * frequency: how many of a document's DISTINCT tokens appear in at
    * most `maxDf` documents corpus-wide. High counts flag gibberish,
    * boilerplate IDs, or mojibake — the "too many out-of-vocabulary
    * tokens" quality cut — with integer-only arithmetic so the result
    * is exactly reproducible (no float IDF in the gate; callers can
    * derive ln(N/df) weights from the same `df` table).
    *
    * Scale shape: `array_distinct` runs BEFORE the explode, so the
    * (doc, token) stream is map-side-deduplicated without a shuffle;
    * the DF table is one hash aggregate on token (map-side partial
    * combine collapses each partition's vocabulary first); the join
    * back re-uses the token partitioning and AQE broadcasts the DF
    * table when the vocabulary is small. Three shuffles total —
    * tokens, join, per-doc aggregate — each on a high-cardinality
    * key, none carrying document bodies.
    *
    * Documents with zero tokens produce no output row (they have no
    * (doc, token) pairs); left-join from the corpus to re-attach them
    * if the downstream filter needs explicit zeros. */
  def rareTokenStats(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1: $maxDf")
    // the tokenize + explode pass feeds both the DF aggregate and the
    // join probe side — persist so it runs once (same pattern as
    // Dedup.ngramJaccardPairs); the per-doc result is materialized
    // before the cache is released
    val pairs = docs.select(
      col(idCol).as("doc"),
      explode(array_distinct(text.tokens(col(textCol)))).as("tok"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfTab = pairs.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val out = pairs.join(dfTab, "tok")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("distinct_tokens"),
        sum(when(col("df") <= maxDf, 1L).otherwise(0L)).as("rare_tokens"))
      .localCheckpoint(eager = true)
    pairs.unpersist(blocking = false)
    out
  }
}
