package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vectors

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, per the standard ANN playbook:
  *  - [[bruteForceTopK]]: exact scan — cosine against a (broadcast)
  *    query point, then TakeOrderedAndProject. On a cluster this is a
  *    single pass over the vectors with k results per partition and k
  *    at the driver; the correct baseline and the recall oracle.
  *  - [[lshTopK]] / [[lshNearDupPairs]]: random-hyperplane LSH — bucket
  *    vectors by sign pattern, search only within the probe's bucket
  *    (plus optionally neighboring buckets). Sub-linear candidate sets
  *    at 100 TB at the cost of recall; bucket id is computed per-row,
  *    the join key is the bucket — no cartesian anywhere.
  */
object Similarity {

  /** Exact top-k by cosine against the single query row selected by
    * `queryFilter` (e.g. vec_id = 0). The query side is one row, so
    * the join is a broadcast nested loop over a 1-row build side —
    * effectively a map. Output: vec_id, cos (rounded for float-safe
    * comparison; ordering uses the exact value). */
  def bruteForceTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding"))
    emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .withColumn("cos",
        vectors.cosineSimilarity(
          vectors.toDouble(col("embedding")),
          vectors.toDouble(col("q_embedding"))))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos"), 6).as("cos"))
  }

  /** Approximate per-vector top-k neighbors via hyperplane LSH:
    * bucket every vector, join within buckets, rank per probe.
    * Smaller `nPlanes` → bigger buckets → higher recall, more work. */
  def lshTopK(emb: DataFrame, nPlanes: Int, k: Int, seed: Int = 42): DataFrame = {
    val bucketed = emb.select(
      col("vec_id"), col("embedding"),
      vectors.hyperplaneBucket(col("embedding"), nPlanes, seed).as("bucket"))
    val a = bucketed.toDF("vec_id", "embedding", "bucket")
    val b = bucketed.toDF("nb_id", "nb_embedding", "bucket")
    val pairs = a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("nb_id"))
      .withColumn("cos", vectors.cosineSimilarity(
        vectors.toDouble(col("embedding")),
        vectors.toDouble(col("nb_embedding"))))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nb_id"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("vec_id"), col("nb_id"), round(col("cos"), 6).as("cos"),
        col("rnk"))
  }

  /** Exact near-duplicate vector pairs (cos >= threshold). This is the
    * small-data / oracle baseline: an explicit all-pairs join. The
    * scale path is [[lshNearDupPairs]]. */
  def nearDupPairsExact(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", vectors.cosineSimilarity(
        vectors.toDouble(col("e_a")), vectors.toDouble(col("e_b"))))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** LSH-pruned near-duplicate pairs: only pairs sharing a bucket are
    * scored. Candidates scale with bucket occupancy, not n². */
  def lshNearDupPairs(emb: DataFrame, threshold: Double, nPlanes: Int,
      seed: Int = 42): DataFrame = {
    val bucketed = emb.select(
      col("vec_id"), col("embedding"),
      vectors.hyperplaneBucket(col("embedding"), nPlanes, seed).as("bucket"))
    val a = bucketed.toDF("id_a", "e_a", "bucket")
    val b = bucketed.toDF("id_b", "e_b", "bucket")
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", vectors.cosineSimilarity(
        vectors.toDouble(col("e_a")), vectors.toDouble(col("e_b"))))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .distinct()
  }
}
