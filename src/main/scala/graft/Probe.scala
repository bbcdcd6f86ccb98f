package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.text
import graft.operators.Dedup

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
