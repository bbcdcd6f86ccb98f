package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Dedup
import graft.sources.{Layout, StoreLease}

/** Single-writer lease for the at-rest stores: a second concurrent
  * writer fails LOUDLY at open, a crashed writer's lease is
  * reclaimable after staleness, and the wired-in store writers
  * (clustered segments, near-dup index ingest/compaction) all take
  * it. */
class LeaseSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("acquire/release: second writer fails loudly naming the holder; release is owner-verified") {
    val root = Files.createTempDirectory("graft_lease_").toString + "/store"
    StoreLease.acquire(spark, root, "writer-a")
    StoreLease.holder(spark, root).map(_._1) shouldBe Some("writer-a")
    val ex = intercept[IllegalStateException] {
      StoreLease.acquire(spark, root, "writer-b")
    }
    ex.getMessage should include("write-leased by writer-a")
    // another owner must not be able to release the holder's lease
    an[IllegalArgumentException] should be thrownBy
      StoreLease.release(spark, root, "writer-b")
    StoreLease.release(spark, root, "writer-a")
    StoreLease.holder(spark, root) shouldBe None
    // released: the next writer proceeds
    StoreLease.acquire(spark, root, "writer-b")
    StoreLease.release(spark, root, "writer-b")
  }

  test("a crashed writer's stale lease is reclaimed; a live one is not") {
    val root = Files.createTempDirectory("graft_lease_").toString + "/store"
    StoreLease.acquire(spark, root, "crashed-writer")
    // live lease: even a long-suffering waiter must not steal it
    an[IllegalStateException] should be thrownBy
      StoreLease.acquire(spark, root, "waiter", staleAfterMs = 60000L)
    // stale threshold 0: anything already written is reclaimable
    Thread.sleep(5)
    StoreLease.acquire(spark, root, "reclaimer", staleAfterMs = 1L)
    StoreLease.holder(spark, root).map(_._1) shouldBe Some("reclaimer")
    StoreLease.release(spark, root, "reclaimer")
  }

  test("withLease releases on every exit path, including a thrown body") {
    val root = Files.createTempDirectory("graft_lease_").toString + "/store"
    an[RuntimeException] should be thrownBy
      StoreLease.withLease(spark, root, "thrower") {
        throw new RuntimeException("body failed")
      }
    StoreLease.holder(spark, root) shouldBe None
  }

  test("clusteredAppend and compact fail loudly while another writer holds the store lease") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lease_seg_").toString + "/store"
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
    Layout.clusteredAppend(df, root, "base", 2, col("k"))
    StoreLease.acquire(spark, root, "other-ingest")
    try {
      val ex = intercept[IllegalStateException] {
        Layout.clusteredAppend(df, root, "s2", 2, col("k"))
      }
      ex.getMessage should include("other-ingest")
      an[IllegalStateException] should be thrownBy
        Layout.compact(spark, root, 2, col("k"))
    } finally StoreLease.release(spark, root, "other-ingest")
    // released: both proceed, and compact's swap leaves no lease behind
    Layout.clusteredAppend(df, root, "s2", 2, col("k"))
    Layout.compact(spark, root, 2, col("k"))
    StoreLease.holder(spark, root) shouldBe None
    spark.read.parquet(root).count() shouldBe 200L
  }

  test("near-dup index ingest and compaction fail loudly while another writer holds the index lease") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_lease_nd_").toString
    val idx = root + "/idx"
    Dedup.writeNearDupIndex(
      Seq((1L, "the quick brown fox jumps over the lazy dog tonight"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 2, 64, 32, idx)
    val batch = Seq(
      (10L, "totally new material never indexed before anywhere"))
      .toDF("doc_id", "text")
    StoreLease.acquire(spark, idx, "other-stream")
    try {
      val ex = intercept[IllegalStateException] {
        Dedup.ingestBatchAgainst(spark, batch, "doc_id", "text", idx,
          2, 64, 32, 0.5, commitTag = Some("b9"))
      }
      ex.getMessage should include("other-stream")
      an[IllegalStateException] should be thrownBy
        Dedup.compactNearDupIndex(spark, idx)
    } finally StoreLease.release(spark, idx, "other-stream")
    // released: ingest proceeds and the lease is clean afterwards
    Dedup.ingestBatchAgainst(spark, batch, "doc_id", "text", idx,
      2, 64, 32, 0.5, commitTag = Some("b9"))
    StoreLease.holder(spark, idx) shouldBe None
  }
}
