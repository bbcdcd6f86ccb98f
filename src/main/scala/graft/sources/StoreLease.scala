package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession

/** Single-writer LEASE for the at-rest stores (near-dup signature
  * index, clustered/ANN segment stores): two concurrent writers
  * appending to the same store would interleave segment files and
  * commit markers with no loud failure — the lease turns that silent
  * interleaving into an immediate, named error at open.
  *
  * Protocol: a writer atomically creates a `<root>.lease` SIBLING
  * file (create-if-absent is the one atomic primitive every
  * HDFS-compatible FS offers) carrying `owner \t epoch-millis`,
  * holds it across the mutation, and deletes it on close. A second
  * writer's create fails → it reads the holder and throws loudly. A
  * crashed writer's lease is reclaimable once it is older than
  * `staleAfterMs` — the reclaim deletes and re-creates, so two
  * waiters racing a reclaim still serialize on the create.
  *
  * The lease is a SIBLING of the store root, not a file inside it,
  * deliberately: overwrite-mode writes and compaction swaps
  * delete/replace the store directory itself, which would destroy an
  * in-store lease mid-hold and reopen the race exactly when it
  * matters. A sibling survives the swap and is released normally.
  *
  * Scope honesty (the Layout.compact contract): this serializes
  * WRITERS that follow the protocol. Readers never take it (parquet
  * files are immutable once landed), and a rogue writer that skips
  * it is not stopped — real multi-writer atomicity comes from a
  * table format's commit protocol, which is the seam this path plugs
  * into. */
object StoreLease {

  /** A writer crashed harder than any sane batch runs: 30 min. */
  val DefaultStaleAfterMs: Long = 30L * 60 * 1000

  private def leasePath(root: String) =
    new org.apache.hadoop.fs.Path(
      root.replaceAll("/+$", "") + ".lease")

  /** Acquire the store's writer lease or fail loudly naming the
    * holder. A lease older than `staleAfterMs` is reclaimed (the
    * crashed-writer path). */
  def acquire(spark: SparkSession, root: String, owner: String,
      staleAfterMs: Long = DefaultStaleAfterMs): Unit = {
    val p = leasePath(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def tryCreate(): Boolean =
      try {
        val out = fs.create(p, false)
        out.write(s"$owner\t${System.currentTimeMillis()}"
          .getBytes(StandardCharsets.UTF_8))
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return
    val (heldBy, ts) = read(fs, p).getOrElse(("<unreadable>", 0L))
    val ageMs = System.currentTimeMillis() - ts
    if (ageMs <= staleAfterMs)
      throw new IllegalStateException(
        s"store $root is write-leased by $heldBy (${ageMs / 1000}s ago) — " +
          "a second concurrent writer would interleave segment files " +
          "unsafely; wait for release or, if the holder crashed, for " +
          s"staleness (${staleAfterMs / 1000}s)")
    // stale: the holder crashed — reclaim. delete + create-if-absent
    // keeps two racing reclaimers serialized on the create.
    fs.delete(p, false)
    if (!tryCreate()) {
      val now = read(fs, p).map(_._1).getOrElse("<unreadable>")
      throw new IllegalStateException(
        s"store $root: lost the stale-lease reclaim race to $now — retry")
    }
  }

  /** Release a held lease. Only the acquiring owner may release —
    * deleting another writer's lease would reopen the race the lease
    * exists to close. A missing lease file is a no-op: the holder's
    * own overwrite/compact swap may have replaced the sibling's
    * store, and `release` must still succeed on that exit path. */
  def release(spark: SparkSession, root: String, owner: String): Unit = {
    val p = leasePath(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    read(fs, p).foreach { case (heldBy, _) =>
      require(heldBy == owner,
        s"release: lease on $root is held by $heldBy, not $owner")
      fs.delete(p, false)
    }
  }

  /** Hold the store's writer lease across `body` — released on every
    * exit path. `ownerHint` names the operation in the conflict
    * error; a per-call nonce keeps release verifiable. */
  def withLease[T](spark: SparkSession, root: String, ownerHint: String,
      staleAfterMs: Long = DefaultStaleAfterMs)(body: => T): T = {
    val owner =
      s"$ownerHint#${java.util.UUID.randomUUID().toString.take(8)}"
    acquire(spark, root, owner, staleAfterMs)
    try body
    finally release(spark, root, owner)
  }

  /** Force-delete a store's lease regardless of owner — the
    * OPERATOR's break-glass verb (`Main lease --break`) for a writer
    * known dead before the staleness window expires. Never called by
    * library code: writers release their own leases, and
    * [[acquire]]'s stale reclaim handles crashed ones. */
  def break_(spark: SparkSession, root: String): Unit = {
    val p = leasePath(root)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
    ()
  }

  /** The current (owner, acquiredAtMs), if a lease is held. */
  def holder(spark: SparkSession, root: String): Option[(String, Long)] = {
    val p = leasePath(root)
    read(p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def read(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[(String, Long)] =
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val bytes = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0, bytes) finally in.close()
      new String(bytes, StandardCharsets.UTF_8).split("\t") match {
        case Array(o, t) => Some((o, t.toLong))
        case _ => Some(("<malformed>", 0L))
      }
    } catch { case _: java.io.IOException => None }
}
