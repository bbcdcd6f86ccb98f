package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern substring tagging — the blocklist gate crawl
  * pipelines run before anything else touches a page (taboo-word
  * lists run to thousands of entries in the public corpus recipes,
  * e.g. the C4 cleanup's "bad words" filter).
  *
  * The kernel is the classic Aho-Corasick automaton (Aho & Corasick
  * 1975, public algorithm): a pattern trie with failure links scans
  * each document in ONE pass over its characters, independent of the
  * pattern count — vs the obvious per-pattern `contains` chain whose
  * cost is O(patterns × length) per document. At thousands of
  * patterns the chain is three orders of magnitude more text work;
  * at the handful the oracle replays, both agree exactly (which is
  * what lets DuckDB gate the automaton with per-pattern `strpos`).
  *
  * Scale shape: the pattern list is a bounded, driver-held artifact
  * (size-guarded loudly); the automaton ships in the task closure
  * and builds once per partition (the codec-seam convention —
  * construction is linear in total pattern chars and not worth a
  * broadcast lifecycle at the guarded sizes). The scan itself is a
  * narrow per-row map: zero shuffle, the corpus is read once.
  */
object Blocklist {

  /** Total pattern characters accepted before the loud failure: the
    * closure-shipped list must stay a metadata-sized artifact. Real
    * blocklists are ~10^4 short strings, orders below this. */
  val maxPatternChars: Int = 1 << 20

  /** Aho-Corasick matcher over exact character strings (the match
    * unit is the Java char — callers normalize case/width upstream
    * if they want folded matching, same contract as `contains`).
    * Immutable after construction; one instance scans any number of
    * texts. */
  final class AhoCorasick(patterns: IndexedSeq[String])
      extends Serializable {
    require(patterns.nonEmpty, "empty pattern list")
    require(patterns.forall(_.nonEmpty),
      "empty-string pattern would match every position")
    require(patterns.map(_.length.toLong).sum <= maxPatternChars,
      s"pattern list exceeds $maxPatternChars total chars — " +
        "a blocklist is a bounded driver-held artifact")

    // trie: per-node char → child; built densely in insertion order
    private val children =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.HashMap.empty[Char, Int])
    private val ends = scala.collection.mutable.ArrayBuffer(
      List.empty[Int]) // pattern indices ending at this node
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var v = 0
      p.foreach { ch =>
        v = children(v).getOrElseUpdate(ch, {
          children += scala.collection.mutable.HashMap.empty[Char, Int]
          ends += Nil
          children.length - 1
        })
      }
      ends(v) = pi :: ends(v)
    }
    // failure links + OUTPUT LINKS, BFS order (standard
    // construction). Output links instead of eagerly merging each
    // node's suffix outputs into `ends`: the eager merge is
    // quadratic in pathological nested-pattern sets (every node of
    // "aaaa…a" carries all shorter patterns' indices), while
    // outLink(u) = the nearest proper-suffix node with its OWN
    // endings keeps construction linear — the scan walks the chain
    // and only ever visits nodes that emit
    private val fail = Array.fill(children.length)(0)
    private val outLink = Array.fill(children.length)(0)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      children(0).valuesIterator.foreach(queue.enqueue(_))
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        children(v).foreach { case (ch, u) =>
          var f = fail(v)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(u) = children(f).get(ch).filter(_ != u).getOrElse(0)
          outLink(u) =
            if (ends(fail(u)).nonEmpty) fail(u) else outLink(fail(u))
          queue.enqueue(u)
        }
      }
    }
    private val patLen = patterns.map(_.length).toArray

    /** One pass over `text`: (number of DISTINCT patterns present,
      * 1-based start position of the earliest match of any pattern,
      * 0 when nothing matches). The position is min over ALL match
      * starts — identical to `min(strpos(text, p))` over the present
      * patterns, which is what the oracle computes. */
    def scan(text: String): (Int, Int) = {
      val hit = new Array[Boolean](patLen.length)
      var nHit = 0
      var firstPos = 0
      var v = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (v != 0 && !children(v).contains(ch)) v = fail(v)
        v = children(v).getOrElse(ch, 0)
        // emit this node's OWN endings, then chase output links —
        // each hop lands on a node that emits, so the walk is
        // output-bounded, not suffix-depth-bounded
        var w = v
        while (w != 0) {
          var es = ends(w)
          while (es.nonEmpty) {
            val pi = es.head
            val start = i - patLen(pi) + 2 // 1-based
            if (!hit(pi)) { hit(pi) = true; nHit += 1 }
            if (firstPos == 0 || start < firstPos) firstPos = start
            es = es.tail
          }
          w = outLink(w)
        }
        i += 1
      }
      (nHit, firstPos)
    }
  }

  /** Tag every document with its blocklist verdict: (id, n_hit =
    * distinct patterns present, first_pos = 1-based earliest match
    * start or NULL, flagged). One narrow pass, zero shuffle. */
  def tag(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val pats = patterns.toIndexedSeq
    // construction guard runs on the DRIVER, before any task ships
    new AhoCorasick(pats)
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        val ac = new AhoCorasick(pats) // once per task, closure-built
        rows.map { r =>
          // NULL text is CLEAN (n_hit 0, not flagged) — the oracle's
          // strpos/LEFT JOIN semantics over NULL, not an NPE
          val t = r.getString(1)
          if (t == null) (r.getLong(0), 0L, 0, false)
          else {
            val (n, pos) = ac.scan(t)
            (r.getLong(0), n.toLong, pos, n > 0)
          }
        }
      }
      .toDF("doc_id", "n_hit", "first_pos", "flagged")
      .withColumn("first_pos",
        when(col("first_pos") > 0, col("first_pos")))
  }
}
