package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.text
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("pairs count with positional multiplicity; merges apply left-to-right") {
    // "<a><a><a>": pair "<a><a>" at TWO positions (the Spark loop's
    // transform(sequence(...)) enumeration), merged left-to-right
    // non-overlapping to ["<aa>", "<a>"]
    Bpe.train(Seq(("<a><a><a>", 1L)), 1) shouldBe
      Seq((1, "<a><a>", "<aa>", 2L))
    Bpe.train(Seq(("<a><a><a>", 1L)), 2)(1) shouldBe
      ((2, "<aa><a>", "<aaa>", 1L))
  }

  test("selection is count desc, then pair asc in UTF-8 byte order") {
    Bpe.train(Seq(("<b><c>", 3L), ("<a><d>", 3L)), 1)
      .head._2 shouldBe "<a><d>"
    // freq-weighting dominates position count
    Bpe.train(Seq(("<b><c>", 5L), ("<a><d>", 3L)), 1)
      .head shouldBe ((1, "<b><c>", "<bc>", 5L))
    // utf8Lt is byte order, not code-unit order: U+FFFD (3-byte
    // UTF-8, ef bf bd) sorts ABOVE U+10000 (4-byte, f0 90 80 80)
    // in Java's compareTo (surrogate D800 < FFFD) but BELOW it in
    // UTF-8 bytes — the order Spark's UTF8String uses
    Bpe.utf8Lt("�", new String(Character.toChars(0x10000))) shouldBe true
    ("�" < new String(Character.toChars(0x10000))) shouldBe false
  }

  test("running out of pairs fails loudly, matching the Spark loop") {
    intercept[IllegalArgumentException] {
      Bpe.train(Seq(("<a>", 2L)), 1)
    }.getMessage should include("no pairs left")
  }

  test("train matches a naive per-step recount on random vocabularies (differential)") {
    // The naive reference recounts every pair from scratch each step
    // and applies the merge with java.lang.String.replace — literal,
    // left-to-right, non-overlapping: exactly the Spark loop's
    // replace() semantics. Any staleness bug in the incremental
    // trainer's pair->words index diverges from this.
    def naive(words: Seq[(String, Long)], n: Int)
        : Seq[(Int, String, String, Long)] = {
      var cur = words
      val out = Seq.newBuilder[(Int, String, String, Long)]
      var step = 1
      while (step <= n) {
        val pc = scala.collection.mutable.HashMap.empty[String, Long]
        cur.foreach { case (w, f) =>
          val syms = w.split("(?<=>)(?=<)")
          var i = 0
          while (i < syms.length - 1) {
            val p = syms(i) + syms(i + 1)
            pc.update(p, pc.getOrElse(p, 0L) + f)
            i += 1
          }
        }
        require(pc.nonEmpty, "naive: ran dry (size the case below)")
        var bestP: String = null
        var bestC = Long.MinValue
        pc.foreach { case (p, c) =>
          if (c > bestC || (c == bestC && Bpe.utf8Lt(p, bestP))) {
            bestP = p; bestC = c
          }
        }
        val merged = bestP.replace("><", "")
        out += ((step, bestP, merged, bestC))
        cur = cur.map { case (w, f) => (w.replace(bestP, merged), f) }
        step += 1
      }
      out.result()
    }
    val rnd = new scala.util.Random(7321)
    (1 to 40).foreach { trial =>
      val alphabet = "abc"
      val nWords = 3 + rnd.nextInt(10)
      val words = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(6)
        val w = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length)))
          .map(c => s"<$c>").mkString
        (w, 1L + rnd.nextInt(5))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      // capacity-safe merge count: total adjacent positions is an
      // upper bound on learnable rules only loosely; probe the naive
      // reference for this vocabulary's true capacity first
      val cap = {
        var c = 0
        try { naive(words, 50); c = 50 }
        catch { case _: IllegalArgumentException =>
          var lo = 0; var hi = 50
          while (lo < hi - 1) {
            val mid = (lo + hi) / 2
            try { naive(words, mid); lo = mid }
            catch { case _: IllegalArgumentException => hi = mid }
          }
          c = lo
        }
        c
      }
      val n = math.max(1, math.min(cap, 1 + rnd.nextInt(12)))
      if (cap >= 1)
        withClue(s"trial $trial words=$words n=$n: ") {
          Bpe.train(words, n) shouldBe naive(words, n)
        }
    }
  }

  test("driver-side trainer matches the per-step Spark loop (q146 parity, gate fixture)") {
    val dir = "/root/testdata/sf0.001"
    val s = spark
    import s.implicits._
    // the exact word table bpeMerges builds (same tokens, filters,
    // bracket rewrite) — collected once, trained in memory
    val words = Tables(spark, dir, "documents")
      .select(explode(text.tokens(col("text"))).as("w"))
      .filter(!col("w").rlike("[<>\\x01]"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= 2)
      .select(regexp_replace(col("w"), "(.)", "<$1>").as("str"),
        col("freq"))
      .as[(String, Long)].collect().toSeq
    val driver = Bpe.train(words, 5)
    val sparkLoop = SparkEntry.queries("q146_bpe_train")(spark, dir)
      .as[(Int, String, String, Long)].collect().toSeq
      .sortBy(_._1)
    driver shouldBe sparkLoop
    // and a deep driver-side run keeps producing well-formed rules
    // (every pair splits into two atoms, merged = pair sans one "><")
    // — 80 is just under the sf0.001 vocabulary's ~90-merge capacity
    val deep = Bpe.train(words, 80)
    deep.size shouldBe 80
    deep.foreach { case (_, p, m, _) =>
      m shouldBe p.replace("><", "")
      p.count(_ == '<') should be >= 2
    }
  }
}
