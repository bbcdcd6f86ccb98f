package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Blocklist

/** The Aho-Corasick kernel behind q185: scan results must equal the
  * naive per-pattern reference on any input (the oracle gates the
  * same equivalence against DuckDB strpos at corpus grain). */
class BlocklistSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Per-pattern reference: distinct patterns present + min 1-based
    * first-occurrence position — the oracle's semantics. */
  private def naive(text: String, pats: Seq[String]): (Int, Int) = {
    val present = pats.filter(text.contains)
    val pos =
      if (present.isEmpty) 0
      else present.map(p => text.indexOf(p) + 1).min
    (present.size, pos)
  }

  test("automaton equals the naive reference, incl. nested and overlapping patterns") {
    val pats = IndexedSeq("table", "table part", "le pa", "aa", "spark")
    val ac = new Blocklist.AhoCorasick(pats)
    // nested ("table" inside "table part") and cross-boundary
    // ("le pa" spans the two words) all surface from one pass
    ac.scan("xtable party") shouldBe naive("xtable party", pats)
    ac.scan("xtable party") shouldBe ((3, 2))
    // overlapping occurrences of the same pattern count once, and
    // the FIRST occurrence (not the last) sets the position
    ac.scan("zzaaa") shouldBe ((1, 3))
    // no match at all
    ac.scan("nothing here") shouldBe ((0, 0))
    // empty text
    ac.scan("") shouldBe ((0, 0))
    // randomized adversarial check on a tiny alphabet (dense
    // self-overlap regime — the hard case for failure links)
    val rnd = new scala.util.Random(185)
    val rpats = IndexedSeq("a", "ab", "ba", "aab", "abab", "bbb")
    val rac = new Blocklist.AhoCorasick(rpats)
    (0 until 300).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(40))(
        if (rnd.nextBoolean()) 'a' else 'b').mkString
      rac.scan(text) shouldBe naive(text, rpats)
    }
  }

  test("chain-nested prefix family stays correct under output links") {
    // the pathological class the output-link construction exists
    // for: every node of a^k's trie is a suffix-output site for all
    // shorter patterns — the eager suffix-merge was quadratic here,
    // the link chain is linear and must emit the identical verdicts
    val pats = (1 to 20).map("a" * _)
    val ac = new Blocklist.AhoCorasick(pats)
    ac.scan("a" * 50) shouldBe naive("a" * 50, pats)
    ac.scan("a" * 50) shouldBe ((20, 1))
    ac.scan("b" + "a" * 7 + "b") shouldBe naive("b" + "a" * 7 + "b", pats)
    ac.scan("b" + "a" * 7 + "b") shouldBe ((7, 2))
  }

  test("construction guards fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      new Blocklist.AhoCorasick(IndexedSeq.empty)
    an[IllegalArgumentException] should be thrownBy
      new Blocklist.AhoCorasick(IndexedSeq("ok", ""))
    an[IllegalArgumentException] should be thrownBy
      new Blocklist.AhoCorasick(
        IndexedSeq("a" * (Blocklist.maxPatternChars + 1)))
  }

  test("tag: per-doc verdicts with NULL first_pos on clean docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the table part is here"),
      (2L, "completely clean"),
      (3L, "spark at position one")).toDF("doc_id", "text")
    val out = Blocklist.tag(docs, "doc_id", "text",
      Seq("table", "table part", "spark"))
      .orderBy("doc_id").collect()
    out(0).getLong(1) shouldBe 2L // table + table part
    out(0).getInt(2) shouldBe 5
    out(0).getBoolean(3) shouldBe true
    out(1).getLong(1) shouldBe 0L
    out(1).isNullAt(2) shouldBe true
    out(1).getBoolean(3) shouldBe false
    out(2).getInt(2) shouldBe 1
  }
}
