package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.{text, vectors}

class FunctionsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("tokens: lowercase, trim, drop empties") {
    import spark.implicits._
    Seq("  Hello   WORLD  ", "", "one").toDF("text")
      .select(text.tokens(col("text")))
      .as[Seq[String]].collect().toList shouldBe
      List(Seq("hello", "world"), Seq.empty, Seq("one"))
  }

  test("wordShingles: n-grams with set semantics; short docs empty") {
    import spark.implicits._
    Seq("a b c b a b", "a", "").toDF("text")
      .select(text.wordShingles(text.tokens(col("text")), 2))
      .as[Seq[String]].collect().toList shouldBe
      List(Seq("a b", "b c", "c b", "b a"), Seq.empty, Seq.empty)
  }

  test("quality score components behave at the boundaries") {
    import spark.implicits._
    val rows = Seq(
      "the cat sat on the mat with a hat and more stopwords of it",
      "!!!! .... ;;;; ????",
      "").toDF("text")
      .select(
        text.qualityScore(col("text")).as("q"),
        text.stopwordRatio(col("text")).as("stop"),
        text.meanTokenLen(col("text")).as("mtl"))
      .collect()
    val good = rows(0); val junk = rows(1); val empty = rows(2)
    good.getDouble(0) should be > junk.getDouble(0)
    empty.getDouble(1) shouldBe 0.0 // stopwordRatio safe on empty
    empty.getDouble(2) shouldBe 0.0 // meanTokenLen safe on empty
    junk.getDouble(0) should (be >= 0.0 and be <= 1.0)
  }

  test("predictedLang picks the marker-word argmax deterministically") {
    import spark.implicits._
    Seq("the cat and the dog of it", "der hund ist und das",
      "el que la de los").toDF("text")
      .select(text.predictedLang(col("text")))
      .as[String].collect().toList shouldBe List("en", "de", "es")
  }

  test("projectIdFromTopic: both spellings match, negatives are null") {
    import spark.implicits._
    // the reference's own probe cases (pulsar_remote_inspector.py:
    // 188-195, ranges --test-topic at :709-716): unanchored search,
    // digits required, no-match → null (publish then defaults to 1)
    Seq(
      "persistent://eventbus/org-1/post-ingestion-495",
      "persistent://eventbus/org-1/ingestion-7",
      "post-ingestion-00123-suffix",
      "persistent://eventbus/org-1/email-send", // no ingestion segment
      "persistent://eventbus/org-1/post-ingestion-x", // no digits
      "ingestion-" // digits missing entirely
    ).toDF("topic")
      .select(graft.gen.Generator.projectIdFromTopic(col("topic")))
      .as[Option[Int]].collect().toList shouldBe
      List(Some(495), Some(7), Some(123), None, None, None)
  }

  test("campaignRange matches generate_campaign_range semantics") {
    import spark.implicits._
    Seq((1000, 20), (5, 1), (7, 0), (9, -3)).toDF("start", "count")
      .select(graft.gen.Generator.campaignRange(col("start"), col("count")))
      .as[Seq[Int]].collect().toList shouldBe
      List((1000 until 1020).toList, List(5), Nil, Nil)
  }

  test("redactPii replaces every class and leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      "mail a@b.co and c.d+x@e-f.org twice",
      "call 555-123-4567 now",
      "host 192.168.0.1 up",
      "nothing sensitive here",
      "mix a@b.co 555-123-4567 10.0.0.7").toDF("t")
      .select(text.redactPii(col("t")).as("red"),
        text.piiCount(col("t"), text.emailRe).as("e"),
        text.piiCount(col("t"), text.phoneRe).as("p"),
        text.piiCount(col("t"), text.ipv4Re).as("i"))
      .as[(String, Long, Long, Long)].collect().toList
    rows(0) shouldBe ("mail <EMAIL> and <EMAIL> twice", 2L, 0L, 0L)
    rows(1) shouldBe ("call <PHONE> now", 0L, 1L, 0L)
    rows(2) shouldBe ("host <IP> up", 0L, 0L, 1L)
    rows(3) shouldBe ("nothing sensitive here", 0L, 0L, 0L)
    rows(4) shouldBe ("mix <EMAIL> <PHONE> <IP>", 1L, 1L, 1L)
  }

  test("flagContaminated: bigram hit flags; short docs never flag; empty set rejected") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the key agg path"), // contains benchmark bigram "key agg"
      (2L, "a clean document"),
      (3L, "key"), // too short for any bigram
      (4L, "agg key reversed order")).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .flagContaminated(docs, "text", 2, Seq("key agg"))
      .select("doc_id", "contaminated").as[(Long, Boolean)]
      .collect().toMap
    out shouldBe Map(1L -> true, 2L -> false, 3L -> false, 4L -> false)
    an[IllegalArgumentException] should be thrownBy
      graft.operators.Dedup.flagContaminated(docs, "text", 2, Nil)
    // the join form (for benchmark sets too large to inline) must
    // produce identical flags
    val benchDf = Seq("key agg").toDF("shingle")
    graft.operators.Dedup
      .flagContaminatedJoin(docs, "doc_id", "text", 2, benchDf)
      .select("doc_id", "contaminated").as[(Long, Boolean)]
      .collect().toMap shouldBe out
  }

  test("vector math: dot, norms, distances agree with Scala") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(-1.0, 0.5, 2.0)
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        vectors.dotProduct(col("a"), col("b")).as("dot"),
        vectors.l2Norm(col("a")).as("na"),
        vectors.squaredL2Distance(col("a"), col("b")).as("d2"),
        vectors.cosineSimilarity(col("a"), col("b")).as("cos"))
      .collect().head
    row.getDouble(0) shouldBe (1.0 * -1 + 2 * 0.5 + 3 * 2)
    row.getDouble(1) shouldBe math.sqrt(14.0)
    row.getDouble(2) shouldBe (4.0 + 2.25 + 1.0)
    row.getDouble(3) shouldBe row.getDouble(0) /
      (row.getDouble(1) * math.sqrt(1 + 0.25 + 4))
  }

  test("dupNgramFraction: repetition scores high, short/empty docs score zero") {
    import spark.implicits._
    val fracs = Seq(
      "",                       // no tokens
      "a b",                    // fewer than n tokens
      "a b c",                  // exactly one trigram, trivially distinct
      "x y z x y z x y z",      // 7 trigrams, 3 distinct -> 1 - 3/7
      "u v w a b c d e f")      // all distinct -> 0
      .toDF("text")
      .select(text.dupNgramFraction(text.tokens(col("text")), 3))
      .as[Double].collect()
    fracs(0) shouldBe 0.0
    fracs(1) shouldBe 0.0
    fracs(2) shouldBe 0.0
    fracs(3) shouldBe math.rint((1.0 - 3.0 / 7.0) * 1e6) / 1e6 +- 1e-9
    fracs(4) shouldBe 0.0
  }

  test("docFingerprint is order-sensitive and deterministic") {
    import spark.implicits._
    val fps = Seq("alpha beta", "beta alpha", "alpha beta").toDF("text")
      .select(text.docFingerprint(col("text")))
      .as[Long].collect()
    fps(0) shouldBe fps(2)
    fps(0) should not be fps(1)
  }

  test("observe() meters a prep pass in-flight — no second scan for the audit counters") {
    import spark.implicits._
    // the 100 TB shape for pipeline metrics: counters ride the same
    // pass as the transformation (Observation), instead of a separate
    // count()/agg job re-reading the corpus
    val docs = Seq(
      "contact me at a@b.co or c@d.org",
      "clean text only",
      "one more a@b.co").toDF("text")
    val obs = new org.apache.spark.sql.Observation("prep")
    val redacted = docs
      .observe(obs, count(lit(1)).as("rows"),
        sum(text.piiCount(col("text"), text.emailRe)).as("emails"))
      .select(text.redactPii(col("text")).as("text"))
      .collect()
    redacted.count(_.getString(0).contains("<EMAIL>")) shouldBe 2
    obs.get("rows") shouldBe 3L
    obs.get("emails") shouldBe 3L
  }

  test("SQL-registered text kernels match the Column API (tokenize, word_shingles, simhash60)") {
    import spark.implicits._
    Seq("The quick  brown fox", "the QUICK brown fox", "", "  one ")
      .toDF("text").createOrReplaceTempView("fn_sql_docs")
    val viaSql = spark.sql(
      """SELECT tokenize(text) AS t, word_shingles(text, 2) AS s,
        |  simhash60(tokenize(text)) AS h
        |FROM fn_sql_docs""".stripMargin)
      .as[(Seq[String], Seq[String], Long)].collect()
    val viaCols = spark.table("fn_sql_docs")
      .select(text.tokens(col("text")).as("t"),
        text.wordShinglesFast(col("text"), 2).as("s"),
        graft.operators.Dedup.simhashFast(text.tokens(col("text"))).as("h"))
      .as[(Seq[String], Seq[String], Long)].collect()
    viaSql shouldBe viaCols
    viaSql.head._1 shouldBe Seq("the", "quick", "brown", "fox")
    viaSql.head._2 shouldBe Seq("the quick", "quick brown", "brown fox")
    // same normalized token stream → same fingerprint across casings
    viaSql(0)._3 shouldBe viaSql(1)._3
  }

  test("int8 quantization: codes bounded, reconstruction within scale/2, zero vector safe") {
    import spark.implicits._
    val vecs = Seq(
      Seq(0.5f, -3.25f, 0.0f, 127.0f),
      Seq(-1e-4f, 2e-4f, -3e-4f, 5e-5f), // tiny magnitudes
      Seq(0.0f, 0.0f, 0.0f, 0.0f)) // all-zero: scale floor, no NaN
      .toDF("v")
    val rows = vecs
      .withColumn("scale", vectors.quantizeScale(col("v")))
      .withColumn("q", vectors.quantizeInt8(col("v"), col("scale")))
      .withColumn("deq", vectors.dequantizeInt8(col("q"), col("scale")))
      .as[(Seq[Float], Double, Seq[Int], Seq[Double])].collect()
    rows.foreach { case (v, scale, q, deq) =>
      scale should be > 0.0
      q.foreach(c => math.abs(c) should be <= 127)
      // |x - deq| <= scale/2 + eps: the defining property of
      // floor(x/s + 0.5) * s rounding
      v.zip(deq).foreach { case (x, d) =>
        math.abs(x.toDouble - d) should be <= scale / 2 + 1e-12
      }
    }
    // the all-zero vector quantizes to exact zeros
    rows.last._3.forall(_ == 0) shouldBe true
    rows.last._4.forall(_ == 0.0) shouldBe true
  }

  test("int8 quantization properties hold on random vectors (one batch plan)") {
    import spark.implicits._
    import org.scalacheck.Gen
    val seed = org.scalacheck.rng.Seed(100L)
    // magnitudes spanning 12 orders, mixed signs, varied dims —
    // the CodecSpec convention: generate with ScalaCheck, evaluate
    // in ONE DataFrame (not a job per sample)
    val vecGen = for {
      n <- Gen.choose(1, 64)
      exp <- Gen.choose(-6, 6)
      v <- Gen.listOfN(n, Gen.choose(-1.0, 1.0)
        .map(x => (x * math.pow(10.0, exp)).toFloat))
    } yield v
    val vecs = Gen.listOfN(300, vecGen)
      .pureApply(Gen.Parameters.default, seed)
    val rows = vecs.toDF("v")
      .withColumn("scale", vectors.quantizeScale(col("v")))
      .withColumn("q", vectors.quantizeInt8(col("v"), col("scale")))
      .withColumn("deq", vectors.dequantizeInt8(col("q"), col("scale")))
      .as[(Seq[Float], Double, Seq[Int], Seq[Double])].collect()
    rows.length shouldBe 300
    rows.foreach { case (v, scale, q, deq) =>
      scale should be > 0.0
      q.foreach(c => math.abs(c) should be <= 127)
      v.zip(deq).foreach { case (x, d) =>
        math.abs(x.toDouble - d) should be <= scale / 2 + scale * 1e-9
      }
    }
  }

  test("urls.canonicalize: fragment, utm params, case-fold, edge shapes") {
    import spark.implicits._
    import graft.functions.urls
    val cases = Seq(
      // utm-only query collapses to the bare URL
      "https://A.Example.COM/Path/x?utm_source=a&utm_medium=b#frag" ->
        "https://a.example.com/Path/x",
      // non-utm params survive in order; interleaved utm dropped
      "https://h.com/p?id=3&utm_campaign=c&q=Y" ->
        "https://h.com/p?id=3&q=Y",
      // no query, no fragment: identity modulo authority case-fold
      "HTTPS://HOST.com/UPPER/Path" -> "https://host.com/UPPER/Path",
      // empty params from && runs are dropped
      "https://h.com/p?&&id=1&&" -> "https://h.com/p?id=1",
      // '?' with only utm params disappears entirely
      "https://h.com/p?utm_x=1" -> "https://h.com/p",
      // no scheme://authority: treated as all-path, passed through
      "not a url" -> "not a url")
    val got = cases.map(_._1).toDF("url")
      .select(urls.canonicalize(col("url"))).as[String].collect().toList
    got shouldBe cases.map(_._2).toList
  }

  test("urls.host: lower-cased authority; empty without scheme") {
    import spark.implicits._
    import graft.functions.urls
    Seq("https://WWW.Site.org:8080/a?b#c", "relative/path", "")
      .toDF("url").select(urls.host(col("url")))
      .as[String].collect().toList shouldBe
      List("www.site.org:8080", "", "")
  }

  test("url kernels ≡ HOF parity on edge battery and synthesized URLs") {
    import spark.implicits._
    import graft.functions.urls
    val edges = Seq(
      "https://A.Example.COM/Path/x?utm_source=a&utm_medium=b#frag",
      "https://h.com/p?id=3&utm_campaign=c&q=Y",
      "HTTPS://HOST.com/UPPER/Path", "https://h.com/p?&&id=1&&",
      "https://h.com/p?utm_x=1", "not a url", "", "#lead", "x://",
      "https:///no-authority/p?a=1", "ftp+ssh://U.V/w?utm_a=1&b=2#f",
      "https://h.com/p?", "https://h.com/p?#", "https://h.com",
      "9scheme://bad.start", "sch eme://spaced", "https://h.com/p?utm_",
      "https://h.com/p?a=%C3%9C&utm_b=1", "https://Ü.example/p?x=1")
    // the q110 synthesis shape, swept over the modulus space
    val synth = (0L until 300L).map { id =>
      val host = (if (id % 2 == 0) s"SRC${id % 20}" else s"src${id % 20}") +
        ".example.com"
      val q = (id % 3) match {
        case 0 => s"?utm_source=feed&utm_medium=m${id % 7}"
        case 1 => s"?id=${id % 10}&utm_campaign=c${id % 4}"
        case _ => ""
      }
      val frag = if (id % 5 == 0) s"#sec${id % 4}" else ""
      s"https://$host/xx/page/${id % 50}$q$frag"
    }
    val rows = (edges ++ synth).toDF("url")
      .select(
        urls.canonicalize(col("url")).as("ck"),
        urls.canonicalizeHof(col("url")).as("ch"),
        urls.host(col("url")).as("hk"),
        urls.hostHof(col("url")).as("hh"))
      .as[(String, String, String, String)].collect()
    rows.foreach { case (ck, ch, hk, hh) =>
      ck shouldBe ch
      hk shouldBe hh
    }
  }

  test("tokenChunks: boundaries, tail length, overlap, empty doc") {
    import spark.implicits._
    // 10 tokens, window 4, stride 3 → 1 + ceil(6/3) = 3 chunks at
    // starts 1/4/7, all full-width (the last window reaches token 10
    // exactly); 11 tokens → a 4th chunk at start 10 with the 2-token
    // tail
    val toks10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val toks11 = (1 to 11).map(i => s"t$i").mkString(" ")
    val rows = Seq((1L, toks10), (2L, "a b"), (3L, ""), (4L, toks11))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(text.tokenChunks(text.tokens(col("text")), 4, 3)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.start_tok"),
        col("c.n_toks"))
      .as[(Long, Int, Int, Int)].collect().sorted
    rows shouldBe Seq(
      (1L, 0, 1, 4), (1L, 1, 4, 4), (1L, 2, 7, 4),
      (2L, 0, 1, 2), // short doc → one chunk; empty doc → no rows
      (4L, 0, 1, 4), (4L, 1, 4, 4), (4L, 2, 7, 4), (4L, 3, 10, 2))
  }

  test("tokenChunks: fingerprints are the slice's rolling fingerprint") {
    import spark.implicits._
    import graft.functions.hashes
    // overlapping chunks of the same doc must hash their OWN slices:
    // chunk 0 = tokens 1..4, chunk 1 = tokens 4..7 — compare against
    // a direct rollingFingerprint of each slice
    val doc = Seq(("a b c d e f g")).toDF("text")
    val got = doc.select(
      explode(text.tokenChunks(text.tokens(col("text")), 4, 3)).as("c"))
      .select(col("c.chunk_idx"), col("c.fp")).as[(Int, Long)]
      .collect().toMap
    val direct = doc.select(
      hashes.rollingFingerprint(slice(text.tokens(col("text")), 1, 4))
        .as("a"),
      hashes.rollingFingerprint(slice(text.tokens(col("text")), 4, 4))
        .as("b")).as[(Long, Long)].collect()(0)
    got(0) shouldBe direct._1 // (a b c d)
    got(1) shouldBe direct._2 // (d e f g)
    got(0) should not be got(1)
  }
}
