package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** PII redaction: pattern hits, multi-kind rows, and non-PII text
  * passing through untouched.
  */
class TextAnalysisSpec extends SparkSuite {

  import spark.implicits._

  private def redact(s: String): String =
    evalOne(TextAnalysis.redactPii(lit(s))).asInstanceOf[String]

  test("each pattern redacts its kind") {
    assert(redact("mail a.b+c@foo-bar.example.COM now") === "mail <EMAIL> now")
    assert(redact("host 192.168.0.1 down") === "host <IP> down")
    assert(redact("dial +79161234567 today") === "dial <PHONE> today")
  }

  test("mixed PII in one document, all kinds redacted") {
    assert(redact("x@y.io at 10.0.0.7 or +1234567890") === "<EMAIL> at <IP> or <PHONE>")
  }

  test("clean text and near-misses pass through untouched") {
    for (s <- Seq(
      "no pii here at all",
      "version 1.2.3 is not an ip",      // only three octets
      "+123 too short for a phone",
      "at sign @ alone is not an email"))
      assert(redact(s) === s)
  }

  test("PII patterns: clean text is a fixed point; one injection, one redaction (ScalaCheck)") {
    // the patterns are plain Java regex in Spark — property-test them at
    // the JVM level (fast), the Spark/oracle equivalence is covered by
    // the text_pii driver row
    import java.util.regex.Pattern
    def applyAll(s: String): String =
      TextAnalysis.piiPatterns.foldLeft(s) { case (t, (_, pat, repl)) =>
        Pattern.compile(pat).matcher(t).replaceAll(repl)
      }
    // letters+spaces only: no digit, '@' or '+' can form a PII match
    val cleanWord = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, Gen.alphaChar)).map(_.mkString)
    val genClean = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, cleanWord)).map(_.mkString(" "))
    val genPii = Gen.oneOf(
      Gen.choose(1, 9999).map(i => s"user$i@host$i.com" -> "<EMAIL>"),
      for (a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)) yield s"10.$a.$b.1" -> "<IP>",
      Gen.choose(1000000L, 999999999L).map(p => s"+$p" -> "<PHONE>"))
    val prop = Prop.forAll(genClean, genClean, genPii) { case (pre, post, (pii, token)) =>
      val cleanFixed = applyAll(s"$pre $post") == s"$pre $post"
      val injected = applyAll(s"$pre $pii $post") == s"$pre $token $post"
      cleanFixed && injected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("corpusProfile computes exact discrete percentiles per stratum") {
    // stratum a: lengths 1..10 tokens; p50 = value at rank ceil(5.0) = 5,
    // p90 = rank 9; stratum b: single doc
    val docs = (1 to 10).map(i => ("a", (1 to i).map(j => s"t$j").mkString(" "))) :+
      ("b", "one two three")
    val out = TextAnalysis.corpusProfile(docs.toDF("lang", "text"), "text", "lang")
      .orderBy("stratum").collect()
    val a = out(0)
    assert(a.getAs[Long]("n_docs") === 10)
    assert(a.getAs[Int]("p50_ws_tokens") === 5)
    assert(a.getAs[Int]("p90_ws_tokens") === 9)
    assert(a.getAs[Double]("mean_ws_tokens") === (1 to 10).sum.toDouble / 10)
    val b = out(1)
    assert(b.getAs[Int]("p50_ws_tokens") === 3)
    assert(b.getAs[Int]("p90_ws_tokens") === 3)
  }

  test("unigramNll matches a hand-computed unigram model with OOV floor") {
    // corpus: 8 tokens total; "a" x4, "b" x2, "c" x1, "d" x1.
    // topK = 2 keeps {a, b}; c and d go OOV at p = 0.5/8
    val docs = Seq((1L, "a a b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramNll(docs, "text", "doc_id", topK = 2)
      .orderBy("doc_id").collect()
    val scale = 1099511627776.0
    def fp(p: Double): Long = math.floor(-math.log(p) * scale).toLong
    val expected = ((2 * fp(4.0 / 8) + fp(2.0 / 8) + fp(0.5 / 8)) / scale / 4).toFloat
    for (r <- out) {
      assert(r.getAs[Int]("n_tokens") === 4)
      assert(r.getAs[Float]("nll_per_token") === expected) // both docs symmetric
    }
  }

  test("chunkTokens: coverage, overlap, and boundary sizes") {
    // n in {1, size-1, size, size+1, size+stride, 2*size} across docs
    val mk = (id: Long, n: Int) => (id, (0 until n).map(i => s"t$i").mkString(" "))
    val docs = Seq(mk(0L, 1), mk(1L, 31), mk(2L, 32), mk(3L, 33), mk(4L, 56), mk(5L, 64))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "text", "doc_id", chunkSize = 32, overlap = 8)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, String)].collect().toSeq
    val byDoc = out.groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    // chunk counts: 1 + ceil(max(0, n-32)/24)
    assert(byDoc.view.mapValues(_.length).toMap ==
      Map(0L -> 1, 1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3))
    for ((id, chunks) <- byDoc) {
      val n = docs.where(col("doc_id") === id)
        .select(size(split(col("text"), " "))).as[Int].head()
      // full coverage: stitching chunks, dropping each successor's
      // 8-token overlap, reproduces the original token stream
      val stitched = chunks.head._4.split(" ").toSeq ++
        chunks.tail.flatMap(_._4.split(" ").drop(8).toSeq)
      assert(stitched == (0 until n).map(i => s"t$i"), s"doc $id coverage")
      // consecutive chunks share exactly the 8-token overlap
      for (Seq(a, b) <- chunks.sliding(2) if chunks.length > 1)
        assert(a._4.split(" ").takeRight(8).toSeq == b._4.split(" ").take(8).toSeq)
      // every chunk is at most 32 tokens and reports its true size
      chunks.foreach(c => assert(c._3 == c._4.split(" ").length && c._3 <= 32))
    }
  }

  test("boilerplateMetrics marks cross-doc repeated n-grams and scores fractions") {
    // docs 1 and 2 share the same 3-token header; doc 3 is unique; doc 4
    // is too short for a 3-gram and must have no row
    val docs = Seq(
      (1L, "shared header line unique one alpha"),
      (2L, "shared header line unique two beta"),
      (3L, "entirely different content here now"),
      (4L, "too short")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateMetrics(docs, "text", "doc_id", n = 3, minDocs = 2)
      .select("doc_id", "n_grams", "n_boilerplate_grams")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // 6 tokens -> 4 distinct 3-grams each; "shared header line" AND
    // "header line unique" appear in both docs 1 and 2
    assert(got(1L) == (4, 2) && got(2L) == (4, 2))
    assert(got(3L) == (3, 0)) // 5 tokens -> 3 distinct 3-grams, none shared
    assert(!got.contains(4L))
  }

  test("bigramNllBackoff matches a hand-computed stupid-backoff model") {
    // corpus: doc1 "a b a b", doc2 "a b c"
    // bigrams (with <s>): (<s>,a):2 (a,b):3 (b,a):1 (b,c):1; total 7
    // contexts: <s>:2 a:3 b:2; targets: a:3 b:3 c:1
    // topK=3 keeps (a,b),( <s>,a),(b,a) — (b,a) beats (b,c) on the
    // (w1,w2) tie-break — so only (b,c) backs off
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramNllBackoff(df, "text", "doc_id", topK = 3)
      .orderBy("doc_id").collect()
    val d1 = got(0); val d2 = got(1)
    assert(d1.getAs[Int]("n_tokens") == 4 && d1.getAs[Int]("n_backoff") == 0)
    assert(d2.getAs[Int]("n_tokens") == 3 && d2.getAs[Int]("n_backoff") == 1)
    // doc1: -ln(2/2) - ln(3/3) - ln(1/2) - ln(3/3) = ln 2, /4 tokens
    assert(math.abs(d1.getAs[Float]("nll_per_token") - math.log(2.0) / 4) < 1e-6)
    // doc2: 0 + 0 + -ln(0.4 * 1/7) = ln 17.5, /3 tokens
    assert(math.abs(d2.getAs[Float]("nll_per_token") - math.log(17.5) / 3) < 1e-6)
  }

  test("bigramNllBackoff is deterministic under repartitioning (int64 grid)") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("u", "v", "w", "x", "y")
    val df = (0 until 40).map(i =>
      (i.toLong, Seq.fill(15)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bigramNllBackoff(d, "text", "doc_id", topK = 10)
        .orderBy("doc_id").as[(Long, Int, Int, Float)].collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(8)))
  }

  test("dedupUnits keeps each unit's first occurrence in order") {
    val df = Seq(
      (1L, "a b c d a b e f"),  // "a b" repeats at units 0 and 2
      (2L, "x y x y x y"),      // all three units identical
      (3L, "p q r s t")         // odd tail: last unit is the single "t"
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dedupUnits(df, "text", "doc_id", unitSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Int]("n_units"), r.getAs[Int]("n_kept"),
        r.getAs[String]("text_deduped")))
    assert(got(0) == ((4, 3, "a b c d e f")))
    assert(got(1) == ((3, 1, "x y")))
    assert(got(2) == ((3, 3, "p q r s t")))
  }

  test("dedupUnits at unitSize=1 is token-level first-occurrence dedup") {
    val df = Seq((1L, "b a b c a")).toDF("doc_id", "text")
    val r = TextAnalysis.dedupUnits(df, "text", "doc_id", unitSize = 1).collect()(0)
    assert(r.getAs[String]("text_deduped") == "b a c")
    assert(r.getAs[Int]("n_kept") == 3)
  }

  test("piiMetrics counts match the redactions") {
    val df = TextAnalysis.piiMetrics(
      Seq((1L, "a@b.co c@d.org 10.1.2.3"), (2L, "clean")).toDF("doc_id", "text"), "text")
    val r = df.orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_email") === 2)
    assert(r(0).getAs[Int]("n_ipv4") === 1)
    assert(r(0).getAs[Int]("n_phone") === 0)
    assert(r(0).getAs[String]("redacted") === "<EMAIL> <EMAIL> <IP>")
    assert(r(1).getAs[String]("redacted") === "clean")
  }

  test("tokenEntropy: uniform = log2(n), constant = 0, skewed matches hand computation") {
    val df = Seq(
      (1L, "a b c d"),        // 4 distinct of 4 -> exactly 2 bits, norm 1
      (2L, "spam spam spam"), // one token repeated -> 0 bits, norm 0
      (3L, "x"),              // single token -> 0 bits, norm defined 0
      (4L, "a a b c")         // counts (2,1,1) of n=4
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_distinct_tokens"),
        r.getAs[Double]("entropy"), r.getAs[Double]("norm_entropy")))
    assert(got(0)._1 == 4 && got(0)._2 == 4)
    assert(math.abs(got(0)._3 - 2.0) < 1e-12 && math.abs(got(0)._4 - 1.0) < 1e-12)
    assert(got(1) == ((3, 1, 0.0, 0.0)))
    assert(got(2) == ((1, 1, 0.0, 0.0)))
    // H = ln(4) - (2 ln 2 + 0 + 0)/4, in bits
    val h4 = (math.log(4) - 2 * math.log(2) / 4) / math.log(2)
    assert(math.abs(got(3)._3 - h4) < 1e-12)
    assert(math.abs(got(3)._4 - h4 / 2.0) < 1e-12)
  }

  test("tokenDrift: identical distributions give JS 0, disjoint give 1, one-sided strata drop") {
    val ref = Seq(
      ("en", "a a b c"), ("de", "x y"), ("only_ref", "zz zz")
    ).toDF("lang", "text")
    val cur = Seq(
      ("en", "c a b a"),   // same multiset as ref's en -> identical dist
      ("de", "p q")        // disjoint vocabulary -> maximal divergence
    ).toDF("lang", "text")
    val got = TextAnalysis.tokenDrift(ref, cur, "text", "lang")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq("de", "en")) // only_ref dropped
    val de = got(0); val en = got(1)
    assert(en._2 == 4 && en._3 == 4 && en._4 == 3)
    assert(math.abs(en._5) < 1e-12, s"identical distributions must have JS 0, got ${en._5}")
    assert(de._4 == 4)
    assert(math.abs(de._5 - 1.0) < 1e-12, s"disjoint vocabularies must have JS 1 bit, got ${de._5}")
  }

  test("tokenDrift detects a planted shift and is bounded by [0, 1]") {
    val ref = Seq(("en", "a b c d e f g h")).toDF("lang", "text")
    val cur = Seq(("en", "a b c d a b c d")).toDF("lang", "text")
    val js = TextAnalysis.tokenDrift(ref, cur, "text", "lang")
      .collect()(0).getDouble(4)
    assert(js > 0.1 && js < 1.0, s"shifted distribution should land strictly inside (0,1): $js")
  }

  test("topTerms ranks the exact vocabulary head with term-asc ties") {
    val df = Seq((1L, "b b b a a c"), (2L, "a z z z z")).toDF("doc_id", "text")
    val got = TextAnalysis.topTerms(df, "text", 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // z:4, a:3, b:3 (a before b on the tie), c:1 cut off
    assert(got.toSeq == Seq(("z", 4L, 1), ("a", 3L, 2), ("b", 3L, 3)))
  }

  test("topTermsSketch: Misra-Gries bounds hold and every heavy hitter is present") {
    val rnd = new scala.util.Random(5)
    // skewed stream: a few heavy terms over a long tail of singletons
    val heavy = Seq.fill(400)("the") ++ Seq.fill(200)("of") ++ Seq.fill(120)("and")
    val tail = (0 until 500).map(i => s"rare$i")
    val words = rnd.shuffle(heavy ++ tail)
    val docs = words.grouped(10).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(7)
    val n = words.size
    val cap = 25
    val est = TextAnalysis.topTermsSketch(docs, "text", cap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    // candidate set bounded by capacity x partitions
    assert(est.size <= cap * 7)
    // underestimate, within N/capacity of truth
    est.foreach { case (t, e) =>
      assert(e <= exact(t), s"$t overestimated: $e > ${exact(t)}")
      assert(exact(t) - e <= n / cap, s"$t error beyond the MG bound")
    }
    // guarantee: every term with true freq > N/capacity survives
    exact.filter(_._2 > n / cap).keys.foreach { t =>
      assert(est.contains(t), s"heavy hitter $t missing from the sketch")
    }
    // and the actual head is correctly identified by estimate order
    assert(est.toSeq.sortBy(-_._2).take(3).map(_._1).toSet == Set("the", "of", "and"))
  }

  test("tokenEntropy is invariant under token order and repartitioning") {
    val a = Seq((1L, "a a b c d d d e")).toDF("doc_id", "text")
    val b = Seq((1L, "d e d a c b d a")).toDF("doc_id", "text")
    val ra = TextAnalysis.tokenEntropy(a.repartition(7), "text", "doc_id").collect()(0)
    val rb = TextAnalysis.tokenEntropy(b, "text", "doc_id").collect()(0)
    assert(ra.getAs[Int]("n_tokens") == 8 && ra.getAs[Int]("n_distinct_tokens") == 5)
    // float-level agreement is the cross-engine contract; here the count
    // multisets are identical so doubles should agree to last-ulp noise
    assert(math.abs(ra.getAs[Double]("entropy") - rb.getAs[Double]("entropy")) < 1e-12)
  }

  test("gopherRules: each rule rejects its own failure mode and clean text passes") {
    val docs = Seq(
      (1L, "the quick cat sat down on a warm mat and it is fine here today"), // clean
      (2L, "one two"),                                        // word count
      (3L, "the cat # # # # # # a is"),                       // symbols
      (4L, "the a 111 222 333 444 555 666 777 888"),          // alpha frac
      (5L, "the a of supercalifragilistic expialidocious anthropomorphization " +
        "internationalization institutionalization characteristically " +
        "incomprehensibilities")                              // mean word len
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "text")
      .select("doc_id", "r_word_count", "r_word_len", "r_symbols", "r_alpha",
        "r_stopwords", "gopher_pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, true, true, true, true, true, true)))
    assert(!got(1)._2 && !got(1)._7)            // too short
    assert(!got(2)._4 && !got(2)._7)            // symbol-flooded
    assert(!got(3)._5 && !got(3)._7)            // number-flooded
    assert(!got(4)._3 && !got(4)._7)            // long tokens
  }

  test("countMin estimates never undercount and are exact absent collisions (randomized)") {
    val rnd = new scala.util.Random(61)
    // ~60-word vocab over 400 docs: tiny vs 1024 buckets, so most
    // terms see no collision and the min-of-depth-4 recovers exactly
    val vocab = (0 until 60).map(i => s"w$i")
    val docs = (0 until 400).map { i =>
      (i.toLong, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val exact = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").count()
      .as[(String, Long)].collect().toMap
    val sketch = TextAnalysis.countMinSketch(docs, "text")
    val probes = exact.keys.toSeq.toDF("term")
    val est = TextAnalysis.countMinLookup(sketch, probes)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t undercounted: ${est(t)} < $c")
    }
    // the overwhelming majority must be collision-free (exact)
    val exactHits = exact.count { case (t, c) => est(t) == c }
    assert(exactHits >= (exact.size * 0.9).toInt, s"only $exactHits/${exact.size} exact")
    // partitioning invariance (map-side combine is associative)
    val est2 = TextAnalysis.countMinLookup(
      TextAnalysis.countMinSketch(docs.repartition(13), "text"), probes)
      .as[(String, Long)].collect().toMap
    assert(est2 == est)
  }

  test("cdcChunks: boundaries from token hashes, full coverage, shift resistance") {
    def md24(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      ((h(0) & 0xffL) << 16) | ((h(1) & 0xffL) << 8) | (h(2) & 0xffL)
    }
    // 60 distinct tokens — with divisor 4, roughly a quarter are cuts
    val toks = (0 until 60).map(i => s"w$i")
    val text = toks.mkString(" ")
    // shifted twin: one token PREPENDED — CDC must re-sync, fixed-grid would not
    val docs = Seq((1L, text), (2L, "zzz " + text)).toDF("doc_id", "text")
    val out = TextAnalysis.cdcChunks(docs, "text", "doc_id", divisor = 4)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, Int, Long, Int)].collect().toSeq
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    // brute-force oracle for doc 1: boundary AFTER tokens with md24 % 4 == 0
    val wantChunks = collection.mutable.ArrayBuffer(collection.mutable.ArrayBuffer[String]())
    for (t <- toks) {
      wantChunks.last += t
      if (md24(t) % 4 == 0) wantChunks += collection.mutable.ArrayBuffer[String]()
    }
    val want = wantChunks.filter(_.nonEmpty).map(_.toSeq).toSeq
    assert(byDoc(1L).map(_._4).sum == 60, "full token coverage")
    assert(byDoc(1L).map(c => c._4) == want.map(_.length), "chunk sizes match the hash oracle")
    assert(byDoc(1L).map(_._5) == want.map(c => md24(c.mkString(" "))), "fingerprints replay")
    // start positions are the running token offsets
    assert(byDoc(1L).map(_._3) == want.map(_.length).scanLeft(0)(_ + _).dropRight(1))

    // shift resistance: every doc-1 chunk after the first boundary
    // reappears verbatim in doc 2, so its n_docs_sharing is 2
    val shared1 = byDoc(1L).drop(1).map(_._6)
    assert(shared1.nonEmpty && shared1.forall(_ == 2),
      s"post-edit chunks must re-sync across the shifted twin: $shared1")
    // the edited head chunk differs between the docs
    assert(byDoc(1L).head._5 != byDoc(2L).head._5)
  }

  test("cdcChunks is invariant under repartitioning") {
    val docs = Seq((1L, (0 until 40).map(i => s"w$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.cdcChunks(df, "text", "doc_id", divisor = 4)
        .as[(Long, Int, Int, Int, Long, Int)].collect().sortBy(c => (c._1, c._2)).toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("oovRate: exact top-v vocabulary membership, per-group token accounting") {
    // corpus counts: a×5, b×3, c×2, d×1 — top-2 vocab = {a, b}
    val docs = Seq(
      ("s1", "a a a b b"),
      ("s2", "a a b c c d")
    ).toDF("source", "text")
    val out = TextAnalysis.oovRate(docs, "text", "source", vocabSize = 2)
      .as[(String, Long, Long, Float)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("s1", 5L, 0L, 0.0f),
      ("s2", 6L, 3L, 0.5f))) // c c d out of vocab
  }

  test("oovRate tie order: count desc then term asc decides the vocab edge") {
    // b and c tie at 2; vocab of 2 takes {a, b} (term asc on the tie)
    val docs = Seq(("s", "a a a b b c c")).toDF("source", "text")
    val out = TextAnalysis.oovRate(docs, "text", "source", vocabSize = 2)
      .as[(String, Long, Long, Float)].collect().head
    assert(out == (("s", 7L, 2L, (2.0 / 7.0).toFloat)))
  }

  test("spanCorruption: sentinels round-trip — substituting targets back rebuilds the doc") {
    val docs = (1L to 5L)
      .map(i => (i, (0 until 40).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.spanCorruption(docs, "text", "doc_id", maskMod = 3)
      .as[(Long, Int, Int, String, String)].collect().sortBy(_._1).toSeq
    assert(out.size == 5)
    for ((id, nTokens, nSpans, input, target) <- out) {
      assert(nTokens == 40)
      // parse the target into sentinel -> span map
      val spanRx = "<extra_id_(\\d+)> ([^<]*)".r
      val spans = spanRx.findAllMatchIn(target)
        .map(m => m.group(1).toInt -> m.group(2).trim).toMap
      assert(spans.size == nSpans)
      assert(spans.keySet == (0 until nSpans).toSet, "sentinels numbered 0..n-1 in order")
      // substitute each sentinel in the input with its span: original doc
      val rebuilt = input.split(" ").flatMap { piece =>
        if (piece.startsWith("<extra_id_"))
          spans(piece.stripPrefix("<extra_id_").stripSuffix(">").toInt).split(" ").toSeq
        else Seq(piece)
      }.mkString(" ")
      val original = docs.where(col("doc_id") === id).select("text").as[String].head()
      assert(rebuilt == original, s"doc $id round-trip")
      // roughly a third of tokens masked across 40 tokens
      assert(nSpans >= 1, s"doc $id should have at least one masked span")
    }
  }

  test("spanCorruption handles the all-kept document (no spans, empty target)") {
    // tiny alphabet: find a doc whose tokens all hash to non-mask — force
    // it instead with maskMod large enough that the 3 positions miss
    val docs = Seq((7L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.spanCorruption(docs, "text", "doc_id", maskMod = 1000000)
      .as[(Long, Int, Int, String, String)].collect().head
    // mask probability 1e-6: these 3 specific hashes are not 0 mod 1e6
    assert(out == ((7L, 3, 0, "alpha beta gamma", "")))
  }

  test("vocabGrowth: hand-computed curve on a known stream") {
    // doc order: d1 = "a b a b", d2 = "c a", d3 = "d d d d" -> 10 tokens
    // firsts: a@0, b@1, c@4, d@6
    val docs = Seq((1L, "a b a b"), (2L, "c a"), (3L, "d d d d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs, "text", "doc_id")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    // boundary at decile d = d tokens (total 10): distinct with first < d
    assert(out == Seq(
      (1, 1L, 1L),   // a
      (2, 2L, 2L),   // a b
      (3, 3L, 2L),
      (4, 4L, 2L),
      (5, 5L, 3L),   // c enters at gi 4
      (6, 6L, 3L),
      (7, 7L, 4L),   // d enters at gi 6
      (8, 8L, 4L),
      (9, 9L, 4L),
      (10, 10L, 4L)))
  }

  test("collocations: PMI grid score matches a hand reference and ranks the glued pair first") {
    // "new york" always adjacent (6 times); "the the" frequent tokens but
    // dispersed -> low PMI. 3 filler docs widen the unigram table.
    val docs = Seq(
      (1L, "new york new york new york the cat"),
      (2L, "new york new york new york the dog the cat"),
      (3L, "the dog saw the cat and the dog ran"),
      (4L, "the cat the dog the fish")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 3, topK = 5)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // reference: counts over the exact same tokenization
    val toks = Seq("new york new york new york the cat",
      "new york new york new york the dog the cat",
      "the dog saw the cat and the dog ran",
      "the cat the dog the fish").map(_.split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bigrams = toks.flatMap(t => t.zip(t.tail))
    val n = toks.flatten.size.toLong
    val bTot = bigrams.size.toLong
    val bc = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def score(a: String, b: String): Long =
      (((bc((a, b)) * n) / uni(a)) * n * 1024L) / (uni(b) * bTot)
    assert(out.head._1 == "new" && out.head._2 == "york")
    out.foreach { case (a, b, cab, ca, cb, s) =>
      assert(cab == bc((a, b)) && ca == uni(a) && cb == uni(b))
      assert(s == score(a, b), s"score mismatch for ($a,$b)")
    }
    assert(out.map(_._6) == out.map(_._6).sorted.reverse)
  }

  test("kneserNeyNll: hand-computed closed rationals on a three-doc corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // c(<s>,a)=3, c(a,b)=2, c(a,c)=1; cv(<s>)=3 n1v=1; cv(a)=3 n1v=2;
    // n1w(a)=n1w(b)=n1w(c)=1; N1++=3
    def fp(num: Long, den: Long): Long =
      math.floor(-math.log(num.toDouble / den.toDouble) * 1099511627776.0).toLong
    val fpSA = fp(9L * 3 + 3 * 1 * 1, 4L * 3 * 3)  // max(4*3-3,0)=9
    val fpAB = fp(5L * 3 + 3 * 2 * 1, 36L)         // max(4*2-3,0)=5
    val fpAC = fp(1L * 3 + 3 * 2 * 1, 36L)         // max(4*1-3,0)=1
    val got = TextAnalysis.kneserNeyNll(docs, "text", "doc_id")
      .as[(Long, Int, Float)].collect().sortBy(_._1).toSeq
    def nll(fps: Seq[Long]): Float =
      ((fps.sum.toDouble / 1099511627776.0) / fps.size).toFloat
    assert(got == Seq(
      (1L, 2, nll(Seq(fpSA, fpAB))),
      (2L, 2, nll(Seq(fpSA, fpAB))),
      (3L, 2, nll(Seq(fpSA, fpAC)))))
    // discount mass: p(b|a) + p(c|a) < 1 (the freed 2d/c(a) mass covers
    // unseen continuations)
    assert((5.0 * 3 + 6) / 36 + (3.0 + 6) / 36 < 1.0)
  }

  test("lineDedup drops corpus-repeated lines and reassembles the rest in order") {
    import spark.implicits._
    def fp(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "a b c x y z"),   // "a b c" repeats (docs 1,2) -> dropped
      (2L, "a b c q r s"),   // both its lines repeat -> empty remainder
      (3L, "q r s t u v")    // "q r s" repeats (docs 2,3)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs, "text", "doc_id", width = 3, maxOcc = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, fp("x y z")),
      (2L, 2L, 2L, fp("")),
      (3L, 2L, 1L, fp("t u v"))))
  }

  test("mattr: hand-computed window distinct ratios; short docs excluded; length-unbiased") {
    val docs = Seq(
      (1L, "a b a b a b a b"),                      // 3 windows of [a b a b] -> 2 distinct each
      (2L, "t0 t1 t2 t3 t4 t5 t6 t7"),              // all distinct -> mattr exactly 1
      (3L, "a b c"),                                // shorter than the window -> excluded
      // same repetitive pattern at 4x the length: mattr must NOT fall
      (4L, Seq.fill(16)("a b").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.mattr(docs, "text", "doc_id", window = 4, stride = 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(3L))
    assert(got(1L) == ((1L, 8L, 3L, 6.0 / 12.0)))
    assert(got(2L) == ((2L, 8L, 3L, 1.0)))
    // doc 4 has 32 tokens -> 15 windows, each [a b a b] -> mattr 0.5,
    // identical to doc 1 despite 4x the length (raw TTR would be 2/32)
    assert(got(4L)._2 == 32L && got(4L)._4 == 0.5)
  }

  test("prefixCacheProfile: sorted-neighbor LCP equals the hand-built trie") {
    // shard s: sorted prompts [a b c], [a b d], [x y] -> LCPs 0, 2, 0;
    // trie nodes = 8 - 2 = 6; shard t: prefix case [a b] before [a b c]
    val docs = Seq(
      ("s", 1L, "a b c"), ("s", 2L, "a b d"), ("s", 3L, "x y"),
      ("t", 4L, "a b c"), ("t", 5L, "a b"))
      .toDF("lang", "doc_id", "text")
    val got = TextAnalysis.prefixCacheProfile(docs, "text", "doc_id", "lang")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("s", 3L, 8L, 2L, 6L, 0.25),
      ("t", 2L, 5L, 2L, 3L, 0.4)), got.toString)
  }

  test("scalingCurve: three nested points off one pass, shared slope") {
    val rnd = new scala.util.Random(3)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 64L).map(i =>
      (i, Seq.fill(12)(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.scalingCurve(docs, "text", "doc_id")
      .as[(Int, Long, Long, Long, Double, Float)].collect().toSeq
    assert(got.map(_._1) == Seq(1, 2, 4))
    assert(got.map(_._2) == got.map(_._2).sorted && got.map(_._2).distinct.size == 3,
      "training size must grow with the bucket budget")
    assert(got.map(_._3).distinct.size == 1, "eval set is fixed")
    got.foreach { case (_, _, te, fp, npt, slope) =>
      assert(fp > 0 && npt == fp.toDouble / (te * (1L << 40)).toDouble)
      assert(!slope.isNaN && !slope.isInfinite)
    }
    assert(got.map(_._6).distinct.size == 1, "slope is a curve-level constant")
  }
}
