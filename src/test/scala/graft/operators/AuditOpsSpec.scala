package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Brute-force / hand-data checks for the round-11 closing operators:
  * Gini concentration, Zipf fit, Benford audit, SPRT, key-skew profile,
  * code-switch audit, unique-token yield, l-diversity, Adamic–Adar,
  * perceptual-hash pairs, SoftDeDup weights.
  */
class AuditOpsSpec extends SparkSuite {
  import spark.implicits._

  test("giniConcentration matches the closed form on hand data") {
    // stratum A: three equal docs -> gini 0; stratum B: [1, 3] -> 0.25
    val docs = Seq(
      ("A", "w"), ("A", "w"), ("A", "w"),
      ("B", "w"), ("B", "w w w")).toDF("src", "text")
    val g = TextAnalysis.giniConcentration(docs, "text", "src")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(g("A") == 0.0)
    assert(g("B") == 0.25)
  }

  test("giniConcentration histogram form equals the per-doc rank brute force") {
    val lengths = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5)
    val docs = lengths.zipWithIndex
      .map { case (n, i) => ("S", Seq.fill(n)("w").mkString(" ")) }
      .toDF("src", "text")
    val got = TextAnalysis.giniConcentration(docs, "text", "src")
      .collect()(0).getDouble(3)
    val xs = lengths.map(_.toLong).sorted
    val n = xs.size
    val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val expected = (2.0 * six - (n + 1).toDouble * xs.sum) / (n.toDouble * xs.sum)
    assert(got == expected)
  }

  test("zipfFit recovers slope -1 on an exact Zipf corpus") {
    // term_i appears floor(2000/i) times, i = 1..200
    val words = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
    val docs = words.grouped(500).map(_.mkString(" ")).toSeq.toDF("text")
    val r = TextAnalysis.zipfFit(docs, "text", topN = 200).collect()(0)
    assert(r.getLong(0) == 200L)
    val slope = r.getFloat(1)
    assert(slope > -1.1f && slope < -0.9f, s"slope $slope not ~ -1")
    val r2 = r.getFloat(3)
    assert(r2 > 0.98f, s"r2 $r2 not ~ 1")
  }

  test("benfordAudit extracts leading digits without log10 and sums chi2 on the grid") {
    val vals = Seq(1.0, 1.5, 19.0, 999.99, 1000.0, 2.0, 30.0, 400.0, 5e6, 0.5)
    val df = vals.toDF("v") // 0.5 excluded (< 1)
    val rows = Expectations.benfordAudit(df, "v").collect()
    val byDigit = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    // digits: 1,1,1(19->1),9(999.99),1(1000),2,3,4,5 -> 1:4, 2:1, 3:1, 4:1, 5:1, 9:1
    assert(byDigit(1) == 4L && byDigit(9) == 1L && byDigit(5) == 1L)
    assert(rows.map(_.getLong(1)).sum == 9L)
    // global chi2 identical on every row and equal to the gridded term sum
    val chi2s = rows.map(_.getDouble(4)).distinct
    assert(chi2s.length == 1)
    val expected = rows.map(r => math.floor(r.getDouble(3) * 1048576.0).toLong).sum
    assert(chi2s(0) == expected.toDouble / 1048576.0)
  }

  test("sprt decides h1 on a stream running at p1 and h0 at p0-ish rates") {
    // 40 days, 100 trials/day at 60% success -> overwhelming h1 evidence
    val hot = (0 until 40).flatMap { d =>
      (0 until 100).map(i => ("hot", f"2024-01-${1 + d % 28}%02d 00:00:00", i < 60))
    }
    val cold = (0 until 40).flatMap { d =>
      (0 until 100).map(i => ("cold", f"2024-01-${1 + d % 28}%02d 00:00:00", i < 5))
    }
    val df = (hot ++ cold).toDF("k", "ts_s", "succ")
      .select(col("k"), to_timestamp(col("ts_s")).as("ts"), col("succ"))
    val out = RateAnomaly.sprt(df, "k", "ts", col("succ"), p0 = 0.25, p1 = 0.30)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out("hot") == "h1")
    assert(out("cold") == "h0")
  }

  test("sprt constants: success positive, failure negative, bounds bracket zero") {
    val (c1, c0, up, lo) = RateAnomaly.sprtConstants(0.25, 0.30, 0.05, 0.05)
    assert(c1 > 0 && c0 < 0 && up > 0 && lo < 0)
  }

  test("keySkewProfile computes the skew factor and hitter shares") {
    val df = (Seq.fill(8)("a") ++ Seq("b", "c")).toDF("k")
    val rows = SkewJoin.keySkewProfile(df, "k", topK = 2).collect()
    assert(rows.length == 2)
    val top = rows(0)
    assert(top.getString(0) == "a" && top.getLong(1) == 8L)
    assert(top.getDouble(2) == 0.8)
    assert(top.getLong(3) == 10L && top.getLong(4) == 3L)
    assert(top.getDouble(5) == 2.4)
  }

  test("codeSwitchProfile flags the foreign half of a bilingual doc") {
    val en = Seq.fill(8)("the and").mkString(" ")   // 16 tokens, en stopwords
    val de = Seq.fill(8)("der und").mkString(" ")   // 16 tokens, de stopwords
    val docs = Seq((1L, "en", s"$en $de"), (2L, "en", en)).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.codeSwitchProfile(docs, "text", "doc_id", "lang", chunkSize = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 1L))) // two chunks, the de one disagrees
    assert(out(2L) == ((1L, 0L)))
  }

  test("uniqueTokenYield discounts cross-stratum duplication on the integer grid") {
    val docs = Seq(
      (1L, "s1", "a b c d"),  // duplicated in s2 -> k = 2
      (2L, "s2", "a b c d"),
      (3L, "s1", "x y")       // unique -> k = 1
    ).toDF("doc_id", "src", "text")
    val out = Dedup.uniqueTokenYield(docs, "text", "doc_id", "src")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // s1: raw 6, eff = 4*2^20/2 + 2*2^20 = 4*2^19... check: (4<<20)/2 + (2<<20)
    assert(out("s1") == ((2L, 6L, (4L << 20) / 2 + (2L << 20))))
    assert(out("s2") == ((1L, 4L, (4L << 20) / 2)))
  }

  test("lDiversity flags classes below the distinct-sensitive bar") {
    val df = Seq(
      ("en", 0L, "s1"), ("en", 0L, "s2"), ("en", 0L, "s3"),
      ("de", 0L, "s1"), ("de", 0L, "s1")).toDF("lang", "bucket", "src")
    val out = Privacy.lDiversity(df, "lang", "bucket", "src", l = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("en") == ((3L, 3L, true)))
    assert(out("de") == ((2L, 1L, false)))
  }

  test("adamicAdar scores shared-neighbor pairs with 1/ln(deg) grid weights") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val rows = Graph.adamicAdar(edges, "src", "dst", degCap = 64L, topK = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val w2 = math.floor(1099511627776.0 / math.log(2.0)).toLong
    val w3 = math.floor(1099511627776.0 / math.log(3.0)).toLong
    // z=1 (deg 2) wedges (2,3); z=2 (deg 2) wedges (1,3); z=3 (deg 3) wedges (1,2),(1,4),(2,4)
    assert(rows((2L, 3L)) == w2)
    assert(rows((1L, 3L)) == w2)
    assert(rows((1L, 2L)) == w3)
    assert(rows((1L, 4L)) == w3)
    assert(rows((2L, 4L)) == w3)
  }

  test("perceptualHashPairs recovers identical payloads at hamming 0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different payload with other bytes and lengths xyz")
    ).toDF("doc_id", "text")
    val out = Multimodal.perceptualHashPairs(
      Multimodal.withBinaryPayload(docs, "text"), "doc_id", "payload", maxHamming = 0)
      .collect()
    assert(out.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
  }

  test("positionCredit splits 40/20/40 with the 1- and 2-touch degenerations") {
    // u1: a,b,c then purchase -> a 0.4, b 0.2, c 0.4
    // u2: a then purchase -> a 1.0 ; u3: b,c then purchase -> 0.5 each
    // u4: never converts -> no credit
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L), (1L, "purchase", 4L),
      (2L, "a", 1L), (2L, "purchase", 2L),
      (3L, "b", 1L), (3L, "c", 2L), (3L, "purchase", 3L),
      (4L, "a", 1L), (4L, "b", 2L)
    ).toDF("user_id", "event_type", "tie")
      .withColumn("ts", col("tie").cast("timestamp"))
    val out = Attribution.positionCredit(ev, "user_id", "event_type", "ts", "tie", "purchase")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val g = 1L << 20
    assert(out("a") == math.floor(0.4 * g).toLong + g)        // u1 first + u2 solo
    assert(out("b") == math.floor(0.2 * g).toLong + g / 2)    // u1 middle + u3 pair
    assert(out("c") == math.floor(0.4 * g).toLong + g / 2)    // u1 last + u3 pair
  }

  test("vocabCoverage reports cumulative token-mass share at the requested ranks") {
    // counts: a=4, b=2, c=1, d=1 -> total 8; top1 = 0.5, top2 = 0.75
    val docs = Seq("a a a a b b c d").toDF("text")
    val out = TextAnalysis.vocabCoverage(docs, "text", ks = Seq(1, 2))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(out(1) == ((4L, 0.5)))
    assert(out(2) == ((6L, 0.75)))
  }

  test("modularity scores a two-clique partition high and computes exact numerators") {
    // two triangles joined by one bridge edge; labels = the two triangles
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      .toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "label")
    val rows = Graph.modularity(edges, "src", "dst", labels).collect()
    // m = 7; community 1: L=3, D=7 -> 4*7*3 - 49 = 35; community 4 same
    assert(rows.length == 2)
    assert(rows.forall(r => r.getLong(4) == 35L))
    val q = rows(0).getDouble(5)
    assert(q == 70.0 / (4.0 * 49.0), s"q was $q")
  }

  test("rfmSegments anchors recency at the corpus's last day and quintiles deterministically") {
    // 5 users, one event each on days 1..5, values 0..4 -> r_days 4..0
    val ev = (1 to 5).map(u => (u.toLong, (u * 86400L), (u - 1) * 1.0))
      .toDF("user_id", "sec", "value")
      .withColumn("ts", col("sec").cast("timestamp"))
    val out = Funnel.rfmSegments(ev, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getString(7)))).toMap
    // u5: r_q 1 (most recent), f_q 5 (tie broken by id), m_q 5 (highest)
    assert(out(5L) == ((0, 1L, 4096L, "155")))
    assert(out(1L) == ((4, 1L, 0L, "511")))
  }

  test("annMatryoshka prefix search recovers identical neighbors when dims beyond the prefix are constant") {
    // embeddings whose last 48 dims are all zero -> 16-dim prefix search
    // must equal the 64-dim exact search: recall 100 for every query
    val emb = spark.range(30).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        j => when(j <= 16, (j * (col("id") + 1) % 97).cast("float")).otherwise(lit(0.0f)))
        .as("embedding"))
    val trunc = emb.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
    val rec = Similarity.recallAtK(
      Similarity.bruteForceTopK(trunc, trunc.where(col("vec_id") < 3), k = 5),
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 3), k = 5))
      .collect()
    assert(rec.length == 3 && rec.forall(_.getInt(2) == 100))
  }

  test("clusteringCoefficient credits every corner of each triangle") {
    // triangle 1-2-3 plus pendant 3-4: cc(1)=cc(2)=1, cc(3)=1/3, 4 dropped (deg 1)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.clusteringCoefficient(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((1L, 1.0)))
    assert(out(2L) == ((1L, 1.0)))
    assert(out(3L) == ((1L, 1.0 / 3.0)))
    assert(!out.contains(4L))
  }

  test("c4Rules fails each planted violation on exactly its own rule") {
    val docs = Seq(
      (1L, "too short."),
      (2L, "a perfectly fine sentence with many words inside it."),
      (3L, "enough words here but it has a { brace marker}."),
      (4L, "enough words here with no terminal punctuation at all"),
      (5L, "enough words here please accept our cookie policy today.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Rules(docs, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(out(1L)._1 == false)             // min-words
    assert(out(2L) == ((true, true, true, true)))
    assert(out(3L)._2 == false)             // brace
    assert(out(4L)._3 == false)             // terminal
    assert(out(5L)._4 == false)             // policy
  }

  test("autocorrelation finds the planted period and ignores missing days") {
    // period-2 series 10,2,10,2,... over 14 days: r(2) = 1, r(1) = -1
    val ev = (0 until 14).flatMap { d =>
      val n = if (d % 2 == 0) 10 else 2
      (0 until n).map(_ => ("k", d * 86400L))
    }.toDF("k", "sec").withColumn("ts", col("sec").cast("timestamp"))
    val out = RateAnomaly.autocorrelation(ev, "k", "ts", lags = Seq(1, 2))
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out(2) == 1.0)
    assert(out(1) == -1.0)
  }

  test("wilsonCi brackets the point estimate and tightens with n") {
    val small = (0 until 20).map(i => ("a", i < 5)).toDF("k", "s")
    val big = (0 until 2000).map(i => ("a", i < 500)).toDF("k", "s")
    def bounds(df: org.apache.spark.sql.DataFrame) = {
      val r = RateAnomaly.wilsonCi(df, "k", col("s")).collect()(0)
      (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    }
    val (p1, lo1, hi1) = bounds(small)
    val (p2, lo2, hi2) = bounds(big)
    assert(p1 == 0.25 && p2 == 0.25)
    assert(lo1 < p1 && p1 < hi1)
    assert((hi2 - lo2) < (hi1 - lo1))
    assert(lo1 > 0.0 && hi1 < 1.0)
  }

  test("softDedupWeights assigns 1/k to every member of a duplicate group") {
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 0.5)) && out(2L) == ((2L, 0.5)) && out(3L) == ((1L, 1.0)))
  }
}
