package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Privacy operators: the k-anonymity ladder, the deletion audit, and
  * DP count release — brute-force hand oracles on planted fixtures.
  */
class PrivacySpec extends SparkSuite {

  import spark.implicits._

  // (lang, source) census: ("en","a") ×4 releases exactly; ("en","b") ×2
  // generalizes to ("en","*") — en total 6 ≥ k; ("fr","c") ×1 with fr
  // total 1 < k suppresses fully
  private lazy val docs = Seq(
    (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"), (4L, "en", "a"),
    (5L, "en", "b"), (6L, "en", "b"),
    (7L, "fr", "c")
  ).toDF("doc_id", "lang", "source")

  test("kAnonymize walks the generalization ladder and sizes anonymity sets") {
    val out = Privacy.kAnonymize(docs, "lang", "source", k = 4)
      .select("doc_id", "anon_q1", "anon_q2", "anon_level", "anon_set_size")
      .as[(Long, String, String, Int, Long)].collect().sortBy(_._1)
    assert(out.take(4).forall { case (_, q1, q2, l, s) =>
      q1 == "en" && q2 == "a" && l == 0 && s == 4L })
    assert(out.slice(4, 6).forall { case (_, q1, q2, l, s) =>
      q1 == "en" && q2 == "*" && l == 1 && s == 6L })
    assert(out(6) == ((7L, "*", "*", 2, 7L)))
  }

  test("kAnonymize: every released group has at least k members") {
    val groups = Privacy.kAnonymize(docs, "lang", "source", k = 4)
      .groupBy("anon_q1", "anon_q2").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    // level-2 rows release ("*","*") whose set is the corpus; the fr
    // singleton is only "small" as a released GROUP, never as a set size
    val sets = Privacy.kAnonymize(docs, "lang", "source", k = 4)
      .select("anon_set_size").as[Long].collect()
    assert(sets.forall(_ >= 4L), s"anonymity set below k: ${sets.mkString(",")}")
    assert(groups.map(_._3).sum == 7L)
  }

  test("deletionAudit counts per-group tombstone hits") {
    val ev = Seq(
      (13L, "click"), (13L, "click"), (26L, "view"),
      (1L, "click"), (2L, "view"), (3L, "view")
    ).toDF("user_id", "event_type")
    val tomb = ev.where(col("user_id") % 13 === 0).select("user_id")
    val out = Privacy.deletionAudit(ev, "user_id", tomb, "event_type")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("click", 3L, 2L, 1L), ("view", 3L, 1L, 2L)))
  }

  test("dpCounts noise replays the id-derived Laplace draw exactly") {
    val out = Privacy.dpCounts(docs, "lang", epsilon = 1.0)
      .as[(String, Long, Long, Float)].collect().sortBy(_._1)
    assert(out.map(t => (t._1, t._2)).toSeq == Seq(("en", 6L), ("fr", 1L)))
    val scale = 1099511627776.0
    for ((lang, n, fp, noisy) <- out) {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp:$lang".getBytes("UTF-8"))
      val md24 = ((h(0) & 0xffL) << 16) | ((h(1) & 0xffL) << 8) | (h(2) & 0xffL)
      val u = (md24 + 0.5) / 16777216.0 - 0.5
      val want = math.floor(-1.0 * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u)) * scale).toLong
      assert(fp == want, s"$lang: noise_fp $fp != $want")
      assert(noisy == (n + fp / scale).toFloat)
    }
  }

  test("dpCounts noise is Laplace-shaped: symmetric sign, |noise| grows toward u=±1/2") {
    // construct keys hitting both signs
    val many = (0 until 50).map(i => (i.toLong, s"k$i")).toDF("id", "key")
    val fps = Privacy.dpCounts(many, "key").select("noise_fp").as[Long].collect()
    assert(fps.exists(_ > 0) && fps.exists(_ < 0), "both noise signs expected over 50 keys")
  }

  test("dpQuantile: exact median rides along; huge epsilon pins the release to it") {
    // group g: buckets 1x2, 2x4, 3x4 -> n=10, target=ceil(5)=5; ranks
    // 2/6/10 give utilities -3/-1/-5: bucket 2 is the true median AND
    // the strict utility max (a symmetric fixture would tie 1 and 2 and
    // leave the release to the noise)
    val rows = Seq.fill(2)(("g", 1L)) ++ Seq.fill(4)(("g", 2L)) ++ Seq.fill(4)(("g", 3L))
    val df = rows.toDF("lang", "bucket")
    val out = Privacy.dpQuantile(df, "lang", "bucket", epsilon = 100.0)
      .as[(String, Long, Long, Long)].collect().head
    assert(out._2 == 10L && out._3 == 2L)
    // at eps=100 a single utility step (>=50) dwarfs the Gumbel range
    // (~20), so the mechanism must release the exact median
    assert(out._4 == 2L)
  }

  test("tCloseness: hand-computed variational distance; skew leaks, mirror is 0") {
    // global: 8 a + 8 b (p = 1/2 each). class g1 mirrors it (4/4, t=0);
    // class g2 is all-a (4/0): t = 1/2(|1-1/2| + |0-1/2|) = 1/2
    val rows = Seq.fill(4)(("g1", 0L, "a")) ++ Seq.fill(4)(("g1", 0L, "b")) ++
      Seq.fill(4)(("g2", 0L, "a")) ++
      Seq.fill(4)(("g3", 0L, "b"))
    val out = Privacy.tCloseness(rows.toDF("q1", "q2", "s"), "q1", "q2", "s", t = 0.25)
      .as[(String, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._3)).toSeq == Seq(("g1", 8L), ("g2", 4L), ("g3", 4L)))
    val byClass = out.map(r => r._1 -> (r._4, r._5)).toMap
    assert(byClass("g1") == ((0.0, true)), "mirror class has t = 0")
    assert(byClass("g2") == ((0.5, false)), "all-a class leaks: t = 1/2")
    assert(byClass("g3") == ((0.5, false)), "all-b class leaks: t = 1/2")
  }

  test("license propagation: most-restrictive rank wins per shard") {
    // two docs, fixed shard assignment: shard 0 mixes ranks 0 and 3 ->
    // binding license 'proprietary'; shard 1 holds only rank 0
    val chunks = Seq(
      (0L, 1L, "wiki", 0L), (0L, 2L, "crawl", 3L),
      (1L, 1L, "wiki", 0L), (1L, 1L, "wiki", 0L))
      .toDF("shard", "doc_id", "source", "rank")
    val got = Privacy.licensePropagation(chunks, "shard", "doc_id", "source",
      "rank", Seq("public_domain", "cc_by", "cc_by_sa", "proprietary"))
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 2L, 3L, "proprietary"),
      (1L, 2L, 1L, 1L, 0L, "public_domain")))
  }

  test("dpMean: clipping, reproducible noise, and the exact release chain") {
    val df = Seq(("g", 50L), ("g", 5000L), ("h", 100L)).toDF("k", "v")
    val got = Privacy.dpMean(df, "k", "v", clip = 1000L, epsilon = 1.0)
      .as[(String, Long, Long, Long, Float)].collect()
      .map(r => r._1 -> r).toMap
    // 5000 clips to 1000; sums exact
    assert(got("g")._3 == 1050L && got("h")._3 == 100L)
    // noise is a pure function of the key: recompute it
    def noise(key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(("dpm:" + key).getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(d.take(3).map(b => f"$b%02x").mkString, 16)
      val u = (h.toDouble + 0.5) / 16777216.0 - 0.5
      math.floor(-1000.0 * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u))
        * 1099511627776.0).toLong
    }
    assert(got("g")._4 == noise("g") && got("h")._4 == noise("h"))
    assert(got("h")._5 ==
      ((100.0 + noise("h").toDouble / 1099511627776.0) / 1.0).toFloat)
  }
}
