package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.SparkSuite

class RateAnomalySpec extends SparkSuite {
  import spark.implicits._

  // one event per (minute, i) — minute m gets `perMinute(m)` events
  private def stream(perMinute: Seq[Int]): org.apache.spark.sql.DataFrame =
    perMinute.zipWithIndex.flatMap { case (n, m) =>
      (0 until n).map(i => ("click", new Timestamp(m * 60000L + i)))
    }.toDF("event_type", "ts")

  test("flags a spike against a flat baseline and not the baseline itself") {
    // 10 flat minutes of 5, then a minute of 50: std of a flat baseline
    // is 0 -> z is null -> NOT anomalous by the flat-baseline rule...
    val flat = stream(Seq.fill(10)(5) ++ Seq(50))
    val flatOut = RateAnomaly.detect(flat, "event_type", "ts", history = 10)
      .select("bucket", "n_events", "z", "is_anomaly")
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq
    assert(flatOut.map(_._1) == Seq(10L))
    assert(flatOut.head._3.isEmpty && !flatOut.head._4)
    // ...so give the baseline variance: alternating 4/6 (mean 5, std 1)
    val varied = stream((0 until 10).map(m => if (m % 2 == 0) 4 else 6) ++ Seq(50, 5))
    val out = RateAnomaly.detect(varied, "event_type", "ts", history = 10)
      .select("bucket", "n_events", "z", "is_anomaly")
      .as[(Long, Long, Option[Double], Boolean)].collect().sortBy(_._1)
    // bucket 10: count 50 vs mean 5, std 1 -> z = 45 -> anomalous
    val spike = out.find(_._1 == 10L).get
    assert(spike._4 && spike._3.exists(_ > 40))
    // bucket 11: count 5 against a baseline that now CONTAINS the spike
    // (mean 9.4...) -> negative z, not anomalous
    val after = out.find(_._1 == 11L).get
    assert(!after._4 && after._3.exists(_ < 0))
  }

  test("warmup buckets without a full baseline are dropped; keys are independent") {
    val df = stream(Seq.fill(12)(3))
      .union(Seq(("view", new Timestamp(0L))).toDF("event_type", "ts"))
    val out = RateAnomaly.detect(df, "event_type", "ts", history = 10)
      .select("event_type", "bucket").as[(String, Long)].collect().toSeq
    // click minutes 0-9 are warmup; only 10 and 11 emit. view has 1
    // bucket -> never a full baseline -> nothing.
    assert(out.sorted == Seq(("click", 10L), ("click", 11L)))
  }

  test("latenessAudit: hand-computed lateness per key, per-delay drop counts") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1 arrival order: t=0, t=100, t=10 (90s late), t=200
    // user 2 arrival order: t=50, t=40 (10s late)
    val df = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(100)), (1L, 3L, ts(10)), (1L, 4L, ts(200)),
      (2L, 5L, ts(50)), (2L, 6L, ts(40))
    ).toDF("user_id", "arrival", "ts")
    val out = RateAnomaly.latenessAudit(df, Seq("user_id"), "ts", "arrival",
      delaysSeconds = Seq(0L, 30L, 120L))
      .select("delay_s", "n_late", "n_total")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // lateness: 90s (u1 row3), 10s (u2 row6), rest 0
    assert(out.toSeq == Seq((0L, 2L, 6L), (30L, 1L, 6L), (120L, 0L, 6L)))
  }

  test("psi: identical windows score ~0, a shifted window alerts, clamping catches out-of-range mass") {
    val ref = (1 to 400).map(i => ("a", (i % 100).toDouble)) ++
      (1 to 400).map(i => ("b", (i % 100).toDouble))
    // a: identical distribution; b: shifted far out of the reference range
    val cur = (1 to 400).map(i => ("a", (i % 100).toDouble)) ++
      (1 to 400).map(i => ("b", (i % 100).toDouble + 1000.0))
    val out = RateAnomaly.psi(ref.toDF("k", "v"), cur.toDF("k", "v"), "k", "v")
      .collect().map(r => (r.getString(0), (r.getFloat(3), r.getBoolean(4)))).toMap
    assert(math.abs(out("a")._1) < 0.01 && !out("a")._2)
    assert(out("b")._1 > 0.2 && out("b")._2) // all mass clamps into the top bin
  }

  test("silentGaps: consecutive missing buckets compact to one interval; full keys emit none") {
    import java.sql.Timestamp
    def ts(h: Long) = new Timestamp(h * 3600L * 1000L)
    // key a: hours 0,1,4,5,9 -> gaps [2,4) (2 missing) and [6,9) (3)
    // key b: hours 0,1,2 -> no gap
    val df = (Seq(0L, 1L, 4L, 5L, 9L).map(h => ("a", ts(h))) ++
      Seq(0L, 1L, 2L).map(h => ("b", ts(h)))).toDF("event_type", "ts")
    val out = RateAnomaly.silentGaps(df, "event_type", "ts", bucketSeconds = 3600L)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L,
        r.getTimestamp(2).getTime / 3600000L, r.getInt(3))).sortBy(x => (x._1, x._2))
    assert(out.toSeq == Seq(("a", 2L, 4L, 2), ("a", 6L, 9L, 3)))
  }

  /** Brute-force two-sample KS on integer samples: D = max ECDF gap. */
  private def refKs(ref: Seq[Long], cur: Seq[Long]): (Long, Double) = {
    val support = (ref ++ cur).distinct.sorted
    val n1 = ref.size.toLong; val n2 = cur.size.toLong
    val dnum = support.map(v =>
      math.abs(ref.count(_ <= v).toLong * n2 - cur.count(_ <= v).toLong * n1)).max
    (dnum, dnum.toDouble / (n1 * n2).toDouble)
  }

  test("ksDistance matches the brute-force ECDF gap on random integer samples") {
    val rnd = new scala.util.Random(13)
    val ref = Seq.fill(300)(("k", rnd.nextInt(40).toLong))
    val cur = Seq.fill(200)(("k", rnd.nextInt(40).toLong + 5L)) // shifted
    val out = RateAnomaly.ksDistance(
      ref.toDF("k", "v"), cur.toDF("k", "v"), "k", "v")
      .select("n_ref", "n_cur", "d_num", "d").as[(Long, Long, Long, Double)].head()
    val (dnum, d) = refKs(ref.map(_._2), cur.map(_._2))
    assert(out == ((300L, 200L, dnum, d)))
  }

  test("ksDistance: identical samples give D=0 no alert; disjoint give D=1 alert; per-key isolation") {
    val same = Seq.fill(100)(("a", 7L)) ++ (1 to 100).map(i => ("a", (i % 10).toLong))
    val ref = same ++ (1 to 80).map(i => ("b", i.toLong))          // b: [1,80]
    val cur = same ++ (1 to 80).map(i => ("b", i.toLong + 1000L))  // b: disjoint
    val m = RateAnomaly.ksDistance(ref.toDF("k", "v"), cur.toDF("k", "v"), "k", "v")
      .select("k", "d", "alert").as[(String, Double, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m("a")._1 == 0.0 && !m("a")._2)
    assert(m("b")._1 == 1.0 && m("b")._2)
  }

  test("cusum: closed window form equals the sequential Page recurrence") {
    // steady rate 2/bucket for 20 buckets, then 6/bucket: the shift
    // must accumulate and alert; pre-shift stays near zero
    val perBucket = (0 until 20).map(_ => 2) ++ (20 until 30).map(_ => 6)
    val ev = perBucket.zipWithIndex.flatMap { case (n, b) =>
      (0 until n).map(i => ("k", new java.sql.Timestamp(b * 60000L + i * 10L)))
    }
    val got = RateAnomaly.cusum(ev.toDF("k", "ts"), "k", "ts")
      .as[(String, Long, Long, Long, Boolean)].collect().sortBy(_._2).toSeq
    // sequential replay: S_t = max(0, S_{t-1} + n*x_t - tot - tot div 4)
    val counts = perBucket.map(_.toLong)
    val tot = counts.sum; val n = counts.length.toLong
    var s = 0L
    val want = counts.zipWithIndex.map { case (x, b) =>
      s = math.max(0L, s + x * n - tot - tot / 4)
      ("k", b.toLong, x, s, s > 5 * tot)
    }
    assert(got == want)
    assert(got.exists(_._5), "planted shift must alert")
    assert(!got.take(20).exists(_._5), "no alert before the shift")
  }

  test("aucRank matches the hand-computed rank AUC, ties mid-ranked") {
    // pos scores: 0.9, 0.7, 0.5; neg: 0.5, 0.3, 0.1 — the 0.5 tie
    // contributes 1/2. Pairs: (0.9,{.5,.3,.1})=3, (0.7,..)=3,
    // (0.5,{.3,.1})=2 + tie 0.5 => 8.5 / 9
    val df = Seq((true, 0.9), (true, 0.7), (true, 0.5),
      (false, 0.5), (false, 0.3), (false, 0.1)).toDF("label", "score")
    val out = RateAnomaly.aucRank(df, "label", "score")
      .as[(Double, Long, Long)].collect().head
    assert(out == ((8.5 / 9.0, 3L, 3L)))
    // degenerate separations
    val perfect = Seq((true, 0.9), (true, 0.8), (false, 0.2), (false, 0.1))
      .toDF("label", "score")
    assert(RateAnomaly.aucRank(perfect, "label", "score")
      .as[(Double, Long, Long)].collect().head._1 == 1.0)
    val inverted = Seq((true, 0.1), (false, 0.9)).toDF("label", "score")
    assert(RateAnomaly.aucRank(inverted, "label", "score")
      .as[(Double, Long, Long)].collect().head._1 == 0.0)
  }

  test("welchT recovers the textbook statistic from exact sums") {
    // arm 0: 1,2,3,4 (mean 2.5, var 5/3); arm 1: 6,8 (mean 7, var 2)
    // t = (2.5-7)/sqrt(5/12 + 1) = -4.5/sqrt(17/12)
    val df = Seq((0, 1.0), (0, 2.0), (0, 3.0), (0, 4.0), (1, 6.0), (1, 8.0))
      .map { case (a, v) => ("k", a, v) }.toDF("key", "arm", "value")
    val out = RateAnomaly.welchT(df, "key", "arm", "value")
      .as[(String, Long, Long, Double, Double, Double, Boolean)]
      .collect().head
    val expT = -4.5 / math.sqrt(5.0 / 12.0 + 1.0)
    assert(out._2 == 4L && out._3 == 2L)
    assert(math.abs(out._4 - 2.5) < 1e-9 && math.abs(out._5 - 7.0) < 1e-9)
    assert(math.abs(out._6 - expT) < 1e-6, s"t=${out._6} want $expT")
    assert(out._7, "t ~ -3.78 is significant at 1.96")
  }

  private def dayEvents(rows: Seq[(String, Int, Int)]): org.apache.spark.sql.DataFrame =
    rows.flatMap { case (k, day, n) =>
      (0 until n).map(i => (k, new Timestamp(day * 86400000L + i)))
    }.toDF("event_type", "ts")

  test("theilSen ignores the spike OLS would chase") {
    // days 0..6, perfect slope 2 except day 4 spiking to 100: of the 21
    // pairwise slopes, 15 are exactly 2 (ranks 3..17) -> lower median
    // (rank 11) is 2.0 regardless of the outlier.
    val df = dayEvents(Seq(0, 1, 2, 3, 5, 6).map(d => ("a", d, 10 + 2 * d))
      :+ (("a", 4, 100)))
    val out = RateAnomaly.theilSen(df, "event_type", "ts")
      .as[(String, Long, Double, Long, Long)].collect().head
    assert(out._2 == 21L, s"n_pairs ${out._2}")
    assert(out._3 == 2.0, s"slope ${out._3}")
  }

  test("decayTrend: recency dominates with exact dyadic weights") {
    // both keys carry 10 events; "hot" on the anchor day (weight 1),
    // "cold" 70 days earlier (half-life 7 -> weight exactly 2^-10)
    val df = dayEvents(Seq(("hot", 100, 10), ("cold", 30, 10)))
    val out = RateAnomaly.decayTrend(df, "event_type", "ts", halfLifeDays = 7)
      .as[(String, Long, Int, Double)].collect().sortBy(_._1)
    val cold = out.head; val hot = out.last
    assert(hot == (("hot", 10L, 100, 10.0)))
    assert(cold == (("cold", 10L, 30, 10.0 / 1024.0)))
  }

  test("holtForecast tracks a clean linear series exactly and zero-fills gaps") {
    // counts 2,4,6,8 on days 0..3: level=8, trend=2, forecast=8+7*2, mae=0
    val lin = dayEvents(Seq(0, 1, 2, 3).map(d => ("a", d, 2 + 2 * d)))
    val a = RateAnomaly.holtForecast(lin, "event_type", "ts", horizon = 7)
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    assert(a == (("a", 4L, 8.0, 2.0, 22.0, 0.0)))
    // days 0,1,3 of count 4 (day 2 silently missing -> filled as 0):
    // hand-rolled halvings give level 2.5, trend -0.25, sae 7g -> mae 7/3
    val gap = dayEvents(Seq(("b", 0, 4), ("b", 1, 4), ("b", 3, 4)))
    val b = RateAnomaly.holtForecast(gap, "event_type", "ts", horizon = 7)
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    assert(b._2 == 4L && b._3 == 2.5 && b._4 == -0.25)
    assert(b._5 == 2.5 - 7 * 0.25 && math.abs(b._6 - 7.0 / 3.0) < 1e-12)
  }

  test("detectSeasonal: spike vs own-weekday baseline, flags are exact integer compares") {
    // five Thursdays (epoch day 0 is a Thursday) of 20,20,20,20,100 and
    // one Friday of 5: the spike is >2x its weekday mean (100*5 > 2*180);
    // the 20s are NOT low (2*20*5 = 200 >= 180); Friday is its own
    // 1-day baseline -> index exactly 1, no flags
    val df = dayEvents(Seq(0, 7, 14, 21).map(d => ("a", d, 20))
      ++ Seq(("a", 28, 100), ("a", 1, 5)))
    val out = RateAnomaly.detectSeasonal(df, "event_type", "ts")
      .as[(String, Int, Int, Long, Double, Double, Boolean, Boolean)]
      .collect().map(r => r._2 -> r).toMap
    assert(out(28)._7 && !out(28)._8, "spike flags high only")
    assert(out(28)._5 == 36.0 && out(28)._6 == 500.0 / 180.0)
    Seq(0, 7, 14, 21).foreach { d =>
      assert(!out(d)._7 && !out(d)._8, s"baseline day $d unflagged")
    }
    assert(out(1)._6 == 1.0 && !out(1)._7 && !out(1)._8, "1-day weekday is its own mean")
  }

  test("cuped: a perfectly correlated covariate removes all between-user variance") {
    // user u: pre value u/4 on day 0, post value u/2 on day 10 — Y = 2X
    // exactly, so theta == 2, var_reduction == 1, and the adjusted A/A
    // diff collapses to exactly 0 while the raw diff is nonzero
    // (odd/even arms have different user-size mixes).
    val rows = (1 to 8).flatMap { u =>
      Seq((u.toLong, new Timestamp(0L), u * 0.25),
        (u.toLong, new Timestamp(10L * 86400000L), u * 0.5))
    }
    val df = rows.toDF("user_id", "ts", "value")
    val out = RateAnomaly.cuped(df, "user_id", "ts", "value",
      pmod(col("user_id"), lit(2L)))
    val r = out.collect().head
    assert(r.getAs[Long]("n_users") == 8L)
    assert(r.getAs[Long]("n0") == 4L && r.getAs[Long]("n1") == 4L)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)
    assert(r.getAs[Double]("diff_raw") != 0.0)
    assert(r.getAs[Double]("diff_adj") == 0.0)
  }

  test("abPower: sample size matches an independent driver-side recomputation") {
    // user masses (on the 2^20 grid): u1 -> 3.0, u2 -> 1.0, u3 -> 2.0
    val ev = Seq(("u1", 1.0), ("u1", 2.0), ("u2", 1.0), ("u3", 2.0))
      .toDF("user_id", "value")
    val got = RateAnomaly.abPower(ev, "user_id", "value", mdeFrac = 0.05)
      .as[(Long, Double, Double, Double, Long)].collect().head
    val g = (1L << 20).toDouble
    val xs = Seq(3.0, 1.0, 2.0).map(v => math.floor(v * g))
    val n = xs.size.toDouble
    val mean = xs.sum / (n * g)
    val variance = (n * xs.map(x => x * x).sum - xs.sum * xs.sum) /
      (n * (n - 1.0) * (g * g))
    val mde = 0.05 * mean
    val z = RateAnomaly.Z975 + RateAnomaly.Z80
    val nPerArm = math.ceil(2.0 * variance * (z * z) / (mde * mde)).toLong
    assert(got._1 == 3L)
    assert(math.abs(got._2 - mean) < 1e-12 && math.abs(got._3 - variance) < 1e-9)
    assert(got._5 == nPerArm, s"got ${got._5}, expected $nPerArm")
  }

  test("postStratified: hand-computed reweighting corrects arm imbalance") {
    // strata A,B each pooled share 1/2; arm0 over-samples A, arm1 B:
    // raw0 = 2, raw1 = 10/3; adj0 = .5*1 + .5*4 = 2.5, adj1 = .5*2 + .5*4 = 3
    val ev = Seq(
      (0L, "A", 1.0), (0L, "A", 1.0), (0L, "B", 4.0),
      (1L, "A", 2.0), (1L, "B", 2.0), (1L, "B", 6.0))
      .toDF("arm", "stratum", "value")
    val got = RateAnomaly.postStratified(ev, col("arm"), "stratum", "value")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .collect().head
    assert(got._1 == 3L && got._2 == 3L)
    assert(got._3 == 2.0 && math.abs(got._4 - 10.0 / 3) < 1e-12)
    assert(got._5 == 2.5 && got._6 == 3.0)
    assert(got._8 == 0.5)
  }

  test("postStratified rejects mismatched stratum sets and non-{0,1} arms") {
    import spark.implicits._
    // stratum B absent from arm 0: weights would no longer sum to 1
    val miss = Seq((0L, "A", 1.0), (1L, "A", 2.0), (1L, "B", 3.0))
      .toDF("arm", "stratum", "value")
    val e1 = intercept[IllegalArgumentException] {
      RateAnomaly.postStratified(miss, col("arm"), "stratum", "value")
    }
    assert(e1.getMessage.contains("only-in-arm1=B"), e1.getMessage)
    val badArm = Seq((1L, "A", 1.0), (2L, "A", 2.0))
      .toDF("arm", "stratum", "value")
    val e2 = intercept[IllegalArgumentException] {
      RateAnomaly.postStratified(badArm, col("arm"), "stratum", "value")
    }
    assert(e2.getMessage.contains("{1,2}"), e2.getMessage)
  }
}
