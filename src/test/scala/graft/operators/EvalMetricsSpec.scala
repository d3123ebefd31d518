package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Eval-analytics operators: hand-computed pass@k / ECE / kappa values,
  * the Bradley–Terry MM round pinned by hand, and determinism.
  */
class EvalMetricsSpec extends SparkSuite {
  import spark.implicits._

  test("pass@k matches the hand-computed estimator (incl. the zero-factor clamp)") {
    val df = (Seq.fill(2)(("a", true)) ++ Seq.fill(2)(("a", false)) ++   // n=4 c=2
      Seq(("b", true)) ++ Seq.fill(4)(("b", false)) ++                    // n=5 c=1
      Seq(("c", true)) ++ Seq.fill(5)(("c", false)))                      // n=6 c=1
      .toDF("problem", "ok")
    val got = EvalMetrics.passAtK(df, "problem", "ok", Seq(1, 5))
      .orderBy("problem")
      .select(col("problem"), col("pass_at_1"), col("pass_at_5"))
      .as[(String, Option[Double], Option[Double])].collect().toSeq
    assert(got(0) == (("a", Some(0.5), None)))               // n=4 < 5
    assert(got(1) == (("b", Some(1.0 - 4.0 / 5.0), Some(1.0)))) // C(4,5)=0
    assert(got(2) == (("c", Some(1.0 - 5.0 / 6.0), Some(1.0 - 120.0 / 720.0))))
  }

  test("pass@k is exact in the HumanEval regime (n=200, k=10 — past the int64 envelope)") {
    val df = (Seq.fill(3)(("h", true)) ++ Seq.fill(197)(("h", false)))
      .toDF("problem", "ok")
    val got = EvalMetrics.passAtK(df, "problem", "ok", Seq(10))
      .select(col("pass_at_10")).as[Double].collect().head
    // ground truth through BigInt (200^10 would wrap a plain Long chain)
    val num = (0 until 10).map(i => BigInt(197 - i)).product
    val den = (0 until 10).map(i => BigInt(200 - i)).product
    val expect = 1.0 - num.toDouble / den.toDouble
    assert(math.abs(got - expect) < 1e-15, s"got $got expect $expect")
  }

  test("pass@k: n beyond the DECIMAL(38,0) envelope raises loudly") {
    // maxN(10) = floor(10^3.8) = 6309; n = 7000 must error, not wrap
    val big = spark.range(7000)
      .select(lit("p").as("problem"), (col("id") % 2 === 0).as("ok"))
    val e = intercept[Throwable] {
      EvalMetrics.passAtK(big, "problem", "ok", Seq(10)).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(_.contains("envelope")), chain(e).mkString(" | "))
  }

  test("bradleyTerry rejects an empty match table and an over-headroom corpus") {
    val e = intercept[IllegalArgumentException] {
      EvalMetrics.bradleyTerry(
        Seq.empty[(Long, Long)].toDF("winner", "loser"), "winner", "loser")
    }
    assert(e.getMessage.contains("no matches"))
  }

  test("averagePrecision matches the hand-worked PR curve exactly") {
    // ranked by score desc: y = (1, 0, 1) -> AP = (1/1 + 2/3) / 2
    val grid = 1L << 40
    val df = Seq((1L, 0.9, true), (2L, 0.8, false), (3L, 0.7, true))
      .toDF("doc_id", "score", "ok")
    val got = EvalMetrics.averagePrecision(df, "score", "ok", "doc_id")
      .as[(Long, Long, Double, Long, Double)].collect().head
    val apFp = grid + (2L * grid) / 3L
    assert(got == ((3L, 2L, 2.0 / 3.0, apFp,
      apFp.toDouble / (2L * grid).toDouble)), got.toString)
  }

  test("ECE bins match the hand-computed reliability table") {
    val q = 1L << 22 // quarter of the 2^24 grid
    val df = Seq((q, true), (q, false), (3 * q, true)).toDF("conf_fp", "ok")
    val got = EvalMetrics.eceBins(df, "conf_fp", "ok", bins = 2)
      .as[(Int, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(0, 1))
    val (_, n0, acc0, conf0, gap0, ece0) = got(0)
    assert(n0 == 2 && acc0 == 0.5 && conf0 == 0.25 && gap0 == 0.25)
    val (_, n1, acc1, conf1, gap1, ece1) = got(1)
    assert(n1 == 1 && acc1 == 1.0 && conf1 == 0.75 && gap1 == 0.25)
    assert(ece0 == 0.25 && ece1 == 0.25) // (2^23 + 2^22) / (3 * 2^24)
  }

  test("brier decomposition: terms match hand values and REL - RES + UNC = direct Brier") {
    val q = 1L << 22
    val df = Seq((q, true), (q, false), (3 * q, true)).toDF("conf_fp", "ok")
    val got = EvalMetrics.brierDecomposition(df, "conf_fp", "ok", bins = 2)
      .as[(Int, Long, Double, Double, Double, Double, Double)].collect().toSeq
    // bin0: rel = 1/24, res = 1/54; bin1: rel = 1/48, res = 1/27; unc = 2/9
    def ~=(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(got.size == 2)
    assert(~=(got(0)._5, 1.0 / 24) && ~=(got(0)._6, 1.0 / 54), got(0).toString)
    assert(~=(got(1)._5, 1.0 / 48) && ~=(got(1)._6, 1.0 / 27), got(1).toString)
    assert(got.forall(r => ~=(r._7, 2.0 / 9)))
    val brier = got.map(_._5).sum - got.map(_._6).sum + got.head._7
    // direct: mean((conf - ok)^2) with confs .25,.25,.75 and oks 1,0,1
    assert(~=(brier, (0.5625 + 0.0625 + 0.0625) / 3), brier.toString)
  }

  test("conformal: exact-rank threshold (clamped) and test coverage") {
    // 5 calibration scores 10..50 -> rank = min(ceil(6*0.9), 5) = 5,
    // threshold = 50; test scores 15,25,55,65 -> coverage 0.5
    val df = (Seq((1L, 10L, true), (2L, 20L, true), (3L, 30L, true),
      (4L, 40L, true), (5L, 50L, true),
      (6L, 15L, false), (7L, 25L, false), (8L, 55L, false), (9L, 65L, false)))
      .toDF("doc_id", "score", "is_cal")
    val got = EvalMetrics.conformalCoverage(df, "score", "doc_id", "is_cal")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((5L, 4L, 5L, 50L, 0.5, 0.9)))
  }

  test("isotonic: pools the adjacent violator pair exactly (minimax = PAV)") {
    // observed bins with accuracies [1/2, 0, 1] -> PAV pools the first
    // two to 1/4: fit = [2^38, 2^38, 2^40] on the 2^40 grid
    val df = Seq(
      ((1L << 20), true), ((1L << 20), false),
      ((1L << 22) + (1L << 20), false), ((1L << 22) + (1L << 20), false),
      ((1L << 23) + (1L << 20), true), ((1L << 23) + (1L << 20), true))
      .toDF("conf_fp", "ok")
    val got = EvalMetrics.isotonicCalibration(df, "conf_fp", "ok", bins = 4)
      .as[(Int, Long, Double, Long, Double)].collect().toSeq
    assert(got.map(_._4) == Seq(1L << 38, 1L << 38, 1L << 40), got.toString)
    assert(got.map(_._5) == Seq(0.25, 0.25, 1.0))
    // the fitted curve is nondecreasing
    assert(got.map(_._4) == got.map(_._4).sorted)
  }

  test("kappa: random agreement -> 0, perfect agreement -> 1") {
    val rand = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "a")).toDF("r1", "r2")
    val k0 = EvalMetrics.cohenKappa(rand, "r1", "r2")
      .select(col("kappa")).as[Double].collect()(0)
    assert(k0 == 0.0)
    val perfect = Seq(("a", "a"), ("b", "b")).toDF("r1", "r2")
    val k1 = EvalMetrics.cohenKappa(perfect, "r1", "r2")
      .select(col("n"), col("n_agree"), col("kappa"))
      .as[(Long, Long, Double)].collect()(0)
    assert(k1 == ((2L, 2L, 1.0)))
  }

  test("bradley-terry: one MM round pinned by hand") {
    // B beats A three times: t = 3*2^40 div 2^21 = 3*2^19 for both
    // endpoints; praw_B = 3*2^40 div 3*2^19 = 2^21, praw_A = 1
    // (winless floor); renorm with K=2, tot = 2^21+1:
    // p_B = (2^21*2) div ((2^21+1) div 2^20) = 2^22 div 2 = 2^21, p_A = 1
    val df = Seq.fill(3)((2L, 1L)).toDF("winner", "loser")
    val got = EvalMetrics.bradleyTerry(df, "winner", "loser", iters = 1)
      .select(col("item"), col("rating_fp")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L << 21), (1L, 1L)))
  }

  test("bradley-terry: orders a transitive tournament correctly") {
    val df = (Seq.fill(3)((1L, 2L)) ++ Seq.fill(3)((2L, 3L)) ++ Seq((1L, 3L)))
      .toDF("winner", "loser")
    val got = EvalMetrics.bradleyTerry(df, "winner", "loser", iters = 4)
      .select(col("item")).as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L), s"expected 1 > 2 > 3, got $got")
  }

  test("bradley-terry is bit-identical under repartitioning") {
    val rnd = new scala.util.Random(9)
    val df = (0 until 300).map { _ =>
      val a = rnd.nextInt(6).toLong; val b = (a + 1 + rnd.nextInt(5)) % 6
      if (rnd.nextBoolean()) (a, b) else (b, a)
    }.toDF("winner", "loser")
    def run(d: org.apache.spark.sql.DataFrame) =
      EvalMetrics.bradleyTerry(d, "winner", "loser", iters = 4)
        .select(col("item"), col("rating_fp")).as[(Long, Long)].collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(7)))
  }

  test("fertility: single chars dominate an unseen-structure corpus (invariants)") {
    val docs = Seq(("en", "banana bandana"), ("de", "cabana banana cab"))
      .toDF("lang", "text")
    val got = UnigramLm.fertility(docs, "text", "lang")
      .orderBy("lang")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("de", "en"))
    got.foreach { case (_, nw, np, nc, fert, cpp) =>
      assert(np >= nw, "at least one piece per word")
      assert(fert == np.toDouble / nw)
      assert(cpp == nc.toDouble / np)
      assert(nc >= np, "pieces have at least one char")
    }
  }

  test("mcnemar: discordant-pair statistic with continuity correction") {
    // b=2, c=1 -> corrected (|1|-1)^2/3 = 0
    val even = Seq((true, true), (true, false), (true, false), (false, true))
      .toDF("ok_a", "ok_b")
    val g1 = EvalMetrics.mcnemar(even, "ok_a", "ok_b")
      .as[(Long, Double, Double, Long, Long, Double)].collect().head
    assert(g1 == ((4L, 0.75, 0.5, 2L, 1L, 0.0)))
    // b=4, c=0 -> (3)^2/4 = 2.25
    val oneSided = (Seq.fill(4)((true, false)) ++ Seq.fill(2)((true, true)))
      .toDF("ok_a", "ok_b")
    val g2 = EvalMetrics.mcnemar(oneSided, "ok_a", "ok_b")
      .as[(Long, Double, Double, Long, Long, Double)].collect().head
    assert(g2 == ((6L, 1.0, 2.0 / 6, 4L, 0L, 2.25)))
    // no discordant pairs -> statistic 0
    val none = Seq((true, true), (false, false)).toDF("ok_a", "ok_b")
    assert(EvalMetrics.mcnemar(none, "ok_a", "ok_b")
      .select("statistic").as[Double].collect().head == 0.0)
  }
}
