package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions.col

class ExpectationsSpec extends SparkSuite {

  import spark.implicits._

  private val rules = Seq(
    "nonneg" -> (col("v") >= 0),
    "named" -> col("name").isNotNull)

  private val df = Seq(
    (1L, 5.0, "a"),                          // clean
    (2L, -1.0, "b"),                         // fails nonneg
    (3L, 2.0, null.asInstanceOf[String]),    // fails named
    // NOTE: Spark SQL orders NaN ABOVE every number, so NaN >= 0 is
    // TRUE — a rule that must reject NaN needs an explicit isnan()
    (4L, java.lang.Double.NaN, null.asInstanceOf[String])
  ).toDF("id", "v", "name")

  test("check labels each row with its failed rules; null predicate = violation") {
    val got = Expectations.check(df, rules)
      .select("id", "failed_rules").as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Nil)
    assert(got(2L) == Seq("nonneg"))
    assert(got(3L) == Seq("named"))
    assert(got(4L) == Seq("named")) // NaN passes nonneg (Spark NaN ordering)
  }

  test("passing/quarantined split the batch exactly") {
    val checked = Expectations.check(df, rules)
    assert(Expectations.passing(checked).select("id").as[Long].collect().toSeq == Seq(1L))
    assert(Expectations.quarantined(checked).select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
    // id 4 is quarantined by `named` alone — see the NaN note above
    // passing drops the bookkeeping column
    assert(!Expectations.passing(checked).columns.contains("failed_rules"))
  }

  test("summary reports every rule, including zero-violation ones") {
    val got = Expectations.summary(df, rules :+ ("id_positive" -> (col("id") > 0)))
      .select("rule", "n_violations", "n_rows").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("nonneg") == (1L, 4L)) // NaN passes nonneg (Spark NaN ordering)
    assert(got("named") == (2L, 4L))
    assert(got("id_positive") == (0L, 4L))
  }

  test("iqrOutliers flags only values beyond the per-stratum Tukey fences, with side") {
    // en: 1,2,3,4,5,6,7,100 -> q1 = value at ceil(8*.25)=rank 2 = 2, q3 = rank 6 = 6,
    // fences [2-6, 6+6] = [-4, 12]: only 100 is out (high)
    // de: tight cluster, no outliers
    val df = (Seq(1, 2, 3, 4, 5, 6, 7, 100).map(v => ("en", v.toLong)) ++
      Seq(("de", 10L), ("de", 11L), ("de", 12L))).toDF("lang", "v")
    val got = Expectations.iqrOutliers(df, "lang", "v")
      .select("lang", "v", "q1", "q3", "side").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(("en", 100L, 2L, 6L, "high")))
    // a low outlier is flagged on the other side
    val low = Seq(50, 51, 52, 53, 54, 55, 56, 1).map(v => ("en", v.toLong)).toDF("lang", "v")
    val got2 = Expectations.iqrOutliers(low, "lang", "v").select("v", "side").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got2.toSeq == Seq((1L, "low")))
  }

  test("histogramQuantiles upper-bounds the exact percentile within binWidth") {
    val rnd = new scala.util.Random(31)
    val data = (0 until 4000).map { i =>
      (if (i % 3 == 0) "en" else "de", rnd.nextInt(500).toLong)
    }
    val w = 16L
    val est = Expectations.histogramQuantiles(data.toDF("lang", "v"), "lang", col("v"), w, Seq(5000, 9900))
      .select("lang", "p_bp", "est_value").as[(String, Int, Long)].collect()
      .map { case (l, p, e) => (l, p) -> e }.toMap
    // exact discrete percentile, computed independently on the driver
    val groups = data.groupBy(_._1).map { case (l, vs) => l -> vs.map(_._2).sorted }
    for (l <- Seq("en", "de"); p <- Seq(5000, 9900)) {
      val vs = groups(l)
      val exact = vs(((vs.size * p + 9999) / 10000 - 1).toInt)
      val e = est((l, p))
      assert(e >= exact && e - exact < w, s"$l p$p: est $e exact $exact")
    }
  }

  test("histogramQuantiles is partitioning-invariant and hits the exact value when binWidth is 1") {
    val df = (1 to 100).map(v => ("x", v.toLong)).toDF("lang", "v")
    val got = Expectations.histogramQuantiles(df.repartition(7), "lang", col("v"), 1L, Seq(5000, 9000))
      .select("p_bp", "est_value").as[(Int, Long)].collect().toMap
    assert(got == Map(5000 -> 50L, 9000 -> 90L))
  }

  test("poissonBootstrapMean replays the hash-derived weights and exact replica means") {
    def md24(s: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      ((h(0) & 0xffL) << 16) | ((h(1) & 0xffL) << 8) | (h(2) & 0xffL)
    }
    val cum = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563)
    def weight(id: Long, r: Int): Long = {
      val u = (md24(s"boot:$id:$r") + 0.5) / 16777216.0
      cum.indexWhere(u < _) match { case -1 => 5L; case k => k.toLong }
    }
    val vals = (1L to 50L).map(i => (i, i * 3 + 7))
    val df = vals.toDF("id", "v")
    val out = Expectations.poissonBootstrapMean(df, "id", "v", replicas = 8)
      .select("replica", "n_eff", "mean").as[(Int, Long, Double)].collect()
      .sortBy(_._1).toSeq
    assert(out.size == 8)
    for ((r, nEff, mean) <- out) {
      val ws = vals.map { case (id, v) => (weight(id, r), v) }
      val wantN = ws.map(_._1).sum
      val wantMean = ws.map { case (w, v) => w * v }.sum.toDouble / wantN.toDouble
      assert(nEff == wantN, s"replica $r n_eff")
      assert(mean == wantMean, s"replica $r mean")
    }
    // summary columns: constant across rows, std > 0 on a real resample
    val summary = Expectations.poissonBootstrapMean(df, "id", "v", replicas = 8)
      .select("boot_mean", "boot_std").as[(Float, Float)].collect().distinct
    assert(summary.length == 1 && summary.head._2 > 0.0f)
  }

  test("poissonBootstrapMean is partitioning-invariant") {
    val df = (1L to 60L).map(i => (i, i % 17 + 1)).toDF("id", "v")
    def run(x: org.apache.spark.sql.DataFrame) =
      Expectations.poissonBootstrapMean(x, "id", "v", replicas = 4)
        .select("replica", "n_eff", "mean").as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(df) == run(df.repartition(7)))
  }

  test("exactQuantileBisect: hand-computed order statistics") {
    def run(vs: Seq[Long], num: Int, den: Int) =
      Expectations.exactQuantileBisect(vs.toDF("value_fp"), "value_fp", num, den)
        .as[(Long, Long, Long)].collect().head
    assert(run(Seq(1L, 3L, 5L, 7L), 1, 2) == ((4L, 2L, 3L)))   // median, even n
    assert(run(Seq(1L, 3L, 5L), 1, 2) == ((3L, 2L, 3L)))       // median, odd n
    assert(run(Seq(2L, 2L, 2L, 9L), 1, 2) == ((4L, 2L, 2L)))   // duplicate mass
    assert(run(Seq(10L, 20L, 30L, 40L), 1, 4) == ((4L, 1L, 10L))) // q1
    assert(run(Seq(10L, 20L, 30L, 40L), 1, 1) == ((4L, 4L, 40L))) // max
    // negative domain: floorDiv keeps the bracket correct
    assert(run(Seq(-7L, -3L, 5L), 1, 2) == ((3L, 2L, -3L)))
  }

  test("madOutliers: hand-computed medians, MAD, and modified z flags") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // vals (1,2,3,4,100): med = 3 (rank (5+1)/2), |dev| sorted
    // (0,1,1,2,97) -> mad = 1; 6745*dev > 35000 flags only dev=97
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 100L))
      .toDF("doc_id", "x").withColumn("g", org.apache.spark.sql.functions.lit("a"))
    val got = Expectations.madOutliers(df, "g", col("x"), "doc_id")
      .as[(String, Long, Long, Long, Long, Double)].collect().head
    assert(got == (("a", 5L, 3L, 1L, 1L, 0.2)), got.toString)
  }
}
