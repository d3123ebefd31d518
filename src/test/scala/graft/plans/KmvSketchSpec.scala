package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite

class KmvSketchSpec extends SparkSuite {
  import spark.implicits._

  graft.plans.GraftExtensions.register(spark)

  // deterministic pseudo-random coin stream in the engine's 2^24 coin
  // space, with planted duplicates (every value appears 1-3 times)
  private def coinStream(n: Int, seed: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).flatMap { _ =>
      val v = rnd.nextInt(1 << 24).toLong
      Seq.fill(1 + rnd.nextInt(3))(v)
    }
  }

  test("kmv_min_k equals the min-k of the exact distinct coin set") {
    val coins = coinStream(5000, seed = 7)
    val got = coins.toDF("coin")
      .agg(call_function("kmv_min_k", col("coin"), lit(64)).as("mink"))
      .as[Seq[Long]].head()
    val want = coins.distinct.sorted.take(64)
    assert(got == want)
  }

  test("kmv_min_k is invariant under partitioning and returns the full set when under-filled") {
    val coins = coinStream(2000, seed = 11)
    def run(parts: Int): Seq[Long] = coins.toDF("coin").repartition(parts)
      .agg(call_function("kmv_min_k", col("coin"), lit(64)).as("mink"))
      .as[Seq[Long]].head()
    assert(run(1) == run(7))
    assert(run(7) == run(32))
    // under-filled buffer: fewer distinct values than k → the whole set
    val small = Seq(5L, 3L, 5L, 9L, 3L).toDF("coin")
      .agg(call_function("kmv_min_k", col("coin"), lit(64)).as("mink"))
      .as[Seq[Long]].head()
    assert(small == Seq(3L, 5L, 9L))
  }

  test("the k=256 estimate lands inside the 1/sqrt(k) error envelope on a 20k-value stream") {
    val k = 256
    val coins = coinStream(20000, seed = 23)
    val exact = coins.distinct.size.toLong
    val est = coins.toDF("coin")
      .agg(call_function("kmv_min_k", col("coin"), lit(k)).as("mink"))
      .select(KmvMinK.estimate(col("mink"), k, (1 << 24).toDouble).as("est"))
      .as[Double].head()
    // KMV std error ~ 1/sqrt(k-2) ~ 6.3%; 4 sigma is a deterministic
    // bound on this fixed stream, not a flaky statistical assertion
    val relErr = math.abs(est - exact.toDouble) / exact.toDouble
    assert(relErr < 0.25, s"est $est vs exact $exact (relErr $relErr)")
  }

  test("kmv_min_k works per-group and composes with other aggregates") {
    val df = Seq(
      ("en", 10L), ("en", 20L), ("en", 10L), ("en", 30L),
      ("de", 100L), ("de", 200L))
      .toDF("lang", "coin")
    val out = df.groupBy(col("lang"))
      .agg(
        countDistinct(col("coin")).as("exact"),
        call_function("kmv_min_k", col("coin"), lit(2)).as("mink"))
      .orderBy(col("lang"))
      .select(col("lang"), col("exact"), col("mink"))
      .as[(String, Long, Seq[Long])].collect()
    assert(out.toSeq == Seq(("de", 2L, Seq(100L, 200L)), ("en", 3L, Seq(10L, 20L))))
  }
}
