package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val stages = Seq(
    col("event_type") === "view",
    col("event_type") === "click",
    col("event_type") === "purchase")

  test("first-touch chain: each stage matches its earliest eligible event") {
    val ev = Seq(
      // user 1: full chain inside the window
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // user 2: click BEFORE the first view must not count; level 1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3: purchase arrives past the 24h anchor window; level 2
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 11:00:00"), "click"),
      (3L, ts("2024-01-02 11:00:00"), "purchase"),
      // user 4: no view at all; level 0
      (4L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.steps(ev, "user_id", "ts", stages, 86400L)
      .select("user_id", "funnel_level").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("stage timestamps are the chain's matched events, nulls past the level") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "view"), // later view ignored (first-touch)
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 10:15:00"), "purchase") // before click: not eligible
    ).toDF("user_id", "ts", "event_type")
    val r = Funnel.steps(ev, "user_id", "ts", stages, 86400L).collect()(0)
    assert(r.getAs[Timestamp]("t1") == ts("2024-01-01 10:00:00"))
    assert(r.getAs[Timestamp]("t2") == ts("2024-01-01 11:00:00"))
    assert(r.getAs[Timestamp]("t3") == null)
    assert(r.getAs[Int]("funnel_level") == 2)
  }

  test("same-timestamp stage events chain (>= comparisons, zero-width funnel)") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq((1L, t0, "view"), (1L, t0, "click"), (1L, t0, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = Funnel.steps(ev, "user_id", "ts", stages, 86400L).collect()(0)
    assert(r.getAs[Int]("funnel_level") == 3)
  }

  test("the whole chain plans ONE exchange on the key") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val plan = Funnel.steps(ev, "user_id", "ts", stages, 86400L)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected one key exchange, plan:\n$plan")
  }

  test("kaplanMeier: hand-computed risk sets, censoring, and survival product") {
    val T = 1700000000000L
    def ts(offMs: Long) = new java.sql.Timestamp(T + offMs)
    val day = 86400000L
    val ev = Seq(
      // A: converts on day 2; B: never converts (censored at horizon =
      // A's purchase, dur 2); C: converts within day 0
      (1L, "click", ts(0)), (1L, "purchase", ts(2 * day)),
      (2L, "click", ts(0)),
      (3L, "click", ts(0)), (3L, "purchase", ts(3600000L))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.kaplanMeier(ev, "user_id", "event_type", "ts", "click", "purchase")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val grid = BigInt(1L << 40)
    val fp0 = grid * 2 / 3                  // day 0: n=3, d=1
    val fp2 = fp0 * 1 / 2                   // day 2: n=2, d=1
    assert(got == Seq(
      (0L, 3L, 1L, fp0.toLong, fp0.toLong.toDouble / grid.toDouble),
      (2L, 2L, 1L, fp2.toLong, fp2.toLong.toDouble / grid.toDouble)))
  }
}
