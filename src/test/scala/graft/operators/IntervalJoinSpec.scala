package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bucket-decomposed point-in-interval join: containment semantics
  * (start inclusive, end exclusive), bucket-boundary spanning, overlap
  * multiplicity, and equivalence to a brute-force non-equi join.
  */
class IntervalJoinSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("containment edges: start inclusive, end exclusive, keys separate") {
    val intervals = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, 200L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "iv_id", "w_start", "w_end")
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // == start: in
      (1L, 11L, ts("2024-01-01 10:59:59")),  // inside
      (1L, 12L, ts("2024-01-01 11:00:00")),  // == end: OUT
      (1L, 13L, ts("2024-01-01 09:59:59")),  // before: out
      (2L, 20L, ts("2024-01-01 10:30:00")),  // other key, its own interval
      (3L, 30L, ts("2024-01-01 10:30:00"))   // key without intervals
    ).toDF("user_id", "p_id", "ts")
    val out = IntervalJoin.pointInInterval(points, "ts", intervals,
      "w_start", "w_end", Seq("user_id"), bucketSeconds = 900L)
      .select("iv_id", "p_id").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((100L, 10L), (100L, 11L), (200L, 20L)))
  }

  test("intervals spanning many buckets still match once per pair; empty intervals drop") {
    val intervals = Seq(
      (1L, 1L, ts("2024-01-01 00:00:10"), ts("2024-01-01 03:00:00")), // spans 12 buckets
      (1L, 2L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:00:00"))  // empty
    ).toDF("user_id", "iv_id", "w_start", "w_end")
    val points = Seq(
      (1L, 10L, ts("2024-01-01 00:00:10")),
      (1L, 11L, ts("2024-01-01 01:00:00")),  // matches iv 1 only (iv 2 empty)
      (1L, 12L, ts("2024-01-01 02:59:59"))
    ).toDF("user_id", "p_id", "ts")
    val out = IntervalJoin.pointInInterval(points, "ts", intervals,
      "w_start", "w_end", Seq("user_id"), bucketSeconds = 900L)
      .select("iv_id", "p_id").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 10L), (1L, 11L), (1L, 12L)))
  }

  test("overlapping intervals each claim the point; matches equal the brute-force join") {
    val rnd = new scala.util.Random(3)
    val base = ts("2024-01-01 00:00:00").getTime
    val intervals = (1 to 40).map { i =>
      val s = base + rnd.nextInt(86400) * 1000L
      (rnd.nextInt(3).toLong, i.toLong,
        new java.sql.Timestamp(s), new java.sql.Timestamp(s + (300 + rnd.nextInt(7200)) * 1000L))
    }.toDF("user_id", "iv_id", "w_start", "w_end")
    val points = (1 to 300).map { i =>
      (rnd.nextInt(3).toLong, i.toLong,
        new java.sql.Timestamp(base + rnd.nextInt(86400) * 1000L))
    }.toDF("user_id", "p_id", "ts")
    val got = IntervalJoin.pointInInterval(points, "ts", intervals,
      "w_start", "w_end", Seq("user_id"), bucketSeconds = 600L)
      .select("iv_id", "p_id").as[(Long, Long)].collect().sorted.toSeq
    val brute = intervals.as("i").join(points.as("p"),
        col("i.user_id") === col("p.user_id")
          && col("p.ts") >= col("i.w_start") && col("p.ts") < col("i.w_end"))
      .select(col("i.iv_id"), col("p.p_id")).as[(Long, Long)].collect().sorted.toSeq
    assert(got == brute)
    assert(got.nonEmpty, "fixture must produce matches")
    // the fixture contains overlap: some point sits in 2+ intervals, and
    // the bucket join must emit it once PER interval
    assert(got.map(_._2).distinct.size < got.size,
      "fixture should exercise overlapping intervals")
  }

  test("intervalOverlap: each overlapping pair exactly once with the exact length, vs brute force") {
    val rnd = new scala.util.Random(9)
    val base = ts("2024-01-01 00:00:00").getTime
    def mk(n: Int, maxLenS: Int, tag: String) = (1 to n).map { i =>
      val s = base + rnd.nextInt(86400) * 1000L
      (rnd.nextInt(3).toLong, i.toLong,
        new java.sql.Timestamp(s), new java.sql.Timestamp(s + (60 + rnd.nextInt(maxLenS)) * 1000L))
    }.toDF("user_id", s"${tag}_id", s"${tag}_start", s"${tag}_end")
    val a = mk(40, 7200, "a")
    val b = mk(60, 3600, "b")
    // spans up to 2h/1h against 10-min buckets: heavy multi-bucket sharing
    val got = IntervalJoin.intervalOverlap(a, "a_start", "a_end", b, "b_start", "b_end",
      Seq("user_id"), bucketSeconds = 600L)
      .select("a_id", "b_id", "overlap_us").as[(Long, Long, Long)].collect().sorted.toSeq
    val brute = a.as("x").join(b.as("y"), col("x.user_id") === col("y.user_id")
        && col("x.a_start") < col("y.b_end") && col("y.b_start") < col("x.a_end"))
      .select(col("x.a_id"), col("y.b_id"),
        (org.apache.spark.sql.functions.expr("unix_micros(least(a_end, b_end))")
          - org.apache.spark.sql.functions.expr("unix_micros(greatest(a_start, b_start))"))
          .as("o")).as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == brute)
    assert(got.nonEmpty && got.map(t => (t._1, t._2)).distinct.size == got.size,
      "every pair exactly once")
  }

  test("intervalOverlap: touching endpoints don't match; containment yields the inner length") {
    val a = Seq((1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("user_id", "a_id", "a_start", "a_end")
    val b = Seq(
      (1L, 1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")), // abuts: no overlap
      (1L, 2L, ts("2024-01-01 10:15:00"), ts("2024-01-01 10:30:00")), // contained: 15 min
      (2L, 3L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))) // other key
      .toDF("user_id", "b_id", "b_start", "b_end")
    val out = IntervalJoin.intervalOverlap(a, "a_start", "a_end", b, "b_start", "b_end",
      Seq("user_id"), bucketSeconds = 600L)
      .select("b_id", "overlap_us").as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 15L * 60L * 1000000L)))
  }
}
