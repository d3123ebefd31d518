package graft.operators

import graft.SparkSuite

/** Forward-fill resampling: grid bounds, last-per-bucket, carry-forward,
  * and the is_gap audit column.
  */
class ResampleSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("grid spans first..last bucket; gaps carry the last observation") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1.0, 1L),
      (1L, ts("2024-01-01 00:50:00"), 2.0, 2L),   // same bucket: later wins
      (1L, ts("2024-01-01 03:30:00"), 7.0, 3L),   // 2 empty buckets before
      (2L, ts("2024-01-01 05:00:00"), 9.0, 4L)    // single-bucket key
    ).toDF("user_id", "ts", "value", "event_id")
    val out = Resample.forwardFill(ev, "user_id", "ts", "value", "event_id", 3600L)
      .orderBy("user_id", "bucket_ts")
      .as[(Long, java.sql.Timestamp, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, ts("2024-01-01 00:00:00"), 2.0, false),
      (1L, ts("2024-01-01 01:00:00"), 2.0, true),
      (1L, ts("2024-01-01 02:00:00"), 2.0, true),
      (1L, ts("2024-01-01 03:00:00"), 7.0, false),
      (2L, ts("2024-01-01 05:00:00"), 9.0, false)))
  }

  test("last-per-bucket tie-breaks on the tie column when timestamps collide") {
    val t = ts("2024-01-01 00:00:00")
    val ev = Seq((1L, t, 5.0, 1L), (1L, t, 6.0, 2L)).toDF("user_id", "ts", "value", "event_id")
    val out = Resample.forwardFill(ev, "user_id", "ts", "value", "event_id", 3600L)
      .select("value").as[Double].collect().toSeq
    assert(out == Seq(6.0))
  }

  test("forwardFill is invariant under repartitioning") {
    val rnd = new scala.util.Random(9)
    val base = ts("2024-01-01 00:00:00").getTime
    val ev = (1 to 200).map(i => (rnd.nextInt(4).toLong,
      new java.sql.Timestamp(base + rnd.nextInt(36) * 3600000L + rnd.nextInt(3600000)),
      rnd.nextInt(100).toDouble, i.toLong)).toDF("user_id", "ts", "value", "event_id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Resample.forwardFill(df, "user_id", "ts", "value", "event_id", 3600L)
        .as[(Long, java.sql.Timestamp, Double, Boolean)].collect()
        .sortBy(r => (r._1, r._2.getTime)).toSeq
    assert(run(ev) == run(ev.repartition(7)))
  }
}
