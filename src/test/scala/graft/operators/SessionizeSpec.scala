package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class SessionizeSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("gap rule: strictly-greater-than-gap starts a new session; boundary gap does not") {
    val ev = Seq(
      // user 1: 3 events 10 min apart (one session), then a 31-min hole,
      // then one more (second session)
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:10:00")),
      (1L, 3L, ts("2024-01-01 10:20:00")),
      (1L, 4L, ts("2024-01-01 10:51:00")),
      // user 2: gap EXACTLY 30 min -> same session (rule is >, not >=)
      (2L, 5L, ts("2024-01-01 09:00:00")),
      (2L, 6L, ts("2024-01-01 09:30:00"))
    ).toDF("user_id", "event_id", "ts")
    val got = Sessionize.assign(ev, Seq("user_id"), "ts", gapSeconds = 1800,
        tieCols = Seq("event_id"))
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L, 6L -> 1L))
  }

  test("sessions are per key and 1-based per key") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 2L, ts("2024-01-01 10:00:01")) // different user: its own session 1
    ).toDF("user_id", "event_id", "ts")
    val got = Sessionize.assign(ev, Seq("user_id"), "ts", 1800, Seq("event_id"))
      .select("user_id", "session_seq").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L)))
  }
}
