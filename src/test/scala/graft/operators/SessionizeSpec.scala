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

  test("compactRuns collapses same-value runs into SCD2 intervals") {
    val ev = Seq(
      // user 1: A A B A -> three runs; run value changes back to A (a
      // re-entered state must open a NEW interval, not merge)
      (1L, 1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, 2L, ts("2024-01-01 10:05:00"), "A"),
      (1L, 3L, ts("2024-01-01 10:10:00"), "B"),
      (1L, 4L, ts("2024-01-01 10:20:00"), "A"),
      // user 2: single event -> one current run
      (2L, 5L, ts("2024-01-01 09:00:00"), "X")
    ).toDF("user_id", "event_id", "ts", "status")
    val got = Sessionize.compactRuns(ev, Seq("user_id"), "ts", "status",
        tieCols = Seq("event_id"))
      .orderBy("user_id", "run_seq")
      .select("user_id", "run_seq", "status", "valid_from", "valid_to", "n_events", "is_current")
      .as[(Long, Long, String, Timestamp, Option[Timestamp], Long, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 1L, "A", ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 10:10:00")), 2L, false),
      (1L, 2L, "B", ts("2024-01-01 10:10:00"), Some(ts("2024-01-01 10:20:00")), 1L, false),
      (1L, 3L, "A", ts("2024-01-01 10:20:00"), None, 1L, true),
      (2L, 1L, "X", ts("2024-01-01 09:00:00"), None, 1L, true)))
  }

  test("compactRuns intervals tile the timeline: valid_to(run n) == valid_from(run n+1)") {
    val rnd = new scala.util.Random(13)
    val ev = (0 until 200).map { i =>
      (i % 5L, i.toLong, ts(f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00"),
        Seq("a", "b", "c")(rnd.nextInt(3)))
    }.toDF("user_id", "event_id", "ts", "status")
    val runs = Sessionize.compactRuns(ev, Seq("user_id"), "ts", "status", Seq("event_id"))
      .orderBy("user_id", "run_seq")
      .select("user_id", "valid_from", "valid_to")
      .as[(Long, Timestamp, Option[Timestamp])].collect().toSeq
    runs.groupBy(_._1).values.foreach { h =>
      h.sliding(2).foreach {
        case Seq((_, _, Some(to)), (_, from, _)) => assert(to == from)
        case _ => ()
      }
      // exactly one open (current) interval per key, and it is the last
      assert(h.count(_._3.isEmpty) == 1)
      assert(h.last._3.isEmpty)
    }
  }

  test("gapSweep: hand-computed session counts, monotone non-increasing in the gap") {
    // user a at minutes 0, 10, 50 (gaps 10m, 40m); user b at minute 0
    val rows = Seq(("a", 0L, 0L), ("a", 1L, 10L), ("a", 2L, 50L), ("b", 3L, 0L))
      .map { case (u, id, m) => (u, id, new Timestamp(m * 60000L)) }
    val df = rows.toDF("user_id", "event_id", "ts")
    val got = Sessionize.gapSweep(df, Seq("user_id"), "ts",
      gapsMinutes = Seq(5, 30, 60), tieCols = Seq("event_id"))
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // gap 5m: both of a's gaps split -> 2 firsts + 2 = 4 sessions
    // gap 30m: only the 40m gap splits -> 3; gap 60m: none -> 2
    assert(got == Seq((5, 4L, 4L, 1.0), (30, 3L, 4L, 4.0 / 3.0), (60, 2L, 4L, 2.0)))
  }
}
