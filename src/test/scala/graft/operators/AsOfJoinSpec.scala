package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOf picks the latest right row at or before each left row, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after two clicks -> latest (09:30)
      (1L, 11L, ts("2024-01-01 09:00:00")), // exactly at a click -> inclusive
      (1L, 12L, ts("2024-01-01 08:00:00")), // before any click -> null
      (2L, 20L, ts("2024-01-01 12:00:00"))  // other key: only its own rows visible
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 09:30:00"), 101L),
      (2L, ts("2024-01-01 11:00:00"), 200L),
      (3L, ts("2024-01-01 00:00:00"), 300L) // unrelated key never leaks
    ).toDF("user_id", "ts", "click_id")

    val got = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("click_id"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(10L -> Some(101L), 11L -> Some(100L), 12L -> None, 20L -> Some(200L)))
  }

  test("asOf payload fields all come from the SAME right row (struct carry, not per-column)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    // the newer right row has a null tag: per-column carry-forward would
    // stitch (newer id, older tag); the struct carry must keep both from
    // the newest row
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "old"),
      (1L, ts("2024-01-01 09:30:00"), 2L, null.asInstanceOf[String])
    ).toDF("user_id", "ts", "rid", "tag")
    val r = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("rid", "tag"))
      .select("asof_rid", "asof_tag").collect()(0)
    assert(r.getLong(0) == 2L && r.isNullAt(1))
  }

  test("asOf is deterministic under duplicate right timestamps (payload tiebreak)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 5L),
      (1L, ts("2024-01-01 09:00:00"), 9L)
    ).toDF("user_id", "ts", "rid")
    val runs = (1 to 3).map { _ =>
      AsOfJoin.asOf(left, right.repartition(7), Seq("user_id"), "ts", "ts", Seq("rid"))
        .select("asof_rid").as[Long].collect().toSeq
    }
    // ties order by the payload struct: the largest payload wins, every run
    assert(runs.forall(_ == Seq(9L)))
  }
}
