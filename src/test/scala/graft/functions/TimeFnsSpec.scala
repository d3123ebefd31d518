package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Golden port of the reference's timedelta / convert_datetime /
  * human-time cases (tests/test_helpers.py:20-46, :163-196, :204-226).
  */
class TimeFnsSpec extends SparkSuite {

  private def ts(s: String) = lit(s).cast("timestamp")

  test("timedeltaSeconds: 60s delta") {
    assert(evalOne(TimeFns.timedeltaSeconds(ts("2023-01-01 10:01:00"), ts("2023-01-01 10:00:00"))) == 60L)
  }

  test("timedeltaMinutes: 1m delta") {
    assert(evalOne(TimeFns.timedeltaMinutes(ts("2023-01-01 10:01:00"), ts("2023-01-01 10:00:00"))) == 1L)
  }

  test("timedeltaMinutes floors negatives (-61s -> -2m, helpers.py //)") {
    assert(evalOne(TimeFns.timedeltaMinutes(ts("2023-01-01 09:58:59"), ts("2023-01-01 10:00:00"))) == -2L)
  }

  test("parse + format tracker wire datetime with TZ shift (UTC target)") {
    val parsed = TimeFns.parseTrackerDatetime(lit("2023-01-01T10:00:00.123+0300"))
    assert(evalOne(TimeFns.formatTracker(parsed, "UTC")) == "2023-01-01T07:00:00.123")
  }

  test("format in Europe/Moscow (+3)") {
    val parsed = TimeFns.parseTrackerDatetime(lit("2023-01-01T10:00:00.123+0000"))
    assert(evalOne(TimeFns.formatTracker(parsed, "Europe/Moscow")) == "2023-01-01T13:00:00.123")
  }

  test("date-only format is proper ISO (reference %Y-%d-%m bug not replicated)") {
    val parsed = TimeFns.parseTrackerDatetime(lit("2023-01-01T10:00:00.123+0000"))
    assert(evalOne(TimeFns.formatTrackerDate(parsed, "UTC")) == "2023-01-01")
  }

  private val humanCases = Seq(
    (60L, 2, "1m"), (300L, 2, "5m"), (320L, 2, "5m 20s"),
    (86700L, 2, "1d 5m"), (3200400L, 3, "1mo 1w 1h"), (0L, 2, "0s"))

  for ((s, v, out) <- humanCases)
    test(s"toHumanTime($s, $v) == '$out'") {
      assert(evalOne(TimeFns.toHumanTime(lit(s), v)) == out)
    }

  test("toHumanTime negative gets '-' prefix") {
    assert(evalOne(TimeFns.toHumanTime(lit(-320L), 2)) == "-5m 20s")
  }

  private val fromHumanCases = Seq(
    "1m" -> 60L, "5m" -> 300L, "5m 20s" -> 320L, "1d 5m" -> 86700L, "1mo 1w 1h" -> 3200400L)

  for ((in, out) <- fromHumanCases)
    test(s"fromHumanTime('$in') == $out") {
      assert(TimeFns.fromHumanTime(in) == out)
    }

  test("fromHumanTime raises on junk") {
    intercept[IllegalArgumentException](TimeFns.fromHumanTime("5x"))
  }

  test("bytesToHuman binary-prefix decomposition") {
    assert(TimeFns.bytesToHuman(1024L * 1024 * 1024 + 512L * 1024 * 1024) == "1GB, 512MB")
    assert(TimeFns.bytesToHuman(1536) == "1KB, 512B")
    assert(TimeFns.bytesToHuman(42) == "42B")
    assert(TimeFns.bytesToHuman(0) == "0B")
    assert(TimeFns.bytesToHuman((1L << 40) + (1L << 30) + 5, granularity = 3) == "1TB, 1GB, 5B")
  }
}
