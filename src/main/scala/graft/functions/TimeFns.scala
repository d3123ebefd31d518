package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time/duration column functions.
  *
  * Mirrors the reference's datetime helpers
  * (`/root/reference/tracker_exporter/utils/helpers.py:27-37` timedelta,
  * `:120-146` convert_datetime, `:189-244` human time) as native column
  * expressions. All timestamps are real `TimestampType` (the reference
  * ships strings; storing typed timestamps is the Spark-first design,
  * SURVEY.md §1.2).
  */
object TimeFns {

  /** Whole seconds between two timestamps, truncated toward zero —
    * `int((end - start).total_seconds())` (helpers.py:27-37).
    * Exact for spans under ~285 years (2^53 microseconds).
    */
  def timedeltaSeconds(end: Column, start: Column): Column =
    ((unix_micros(end) - unix_micros(start)) / lit(1000000L)).cast("long")

  /** Same, in whole minutes — floor division of the seconds delta
    * (`delta // 60`, helpers.py:36: -61s → -2m, not -1m).
    */
  def timedeltaMinutes(end: Column, start: Column): Column =
    floor(timedeltaSeconds(end, start) / lit(60.0)).cast("long")

  /** Parse the tracker's ISO-8601 wire format
    * `%Y-%m-%dT%H:%M:%S.%f%z` (milliseconds + numeric offset) into a
    * proper UTC timestamp (helpers.py:120-141). Naive inputs are treated
    * as UTC by the session timezone (set to UTC engine-wide).
    */
  def parseTrackerDatetime(c: Column): Column =
    to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss.SSSXX")

  /** Format a timestamp in a target timezone using the reference's
    * ClickHouse-facing format with millisecond truncation
    * (helpers.py:142-146).
    */
  def formatTracker(ts: Column, tz: String): Column =
    date_format(from_utc_timestamp(ts, tz), "yyyy-MM-dd'T'HH:mm:ss.SSS")

  /** Date-only variant. The reference formats `%Y-%d-%m` — a transposed
    * day/month bug (helpers.py:142, flagged in SURVEY.md §2.8 F3) we do
    * NOT replicate; proper ISO `yyyy-MM-dd` instead.
    */
  def formatTrackerDate(ts: Column, tz: String): Column =
    date_format(from_utc_timestamp(ts, tz), "yyyy-MM-dd")

  /** Greedy unit decomposition used by `to_human_time`
    * (helpers.py:189-216): y=360d, mo=30d, w, d, h, m, s.
    * Note the reference's year is 360 days here but 365 days in
    * `from_human_time` — an asymmetry we preserve.
    */
  private val units: Seq[(String, Long)] = Seq(
    "y" -> 31104000L, "mo" -> 2592000L, "w" -> 604800L,
    "d" -> 86400L, "h" -> 3600L, "m" -> 60L, "s" -> 1L
  )

  /** Seconds → `"2w 3d"`-style human duration, top-`verbosity` non-zero
    * units, `-` prefix for negatives, `"0s"` for zero. Pure column
    * expression (divmod cascade + array filter/slice/join) — codegen'd,
    * no UDF.
    */
  def toHumanTime(seconds: Column, verbosity: Int = 2): Column = {
    val total = abs(seconds.cast("long"))
    // sequential divmod cascade (greedy subtract): v_i = r_{i-1}/unit_i,
    // r_i = r_{i-1} % unit_i — units are NOT mutually divisible (mo=30d,
    // w=7d), so the remainder must thread through.
    var rem = total
    val parts = units.map { case (name, cnt) =>
      val v = floor(rem / lit(cnt.toDouble)).cast("long")
      rem = rem % lit(cnt)
      (name, v)
    }
    val strs = parts.map { case (name, v) =>
      when(v > 0, concat(v.cast("string"), lit(name))).otherwise(lit(null).cast("string"))
    }
    val joined = array_join(slice(filter(array(strs: _*), x => x.isNotNull), 1, verbosity), " ")
    when(seconds.cast("long") === 0, lit("0s"))
      .when(seconds.cast("long") < 0, concat(lit("-"), joined))
      .otherwise(joined)
  }

  /** F11 `bytes_to_human` (helpers.py:301-320): greedy binary-prefix
    * decomposition, top-`granularity` units, comma-joined. Logging util —
    * plain Scala, not an operator. The reference returns int 0 for zero
    * bytes (a type quirk); we return "0B".
    */
  def bytesToHuman(bytes: Long, granularity: Int = 2): String = {
    if (bytes == 0) return "0B"
    val sizes = Seq("TB" -> (1L << 40), "GB" -> (1L << 30), "MB" -> (1L << 20), "KB" -> 1024L, "B" -> 1L)
    var rem = bytes
    val parts = sizes.flatMap { case (name, count) =>
      val v = rem / count
      if (v != 0) { rem -= v * count; Some(s"$v$name") } else None
    }
    parts.take(granularity).mkString(", ")
  }

  /** `"1mo 1w 1h"` → seconds (helpers.py:219-244). Driver/config-side
    * parsing (search ranges like `1w`), not an operator — plain Scala.
    * Reference quirk preserved: y=365d here (vs 360d in toHumanTime).
    */
  def fromHumanTime(timestr: String): Long = {
    val patterns = Seq(
      "y" -> 365L * 86400, "mo" -> 30L * 86400, "w" -> 7L * 86400,
      "d" -> 86400L, "h" -> 3600L, "m" -> 60L, "s" -> 1L
    )
    var rest = timestr
    var total = 0L
    for ((unit, mult) <- patterns) {
      val re = ("(\\d+)" + unit).r
      re.findFirstMatchIn(rest).foreach { m => total += m.group(1).toLong * mult }
      rest = re.replaceAllIn(rest, "")
    }
    if (rest.trim.nonEmpty)
      throw new IllegalArgumentException(s"Invalid format detected in the string: '${rest.trim}'")
    total
  }
}
