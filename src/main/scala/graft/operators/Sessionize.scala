package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the gap-based event grouping of every
  * behavioral/agent-trace pipeline: per key, a new session starts when
  * the silence since the previous event exceeds `gapSeconds`; the
  * session id is the running count of session starts (1-based, so it
  * doubles as "the user's nth session").
  *
  * The classic two-window shape, both over the SAME (key, time) sort:
  * `lag` marks session starts, a running `sum` turns marks into ids —
  * Catalyst evaluates both in one Window operator after one hash
  * exchange on the key, so the whole assignment costs one shuffle and
  * one per-key sort, no joins, no state. (Streaming gets the same
  * semantics from `session_window` / flatMapGroupsWithState — see
  * graft.streaming; this is the batch/backfill form.)
  */
object Sessionize {

  /** Appends `session_seq` (1-based per-key session index). `tieCols`
    * deterministically orders events with equal timestamps (gap = 0
    * either way, so session ASSIGNMENT is tie-independent; the tiebreak
    * just fixes the sort for reproducible plans).
    */
  def assign(events: DataFrame, keys: Seq[String], tsCol: String,
             gapSeconds: Long, tieCols: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val gapUs = unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w))
    events
      .withColumn("_ns",
        when(gapUs.isNull || gapUs > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("_ns")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_ns")
  }

  /** Session-gap threshold sweep — the measurement behind [[assign]]'s
    * `gapSeconds` knob (every sessionization ships a 30-minute default
    * nobody re-derives): for each candidate gap, how many sessions the
    * corpus splits into and the resulting events-per-session. ONE lag
    * pass over the corpus (same window [[assign]] pays) + ONE aggregate
    * computing every threshold's count as a conditional sum — the
    * sweep never re-scans, the `dedup_threshold_sweep` discipline.
    * n_sessions(t) = #first-events + #gaps > t, exact integers; the
    * events-per-session ratio is one float division per threshold row.
    *
    * Emits (gap_min, n_sessions, n_events, events_per_session),
    * thresholds ascending — n_sessions is provably non-increasing.
    */
  def gapSweep(events: DataFrame, keys: Seq[String], tsCol: String,
               gapsMinutes: Seq[Int], tieCols: Seq[String] = Nil): DataFrame = {
    require(gapsMinutes.nonEmpty && gapsMinutes.forall(_ >= 1), "need positive gaps")
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val lagged = events
      .withColumn("_gap_us",
        unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)))
    val aggs =
      count(lit(1)).as("_ne") +:
        sum(when(col("_gap_us").isNull, 1L).otherwise(0L)).as("_nf") +:
        gapsMinutes.map(t =>
          sum(when(col("_gap_us") > t * 60000000L, 1L).otherwise(0L)).as(s"_g$t"))
    val one = lagged.agg(aggs.head, aggs.tail: _*)
    one
      .select(explode(array(gapsMinutes.map(t => struct(
        lit(t).as("gap_min"),
        (col("_nf") + col(s"_g$t")).as("n_sessions"),
        col("_ne").as("n_events"))): _*)).as("_r"))
      .select(col("_r.gap_min"), col("_r.n_sessions"), col("_r.n_events"))
      .withColumn("events_per_session",
        col("n_events").cast("double") / col("n_sessions").cast("double"))
      .orderBy(col("gap_min"))
  }

  /** Event-stream → SCD2 compaction: consecutive events with the same
    * `valueCol` per key collapse into one validity interval — the
    * islands-and-gaps rewrite of an event log into a slowly-changing-
    * dimension history (the batch analog of the reference's "latest
    * version wins" tables, keeping the FULL history instead of the last
    * row). Emits one row per run: (`keys`, `run_seq`, `valueCol`,
    * `valid_from`, `valid_to`, `n_events`, `is_current`), where
    * `valid_to` = the next run's `valid_from` (null on the current run).
    *
    * Three window passes and one aggregate, all over the SAME key
    * partitioning and time sort, so Catalyst plans ONE hash exchange on
    * the key: `lag` marks value changes, a running `sum` numbers the
    * runs, the groupBy collapses them, and `lead` back-fills `valid_to`
    * — no self-join, no range join. A key's whole history must fit one
    * partition's sort (the standard SCD2 envelope: histories are
    * per-entity, bounded, and far smaller than the corpus).
    */
  def compactRuns(events: DataFrame, keys: Seq[String], tsCol: String,
                  valueCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val changed = lag(col(valueCol), 1).over(w).isNull ||
      lag(col(valueCol), 1).over(w) =!= col(valueCol)
    val runs = events
      .withColumn("_chg", when(changed, 1L).otherwise(0L))
      .withColumn("run_seq",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys.map(col) :+ col("run_seq")): _*)
      .agg(
        first(col(valueCol)).as(valueCol),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wr = Window.partitionBy(keys.map(col): _*).orderBy(col("run_seq"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
