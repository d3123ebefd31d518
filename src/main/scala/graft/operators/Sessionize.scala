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
}
