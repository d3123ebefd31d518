package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence (funnel) matching — the engine-side analog of
  * ClickHouse's `windowFunnel` (the reference's storage engine ships it
  * as a built-in aggregate; BI queries over tracker events are exactly
  * this shape): per key, find the first-touch chain stage₁ → stage₂ →
  * … → stageₙ where each stage's event is at or after the previous
  * stage's match and the whole chain fits inside `windowSeconds` of the
  * stage-1 anchor. First-touch semantics: each stage matches its
  * EARLIEST eligible event (`min` over the key), so the result is
  * deterministic and order-independent — the common product-analytics
  * funnel definition (ClickHouse's greedy windowFunnel can additionally
  * restart chains mid-stream; first-touch is the variant with an exact
  * closed form).
  *
  * Emits one row per key: (`keyCol`, `funnel_level`, `t1` … `tn`) —
  * level = deepest stage reached (0 when stage 1 never fires), `ti` =
  * the matched timestamp (null past the reached level).
  *
  * Plan at 100 TB: the whole chain compiles to ONE hash exchange on the
  * key — each stage is an unbounded-frame window `min` over the SAME
  * partitioning (stage i's predicate reads stage i−1's column, so the
  * windows chain inside one sort), and the final per-key collapse is a
  * hash aggregate on already-partitioned rows. No self-joins, no range
  * join, no per-key array materialization — the alternative stepwise
  * join plan costs n−1 shuffles and re-reads the events n−1 times.
  */
object Funnel {

  def steps(events: DataFrame, keyCol: String, tsCol: String,
            stages: Seq[Column], windowSeconds: Long): DataFrame = {
    require(stages.size >= 2, "need at least 2 funnel stages")
    val key = col(keyCol)
    val ts = col(tsCol)
    val w = Window.partitionBy(key)
    val deadline = unix_micros(col("t1")) + windowSeconds * 1000000L
    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (cond, i)) =>
      val eligible =
        if (i == 0) cond
        else cond && unix_micros(ts) >= unix_micros(col(s"t$i")) &&
          unix_micros(ts) <= deadline
      df.withColumn(s"t${i + 1}", min(when(eligible, ts)).over(w))
    }
    val n = stages.size
    // fold 1..n so the DEEPEST stage's check wraps outermost
    val level = (1 to n).foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t$i").isNotNull, lit(i)).otherwise(acc)
    }
    staged
      .groupBy(key)
      .agg(max(col("t1")).as("t1"),
        (2 to n).map(i => max(col(s"t$i")).as(s"t$i")): _*)
      .withColumn("funnel_level", level)
  }
}
