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

  /** Kaplan–Meier time-to-conversion survival curve (Kaplan & Meier
    * 1958 — the censoring-correct answer to "how long until users
    * convert", where a naive average silently drops everyone who
    * hasn't converted YET): subjects enter at their first `startType`
    * event; converters contribute an event at day
    * ⌊(t_event − t_start)/day⌋, everyone else is right-censored at the
    * corpus horizon (max ts). At each event day t:
    * S(t) = S(t⁻) · (n_t − d_t)/n_t with n_t = subjects still at risk.
    *
    * Scale split: subject durations are two corpus-grain aggregates +
    * one key join; the (day, d, n) risk table is DAYS-sized, its
    * at-risk suffix sum a bounded single-partition window (the skyline
    * contract), and the inherently-sequential survival product runs on
    * the driver over that bounded table in exact BigInt fixed point
    * (2⁻⁴⁰ grid, floor per step — the attribution-solve discipline),
    * replayed by a recursive CTE in the oracle. Returns one row per
    * event day: (`day`, `n_risk`, `n_events`, `surv_fp`, `surv`).
    */
  def kaplanMeier(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
                  startType: String, eventType: String): DataFrame = {
    val spark = events.sparkSession
    val DayUs = 86400000000L
    val starts = events.where(col(typeCol) === startType)
      .groupBy(col(userCol).as("_u")).agg(min(col(tsCol)).as("_t0"))
    val conv = events.where(col(typeCol) === eventType)
      .select(col(userCol).as("_u"), col(tsCol).as("_te"))
      .join(starts, Seq("_u"))
      .where(col("_te") >= col("_t0"))
      .groupBy(col("_u")).agg(min(col("_te")).as("_te"))
    val horizon = events.agg(max(col(tsCol)).as("_mx"))
    val subjects = starts.join(conv, Seq("_u"), "left")
      .crossJoin(broadcast(horizon))
      .select(col("_u"),
        when(col("_te").isNotNull,
          expr(s"(unix_micros(_te) - unix_micros(_t0)) div $DayUs"))
          .otherwise(expr(s"(unix_micros(_mx) - unix_micros(_t0)) div $DayUs"))
          .as("_dur"),
        col("_te").isNotNull.as("_event"))
    val wAtRisk = Window.orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = subjects.groupBy(col("_dur").as("day"))
      .agg(sum(when(col("_event"), 1L).otherwise(0L)).as("d"), count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(wAtRisk))
      .where(col("d") > 0)
      .select(col("day"), col("d"), col("n"))
      .orderBy(col("day"))
      .collect() // bounded: one row per distinct event DAY
    val Grid = BigInt(1L << 40)
    var s = Grid
    val rows = risk.map { r =>
      val (day, d, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      s = s * BigInt(n - d) / BigInt(n)
      (day, n, d, s.toLong, s.toLong.toDouble / Grid.toDouble)
    }
    spark.createDataFrame(rows.toSeq)
      .toDF("day", "n_risk", "n_events", "surv_fp", "surv")
  }

  /** RFM segmentation — the classic user-value triage (recency /
    * frequency / monetary, each cut into quintiles) every
    * event-stream warehouse ships: R = days since the user's last
    * event counted from the corpus's own last day (the batch-anchor
    * convention, so the segmentation is reproducible), F = event
    * count, M = value mass on the 2¹⁰ integer grid. Quintiles are
    * `ntile(5)` with a user-id tie-break — a total order, so the
    * assignment is deterministic on every engine. Quintile 1 = most
    * recent / least frequent / lowest spend (raw ntile order;
    * flip downstream if marketing wants 5-high).
    *
    * Plan: ONE map-side-combined user aggregate (the only corpus-sized
    * exchange), a 1-row anchor broadcast, three ntile windows over the
    * users-sized table. At extreme user cardinality the ntile sort is
    * the cost — swap to the histogram-quantile bucketing of
    * [[graft.operators.Expectations.histogramQuantiles]] there; the
    * aggregate is unchanged.
    */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val perUser = events
      .select(col(userCol).as("user_id"),
        datediff(to_date(col(tsCol)), lit("1970-01-01")).as("_day"),
        floor(col(valueCol) * 1024).cast("long").as("_v"))
      .groupBy(col("user_id"))
      .agg(max(col("_day")).as("_last_day"),
        count(lit(1)).as("f_events"),
        sum(col("_v")).as("m_fp"))
    val anchor = perUser.agg(max(col("_last_day")).as("_anchor"))
    def q(order: Column): Column =
      ntile(5).over(Window.orderBy(order, col("user_id")))
    perUser.crossJoin(broadcast(anchor))
      .select(col("user_id"),
        (col("_anchor") - col("_last_day")).as("r_days"),
        col("f_events"), col("m_fp"))
      .withColumn("r_q", q(col("r_days")))
      .withColumn("f_q", q(col("f_events")))
      .withColumn("m_q", q(col("m_fp")))
      .withColumn("segment",
        concat(col("r_q").cast("string"), col("f_q").cast("string"),
          col("m_q").cast("string")))
      .orderBy(col("user_id"))
  }
}
