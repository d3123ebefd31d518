package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov removal-effect attribution (Anderl et al. 2014, "Mapping the
  * customer journey" — the data-driven alternative to last-touch rules):
  * model user journeys as a first-order Markov chain over channel
  * states, compute the chain's conversion probability, then re-compute
  * it with each channel REMOVED (its inbound probability mass redirected
  * to the null absorber); a channel's credit is the relative drop in
  * conversion. The complement of the engine's last-touch
  * `stream_attribution` join — same question, causal-ish answer.
  *
  * Scale split, same discipline as the bounded CC fast-path and the
  * 1-row watermark: the CORPUS-sized work (ordering each user's events,
  * truncating at first conversion, counting transitions) is fully
  * distributed — one window pass and one hash aggregate; what reaches
  * the driver is the transition-count matrix, bounded by
  * (|channel vocabulary| + 2)², a few dozen cells regardless of corpus
  * size. The absorbing-chain solve runs there in exact BigInt
  * fixed-point (2⁻⁴⁰ grid, `rounds` Jacobi sweeps, floor division) so
  * the oracle can replay every sweep bit-for-bit in HUGEINT SQL.
  */
object Attribution {

  /** First-order transition counts over per-user journeys: START → first
    * event, event → next event, journey truncated AFTER the first
    * `convType` event (absorbing conversion), non-converting journeys
    * closed with a terminal → END transition. One window rank + one
    * lag + one hash aggregate; output is channel-vocabulary-sized.
    */
  def transitionCounts(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String, convType: String): DataFrame = {
    val ordered = events
      .select(col(userCol).as("_u"), col(typeCol).as("_t"),
        col(tsCol).as("_ts"), col(tieCol).as("_tie"))
      .withColumn("_ord", row_number().over(
        Window.partitionBy(col("_u")).orderBy(col("_ts"), col("_tie"))))
      .select(col("_u"), col("_t"), col("_ord"))
    val firstConv = ordered.where(col("_t") === convType)
      .groupBy(col("_u")).agg(min(col("_ord")).as("_conv_ord"))
    val journeys = ordered.join(firstConv, Seq("_u"), "left")
      .where(col("_conv_ord").isNull || col("_ord") <= col("_conv_ord"))
    val w2 = Window.partitionBy(col("_u")).orderBy(col("_ord"))
    val steps = journeys.select(
      coalesce(lag(col("_t"), 1).over(w2), lit("START")).as("from_s"),
      col("_t").as("to_s"))
    val terminal = journeys.groupBy(col("_u"))
      .agg(max_by(col("_t"), col("_ord")).as("_last"))
      .where(col("_last") =!= convType)
      .select(col("_last").as("from_s"), lit("END").as("to_s"))
    steps.union(terminal)
      .groupBy(col("from_s"), col("to_s")).agg(count(lit(1)).as("cnt"))
  }

  /** Removal effect per channel: `rounds` Jacobi sweeps of
    * v(s) ← ⌊Σ_to cnt(s,to)·v(to) / tot(s)⌋ on the 2⁻⁴⁰ grid, with the
    * conversion state pinned at 1, END at 0 — and, per removal variant,
    * the removed channel pinned at 0 (equivalent to redirecting its
    * inbound mass to the null absorber). Returns one row per channel:
    * the full-chain conversion probability, the channel-removed one,
    * and the removal effect (p_full − p_removed)/p_full on the 2⁻²⁰
    * grid. Exact BigInt; identical sweeps replay in the oracle.
    */
  def removalEffects(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, tieCol: String, convType: String,
                     rounds: Int = 16): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = events.sparkSession
    // bounded collect: (|channel vocab| + 2)^2 cells, like the CC
    // driver fast-path — the corpus never leaves the cluster
    val cells = transitionCounts(events, userCol, typeCol, tsCol, tieCol, convType)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tot: Map[String, Long] =
      cells.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val states: Seq[String] =
      (cells.keys.map(_._1) ++ cells.keys.map(_._2)).toSeq.distinct.sorted
    val Grid = BigInt(1L << 40)
    def solve(removed: Option[String]): BigInt = {
      var v: Map[String, BigInt] =
        states.map(s => s -> (if (s == convType) Grid else BigInt(0))).toMap
      for (_ <- 1 to rounds) {
        v = states.map { s =>
          val nv =
            if (s == convType) Grid
            else if (s == "END" || removed.contains(s)) BigInt(0)
            else tot.get(s) match {
              case None => BigInt(0)
              case Some(t) =>
                states.iterator.map(to => BigInt(cells.getOrElse((s, to), 0L)) * v(to)).sum / t
            }
          s -> nv
        }.toMap
      }
      v.getOrElse("START", BigInt(0))
    }
    val pFull = solve(None)
    val channels = states.filterNot(s => s == "START" || s == "END" || s == convType)
    val rows = channels.map { c =>
      val pRem = solve(Some(c))
      val effect = if (pFull > 0) ((pFull - pRem) * BigInt(1L << 20) / pFull).toLong else 0L
      (c, pFull.toLong, pRem.toLong, effect)
    }
    spark.createDataFrame(rows)
      .toDF("channel", "p_conv_fp", "p_removed_fp", "removal_q20")
  }

  /** Position-based (U-shaped) multi-touch attribution — the rule-based
    * model between last-touch (`stream_attribution`) and the Markov
    * removal effect: for each CONVERTING journey, the touchpoints
    * strictly before the first `convType` event split the conversion's
    * credit 40% first / 40% last / 20% across the middles (1 touch →
    * 100%, 2 → 50/50 — the standard U-shape degenerations).
    *
    * Credits are integer 2⁻²⁰-grid shares (first/last
    * ⌊0.4·2²⁰⌋, each middle ⌊0.2·2²⁰/(n−2)⌋) summed as int64 —
    * associative, so channel totals are partitioning-independent and
    * the sub-ulp mass lost to flooring is identical on every engine.
    *
    * Plan: one per-user ordered window pass (rank + the same
    * first-conversion truncation as [[transitionCounts]]), a per-user
    * 1-row aggregate for the touch count, one broadcast-sized join
    * back, one channel aggregate. The corpus shuffles once on the user
    * key; output is channel-vocabulary-sized.
    */
  def positionCredit(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, tieCol: String, convType: String): DataFrame = {
    val grid = 1L << 20
    val ordered = events
      .select(col(userCol).as("_u"), col(typeCol).as("_t"),
        col(tsCol).as("_ts"), col(tieCol).as("_tie"))
      .withColumn("_ord", row_number().over(
        Window.partitionBy(col("_u")).orderBy(col("_ts"), col("_tie"))))
      .select(col("_u"), col("_t"), col("_ord"))
    val firstConv = ordered.where(col("_t") === convType)
      .groupBy(col("_u")).agg(min(col("_ord")).as("_conv_ord"))
    // touchpoints strictly before the first conversion, re-ranked dense
    val touches = ordered.join(firstConv, Seq("_u"))
      .where(col("_ord") < col("_conv_ord"))
      .withColumn("_pos", row_number().over(
        Window.partitionBy(col("_u")).orderBy(col("_ord"))))
    val nTouch = touches.groupBy(col("_u")).agg(max(col("_pos")).as("_n"))
    val credit =
      when(col("_n") === 1, lit(grid))
        .when(col("_n") === 2, lit(grid / 2))
        .when(col("_pos") === 1 || col("_pos") === col("_n"),
          lit(math.floor(0.4 * grid).toLong))
        .otherwise(expr(s"${math.floor(0.2 * grid).toLong}L div (_n - 2)"))
    touches.join(nTouch, Seq("_u"))
      .select(col("_t").as("channel"), credit.as("_c"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"), sum(col("_c")).as("credit_fp"))
      .select(col("channel"), col("n_touches"), col("credit_fp"),
        (col("credit_fp").cast("double") / grid.toDouble).as("credit"))
      .orderBy(col("channel"))
  }
}
