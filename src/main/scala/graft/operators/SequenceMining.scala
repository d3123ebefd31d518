package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern mining over keyed event streams — the two tables
  * every clickstream/crawl pipeline derives from its transition log:
  * co-visitation counts (the "viewed X, next viewed Y" candidate
  * generator behind item-to-item recommenders and crawl prefetchers)
  * and k-step path counts (empirical funnel discovery — which event
  * sequences actually happen, before anyone hand-picks funnel steps for
  * [[Funnel.steps]]).
  *
  * Both are ONE lag-window pass over the keyed stream (the
  * [[Sessionize]] exchange: partition by key, order by time + a
  * deterministic tiebreak) followed by a partial-aggregated count of
  * slim tuples. Nothing is ever corpus-quadratic: the transition table
  * is |events| rows of two ids, the path table is bounded by
  * |alphabet|^k, and only those move.
  */
object SequenceMining {

  /** Adjacent-transition co-visitation: top `k` successors per item by
    * (count desc, successor asc). Self-transitions (page refreshes)
    * are dropped — they dominate raw logs and carry no recommendation
    * signal. The per-src rank window runs over the counted pair table
    * (≤ items², in practice items×fanout), not the event log.
    * Returns (src, rank, dst, c).
    */
  def covisitTopK(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, itemCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val trans = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(itemCol).as("_item"))
      .select(lag(col("_item"), 1).over(w).as("src"), col("_item").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    trans.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("c").desc, col("dst"))))
      .where(col("rank") <= k)
      .select(col("src"), col("rank"), col("dst"), col("c"))
  }

  /** k-step path counts: every length-`steps` run of `stepCol` values
    * within a key's ordered stream, counted globally, top `topN` by
    * (count desc, then the path itself). The chained lags share ONE
    * window pass; the count table is bounded by |alphabet|^steps, so
    * the global top-N sort is vocabulary-sized (the
    * [[TextAnalysis.topTerms]] caveat), never event-sized.
    * Returns (step_1..step_k, c).
    */
  def pathCounts(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, stepCol: String, steps: Int, topN: Int): DataFrame = {
    require(steps >= 2, s"steps must be >= 2, got $steps")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val stepNames = (1 to steps).map(i => s"step_$i")
    val lagged = (steps - 1 to 0 by -1).map(i =>
      lag(col("_s"), i).over(w).as(s"step_${steps - i}"))
    events
      .select(col(keyCol), col(tsCol), col(tieCol), col(stepCol).as("_s"))
      .select(lagged: _*)
      // step_1 is the oldest lag: null exactly on the first steps-1 rows
      // of each key, i.e. the incomplete windows
      .where(col("step_1").isNotNull)
      .groupBy(stepNames.map(col): _*)
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc +: stepNames.map(col): _*)
      .limit(topN)
  }
}
