package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus selection operators: the step AFTER scoring and dedup
  * in an LLM data pipeline — decide WHICH documents actually enter the
  * training mix.
  *
  * Both operators are per-stratum window computations: one hash exchange
  * on the stratum key plus a per-partition sort, no joins, no driver
  * state. Stratum skew (one language dominating a web corpus) is the
  * scale risk: the sort is per-stratum, so a 10-billion-doc stratum
  * lands on one task. At that scale, pre-filter with an approximate
  * score threshold first — `approx_percentile(score, 1 - budgetFrac)`
  * per stratum is one cheap aggregate, cuts the sorted volume to just
  * the boundary region, and AQE's skew-join/partition splitting handles
  * the residual — then run the exact window on the survivors. The exact
  * operator below is the correctness contract; the threshold pre-pass
  * composes in front of it without changing results.
  */
object CorpusSelection {

  /** Highest-score-first selection under a per-stratum token budget:
    * rank each stratum's documents by (`score` desc, `idCol` asc — the
    * deterministic tiebreak), keep documents while the running token sum
    * stays within `budget`. A single document larger than the whole
    * budget is excluded (its own cumulative sum already exceeds it).
    * Appends `cum_tokens` (the running sum, budget accounting made
    * auditable) to the input columns.
    */
  def selectByTokenBudget(docs: DataFrame, strataCol: String, score: Column,
                          tokens: Column, budget: Long, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(score.desc, col(idCol))
    docs
      .withColumn("cum_tokens", sum(tokens).over(w).cast("long"))
      .where(col("cum_tokens") <= budget)
  }

  /** Deterministic fixed-size sample per stratum: order documents inside
    * each stratum by `md5(id)` (a seedless, engine-portable uniform
    * scrambling — any doc set yields the same sample on every run and
    * every engine, which is what makes training mixes reproducible and
    * oracle-checkable) and keep the first `n`. Appends `sample_rank`
    * (1-based position in the scrambled order).
    */
  def stratifiedSample(docs: DataFrame, strataCol: String, n: Int, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= n)
  }
}
