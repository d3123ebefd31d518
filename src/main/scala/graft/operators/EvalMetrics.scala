package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation analytics — the measurement side of a training-data
  * engine (every corpus intervention is judged by eval deltas, so the
  * eval aggregations live next to the curation operators): pass@k over
  * sampled generations (Chen et al. 2021, the HumanEval estimator),
  * expected calibration error (Guo et al. 2017), inter-rater agreement
  * (Cohen 1960 — the LLM-judge sanity check), and Bradley–Terry skill
  * fitting from pairwise preferences (the arena-ranking model).
  *
  * Exactness discipline: every statistic is a ratio of INTEGER
  * aggregates (binomials as factored integer products, calibration gaps
  * as one |·| integer numerator, kappa as an integer cross-moment
  * ratio), so the single IEEE division per emitted float is the only
  * float step anywhere — partition- and engine-independent.
  */
object EvalMetrics {

  /** Unbiased pass@k (Chen et al. 2021, eq. 1): per problem with n
    * samples and c correct, pass@k = 1 − C(n−c,k)/C(n,k), estimated
    * exactly via the factored form
    * Π_{i=0..k−1} (n−c−i)/(n−i) — both products int64-exact (envelope:
    * n^k < 2^63; the registered fixture holds n at 10), the n−c < k
    * case falls out as a zero factor (pass = 1), and n < k yields null.
    * Emits one row per problem: (`problemCol`, n, c, pass@k per k).
    *
    * Plan: ONE map-side-combined (problem) count aggregate — the only
    * exchange; the binomial products are codegen'd per-row arithmetic.
    */
  def passAtK(samples: DataFrame, problemCol: String, correctCol: String,
              ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 16), s"ks in [1,16]: $ks")
    val counts = samples.groupBy(col(problemCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(correctCol), 1L).otherwise(0L)).as("c"))
    def fallingProduct(x: Column, k: Int): Column =
      (0 until k).map(i => greatest(x - i, lit(0L))).reduce(_ * _)
    ks.foldLeft(counts) { (df, k) =>
      df.withColumn(s"pass_at_$k",
        when(col("n") < k, lit(null).cast("double"))
          .otherwise(lit(1.0) -
            fallingProduct(col("n") - col("c"), k).cast("double") /
              fallingProduct(col("n"), k).cast("double")))
    }
  }

  /** Expected calibration error over `bins` equal-width confidence bins
    * (Guo et al. 2017). `confFpCol` is the confidence on the 2²⁴ grid
    * (the md24 hash range — a production run floors real floats onto
    * it). Per bin: n, accuracy, mean confidence, |gap|; every row also
    * carries the corpus ECE, whose numerator Σ_b |c_b·2²⁴ − Σconf_b|
    * is one exact int64 sum (acc−conf on the common n·2²⁴ denominator),
    * so ECE is a single division of exact integers.
    *
    * Plan: one bins-domain aggregate + a one-row broadcast total.
    */
  def eceBins(preds: DataFrame, confFpCol: String, correctCol: String,
              bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val grid = 1L << 24
    val b = preds.select(
        expr(s"(($confFpCol * $bins) div ${grid}L)").cast("int").as("bin"),
        col(confFpCol).cast("long").as("_conf"),
        when(col(correctCol), 1L).otherwise(0L).as("_ok"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_ok")).as("_c"),
        sum(col("_conf")).as("_sc"))
      .withColumn("_gap_num", abs(col("_c") * grid - col("_sc")))
    val tot = b.agg(sum(col("n")).as("_tn"), sum(col("_gap_num")).as("_tg"))
    b.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        (col("_c").cast("double") / col("n").cast("double")).as("accuracy"),
        (col("_sc").cast("double") / (col("n") * grid).cast("double")).as("confidence"),
        (col("_gap_num").cast("double") / (col("n") * grid).cast("double")).as("gap"),
        (col("_tg").cast("double") / (col("_tn") * grid).cast("double")).as("ece"))
      .orderBy(col("bin"))
  }

  /** Cohen's kappa between two raters (the LLM-judge agreement check):
    * κ = (N·Σdiag − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k) — the
    * po/pe form cleared to one integer numerator and denominator
    * (cross moments through DECIMAL(38,0): N²-scale products). Emits
    * one row (n, n_agree, po, pe, kappa).
    *
    * Plan: one (rating) domain aggregate per marginal + the diagonal
    * count — three map-side-combined passes over the pair table, then
    * a classes-domain join.
    */
  def cohenKappa(ratings: DataFrame, r1Col: String, r2Col: String): DataFrame = {
    val n = ratings.agg(count(lit(1)).as("n"),
      sum(when(col(r1Col) === col(r2Col), 1L).otherwise(0L)).as("n_agree"))
    val rows = ratings.groupBy(col(r1Col).as("_k")).agg(count(lit(1)).as("_r"))
    val cols = ratings.groupBy(col(r2Col).as("_k")).agg(count(lit(1)).as("_c"))
    val cross = rows.join(cols, Seq("_k"), "full_outer")
      .agg(coalesce(sum(coalesce(col("_r"), lit(0L)).cast("decimal(38,0)") *
        coalesce(col("_c"), lit(0L)).cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
        .as("_rc"))
    n.crossJoin(cross).select(
      col("n"), col("n_agree"),
      (col("n_agree").cast("double") / col("n").cast("double")).as("po"),
      (col("_rc").cast("double") /
        (col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)")).cast("double")).as("pe"),
      ((col("n").cast("decimal(38,0)") * col("n_agree").cast("decimal(38,0)") - col("_rc")).cast("double") /
        (col("n").cast("decimal(38,0)") * col("n").cast("decimal(38,0)") - col("_rc")).cast("double")).as("kappa"))
  }

  /** Bradley–Terry skill ratings from pairwise outcomes via the
    * minorization-maximization fixpoint (Hunter 2004), all-integer on
    * the 2²⁰ grid: per round, s_i = Σ_j (n_ij·2⁴⁰) div (P_i+P_j) and
    * P'_i = (W_i·2⁴⁰) div s_i, renormalized to Σ = K·2²⁰ by one
    * integer division (the HITS discipline) — every step replayable by
    * the oracle as unrolled CTE layers. Items with zero wins get the
    * floor rating 1 (the MM update sends them to 0, where the next
    * round's div would blow up). Emits (item, rating_fp, rating)
    * ordered best-first.
    *
    * Plan: matches aggregate once into the (i, j, n_ij) pair table and
    * the per-item win vector — corpus touched once; each of `iters`
    * rounds is one pair-table pass + an items-domain aggregate + a
    * one-row renorm broadcast. Loop state goes through
    * [[Materialize.cutLoop]].
    */
  def bradleyTerry(matches: DataFrame, winnerCol: String, loserCol: String,
                   iters: Int = 4): DataFrame = {
    require(iters >= 1, "need iters >= 1")
    val grid = 1L << 20
    val m = Materialize.cutEager(matches.select(
      least(col(winnerCol), col(loserCol)).as("i"),
      greatest(col(winnerCol), col(loserCol)).as("j"),
      col(winnerCol).as("w")))
    val pairs = Materialize.cutEager(
      m.groupBy(col("i"), col("j")).agg(count(lit(1)).as("nij")))
    val wins = Materialize.cutEager(
      m.groupBy(col("w").as("item")).agg(count(lit(1)).as("wi")))
    val items = Materialize.cutEager(
      pairs.select(col("i").as("item")).unionByName(pairs.select(col("j").as("item")))
        .distinct())
    val kItems = items.agg(count(lit(1)).as("_k"))

    var p = Materialize.cutLoop(
      items.select(col("item"), lit(grid).as("p")), previous = None)
    for (_ <- 1 to iters) {
      val withP = pairs
        .join(p.select(col("item").as("i"), col("p").as("pi")), Seq("i"))
        .join(p.select(col("item").as("j"), col("p").as("pj")), Seq("j"))
        .withColumn("_t", expr("(nij * 1099511627776L) div (pi + pj)"))
      val s = withP.select(col("i").as("item"), col("_t"))
        .unionByName(withP.select(col("j").as("item"), col("_t")))
        .groupBy(col("item")).agg(sum(col("_t")).as("_s"))
      val raw = items
        .join(wins, Seq("item"), "left")
        .join(s, Seq("item"), "left")
        .select(col("item"),
          when(coalesce(col("wi"), lit(0L)) === 0L ||
            col("_s").isNull || col("_s") === 0L, lit(1L))
            .otherwise(expr("(wi * 1099511627776L) div _s")).as("praw"))
      val tot = raw.agg(sum(col("praw")).as("_tot"))
      // renorm denominator pre-shifted to the 2^20 grid so the
      // numerator praw·K stays far from int64 overflow (praw·K·2^20
      // would not); the ≤2^-20 relative truncation is part of the
      // defined semantics and the oracle replays it with the same //
      p = Materialize.cutLoop(
        raw.crossJoin(broadcast(tot)).crossJoin(broadcast(kItems))
          .select(col("item"),
            greatest(
              expr("(praw * _k) div greatest(_tot div 1048576L, 1L)"),
              lit(1L)).as("p")),
        previous = Some(p))
    }
    val out = p.select(col("item"), col("p").as("rating_fp"),
      (col("p").cast("double") / grid).as("rating"))
      .orderBy(col("rating_fp").desc, col("item"))
    if (Materialize.debugNoCut(out)) out
    else {
      val pinned = Materialize.cutPinned(out)
      Seq(m, pairs, wins, items, p).foreach(Materialize.release)
      pinned
    }
  }
}
