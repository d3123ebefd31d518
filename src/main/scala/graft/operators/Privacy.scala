package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators for corpus release — the compliance pass a
  * training-data pipeline runs between curation and publication:
  * k-anonymity generalization over quasi-identifier columns,
  * right-to-be-forgotten deletion audits, and differentially-private
  * count release. All three are aggregate-shaped (group-by on tiny key
  * domains + broadcast joins back), so they ride the ingest scan at any
  * corpus size.
  */
object Privacy {

  /** k-anonymity via a fixed generalization ladder over two
    * quasi-identifier columns (Sweeney 2002): a row releases its exact
    * `(q1, q2)` pair only if at least `k` corpus rows share it;
    * otherwise `q2` generalizes to `"*"` (level 1), and if the corpus
    * still holds fewer than `k` rows of that `q1`, both suppress to
    * `"*"` (level 2, the full-suppression floor — the domain-level
    * anonymity set, which is the corpus itself). Anonymity sets are
    * measured against the FULL corpus at each ladder level (the
    * domain-generalization-hierarchy convention), so the released level
    * is monotone in the combo's frequency and every released group has
    * ≥ k members (level 2 trivially, assuming the corpus has ≥ k rows).
    *
    * Emits every input column plus (`anon_q1`, `anon_q2`, `anon_level`,
    * `anon_set_size`).
    *
    * Plan: ONE group-by count over the quasi-identifier pair domain
    * (tiny — languages × sources, not rows); the coarser ladder levels
    * roll up from it, and all three broadcast back onto the corpus.
    * Zero corpus-keyed shuffles: at 100 TB the cost is the scan and the
    * ladder is a projection.
    */
  def kAnonymize(df: DataFrame, q1: String, q2: String, k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import Materialize.MatOps
    // ONE corpus aggregate; the ladder's coarser levels roll up from the
    // pair counts (domain-sized), so the corpus is scanned once for all
    // three anonymity-set sizes
    val pairCnt = df
      .select(col(q1).cast("string").as("_q1"), col(q2).cast("string").as("_q2"))
      .groupBy(col("_q1"), col("_q2")).agg(count(lit(1)).as("_c0"))
      .materialized
    val q1Cnt = pairCnt.groupBy(col("_q1")).agg(sum(col("_c0")).as("_c1"))
    val total = pairCnt.agg(sum(col("_c0")).as("_c2"))
    df.withColumn("_q1", col(q1).cast("string"))
      .withColumn("_q2", col(q2).cast("string"))
      .join(broadcast(pairCnt), Seq("_q1", "_q2"), "left")
      .join(broadcast(q1Cnt), Seq("_q1"), "left")
      .crossJoin(broadcast(total))
      .withColumn("anon_level",
        when(col("_c0") >= k, lit(0))
          .when(col("_c1") >= k, lit(1))
          .otherwise(lit(2)))
      .withColumn("anon_q1", when(col("anon_level") === 2, lit("*")).otherwise(col("_q1")))
      .withColumn("anon_q2", when(col("anon_level") === 0, col("_q2")).otherwise(lit("*")))
      .withColumn("anon_set_size",
        when(col("anon_level") === 0, col("_c0"))
          .when(col("anon_level") === 1, col("_c1"))
          .otherwise(col("_c2")))
      .drop("_q1", "_q2", "_c0", "_c1", "_c2")
  }

  /** Right-to-be-forgotten deletion audit: given the tombstone list
    * `deleteKeys` (one column, same name as `keyCol`), report per
    * `groupCol` how many rows the deletion pass removes — the
    * verification artifact a GDPR/CCPA erasure run files next to the
    * rewritten partitions. Emits (`groupCol`, n_before, n_deleted,
    * n_after).
    *
    * Plan: the tombstone list broadcasts (erasure batches are small
    * next to the corpus — thousands of subjects vs billions of rows);
    * one left-join flag projection feeds one map-side-combined
    * aggregate, so the audit costs exactly one corpus scan. When the
    * list outgrows broadcast, put [[Dedup.contaminatedByBloom]]'s sieve
    * in front — same shape, same story.
    */
  def deletionAudit(df: DataFrame, keyCol: String, deleteKeys: DataFrame,
                    groupCol: String): DataFrame = {
    val tomb = deleteKeys.select(col(keyCol)).distinct()
      .withColumn("_dead", lit(true))
    df.select(col(groupCol), col(keyCol))
      .join(broadcast(tomb), Seq(keyCol), "left")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_before"),
        sum(when(col("_dead"), 1L).otherwise(0L)).as("n_deleted"))
      .withColumn("n_after", col("n_before") - col("n_deleted"))
  }

  /** ε-differentially-private count release per group: exact counts get
    * Laplace(b = sensitivity/ε = 1/ε) noise via inverse-CDF sampling,
    * `noise = −b · sign(u) · ln(1 − 2|u|)` for `u ∈ (−½, ½)`. The
    * uniform draw is DERIVED from the group key (first 24 md5 bits,
    * centered — the [[graft.operators.CorpusSelection]] Gumbel-top-k
    * discipline), so the release is reproducible and the driver oracle
    * replays it bit-for-bit; a production release swaps the hash for a
    * calibrated DRBG and drops the exact column. The noise is floored to
    * the 2⁻⁴⁰ fixed-point grid (`noise_fp`) so downstream comparison is
    * integer-exact. Emits (`keyCol`, n, noise_fp, n_noisy FLOAT).
    *
    * Plan: one map-side-combined count aggregate (groups-sized output);
    * the noise is a projection over group rows, never corpus rows.
    */
  def dpCounts(df: DataFrame, keyCol: String, epsilon: Double = 1.0): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val scale = 1099511627776.0 // 2^40
    val b = 1.0 / epsilon
    // u in (-1/2, 1/2): (md24 + 1/2) / 2^24 - 1/2 — never hits ±1/2, so
    // ln(1 - 2|u|) is finite
    val u = (QualityClassifier.md24(concat(lit("dp:"), col(keyCol).cast("string")))
      .cast("double") + lit(0.5)) / lit(16777216.0) - lit(0.5)
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("_u", u)
      .withColumn("noise_fp",
        floor(lit(-b) * signum(col("_u")) * log(lit(1.0) - lit(2.0) * abs(col("_u"))) * lit(scale))
          .cast("long"))
      .withColumn("n_noisy",
        (col("n").cast("double") + col("noise_fp").cast("double") / lit(scale)).cast("float"))
      .drop("_u")
  }

  /** ε-DP mean release with clipping — the third DP primitive next to
    * [[dpCounts]] and [[dpQuantile]] (count / quantile / mean is the
    * canonical release trio): values clip to [0, `clip`] (sensitivity
    * clip), the EXACT integer clipped sum takes Laplace noise of scale
    * clip/ε (the [[dpCounts]] hash-derived reproducible noise on the
    * 2⁻⁴⁰ grid), and the released mean divides by the public group
    * count. Emits (`keyCol`, n, sum_clipped, noise_fp, mean_noisy).
    *
    * Plan: one map-side-combined key aggregate; noise is a per-key
    * scalar expression.
    */
  def dpMean(df: DataFrame, keyCol: String, valueCol: String,
             clip: Long, epsilon: Double = 1.0): DataFrame = {
    require(clip > 0, s"clip must be positive, got $clip")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val scale = 1099511627776.0 // 2^40
    val b = clip.toDouble / epsilon
    val u = (QualityClassifier.md24(concat(lit("dpm:"), col(keyCol).cast("string")))
      .cast("double") + lit(0.5)) / lit(16777216.0) - lit(0.5)
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(least(greatest(col(valueCol).cast("long"), lit(0L)), lit(clip)))
          .as("sum_clipped"))
      .withColumn("_u", u)
      .withColumn("noise_fp",
        floor(lit(-b) * signum(col("_u")) * log(lit(1.0) - lit(2.0) * abs(col("_u"))) * lit(scale))
          .cast("long"))
      .withColumn("mean_noisy",
        ((col("sum_clipped").cast("double") + col("noise_fp").cast("double") / lit(scale))
          / col("n").cast("double")).cast("float"))
      .drop("_u")
      .orderBy(col(keyCol))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the gap
    * k-anonymity leaves open: a quasi-identifier group can be large
    * (k-anonymous) yet reveal its sensitive attribute anyway when every
    * member SHARES that attribute. Each `(q1, q2)` equivalence class
    * must contain at least `l` DISTINCT values of `sensitiveCol`;
    * classes below the bar are the ones a release must generalize or
    * suppress. Run after [[kAnonymize]], before publication.
    *
    * Emits one row per equivalence class: (q1, q2, group_n,
    * n_sensitive, diverse BOOLEAN) — all exact integers.
    *
    * Plan: one map-side-combined count over the `(q1, q2, sensitive)`
    * triple domain (bounded by the attribute domains, not rows), then a
    * tiny rollup to classes. Zero corpus-keyed shuffles; rides the scan
    * at 100 TB. The exact distinct count is over the triple domain, so
    * no count-distinct expansion ever touches corpus rows.
    */
  def lDiversity(df: DataFrame, q1: String, q2: String,
                 sensitiveCol: String, l: Int = 3): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(col(q1), col(q2), col(sensitiveCol))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col(q1), col(q2))
      .agg(sum(col("_n")).as("group_n"), count(lit(1)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
      .orderBy(col(q1), col(q2))
  }

  /** ε-DP quantile release via the exponential mechanism (McSherry &
    * Talwar 2007) — the second DP release primitive next to
    * [[dpCounts]]' Laplace counts: per group, release the q-quantile
    * of a BUCKETED value without revealing any individual row.
    * Utility of candidate bucket c is u(c) = −|rank(c) − ⌈q·n⌉|
    * (rank = #values ≤ c; sensitivity 1), and sampling ∝ exp(ε·u/2)
    * is realized as Gumbel-max: argmax over candidates of
    * ε·u/2 + g_c, with g_c = −ln(−ln U_c) and U_c hash-derived from
    * (group, bucket) — reproducible and oracle-replayable, the
    * [[dpCounts]] discipline (a production release swaps the hash for
    * a DRBG and drops the exact column).
    *
    * Accepted precision risk (the [[dpCounts]] precedent): −ln(−ln U)
    * is evaluated in BOTH engines' libm rather than as embedded
    * literals — a ULP divergence near a Gumbel score tie could in
    * principle flip the argmax pick. The 24-bit hash grid makes exact
    * score ties measure-zero in practice, and the `_b` tiebreak only
    * resolves EXACT equality, so parity has held every round; a
    * paranoid variant would quantize `_score` to a fixed grid first.
    *
    * Emits (`keyCol`, n, true_bucket, dp_bucket) — the exact quantile
    * rides along as the utility-loss audit.
    *
    * Plan: one map-side-combined (key, bucket) count — the only
    * corpus-sized exchange; ranks, scores, and the argmax are windows
    * over the bucket-domain-sized table.
    */
  def dpQuantile(df: DataFrame, keyCol: String, bucketCol: String,
                 epsilon: Double = 1.0, q: Double = 0.5): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(q > 0 && q < 1, s"q must be in (0,1), got $q")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(keyCol), col(bucketCol).cast("long").as("_b"))
      .groupBy(col(keyCol), col("_b")).agg(count(lit(1)).as("_c"))
    val wKey = Window.partitionBy(col(keyCol))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("_b"))
    val u01 = (QualityClassifier.md24(concat(lit("dpq:"), col(keyCol).cast("string"),
      lit(":"), col("_b").cast("string"))).cast("double") + lit(0.5)) / lit(16777216.0)
    val scored = counts
      .withColumn("_n", sum(col("_c")).over(wKey))
      .withColumn("_rk", sum(col("_c")).over(wOrd))
      .withColumn("_target", ceil(lit(q) * col("_n").cast("double")).cast("long"))
      .withColumn("_score",
        lit(epsilon / 2.0) * (-abs(col("_rk") - col("_target"))).cast("double")
          + -log(-log(u01)))
    scored
      .withColumn("_pick", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("_score").desc, col("_b"))))
      .withColumn("_true", min(when(col("_rk") >= col("_target"), col("_b"))).over(wKey))
      .where(col("_pick") === 1)
      .select(col(keyCol), col("_n").as("n"), col("_true").as("true_bucket"),
        col("_b").as("dp_bucket"))
      .orderBy(col(keyCol))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the leak
    * l-diversity misses: a class can span l distinct sensitive values
    * yet still reveal plenty when its DISTRIBUTION over them differs
    * sharply from the corpus-wide one (the classic "this zip code is
    * 90% one diagnosis" case). For a nominal sensitive attribute the
    * distance is the variational (total-variation) distance
    * t_c = ½·Σ_s |q_{s,c} − p_s|; classes with t_c above the threshold
    * are the ones a release must generalize further. Completes the
    * k-anonymity → l-diversity → t-closeness ladder.
    *
    * Exactness: with q = n_{s,c}/N_c and p = n_s/N each term is
    * |n_{s,c}·N − n_s·N_c| / (N·N_c) — numerators are exact
    * DECIMAL(38,0) cross products summed associatively; ONE float
    * division per class at the end, mirrored by the oracle.
    *
    * Emits per equivalence class: (q1, q2, group_n, t_dist, close).
    *
    * Plan: one map-side-combined count over the (q1, q2, sensitive)
    * triple domain — the only corpus-sized pass (shared shape with
    * [[lDiversity]]); the global margin, the class margin, and the
    * class × sensitive-domain grid are all attribute-domain-sized.
    * Zero corpus-keyed shuffles at any corpus size.
    */
  def tCloseness(df: DataFrame, q1: String, q2: String,
                 sensitiveCol: String, t: Double = 0.25): DataFrame = {
    require(t > 0 && t < 1, s"t must be in (0,1), got $t")
    import Materialize.MatOps
    val triple = df.groupBy(col(q1), col(q2), col(sensitiveCol))
      .agg(count(lit(1)).as("_n"))
      .materialized // margins + grid probe all read it
    val global = triple.groupBy(col(sensitiveCol)).agg(sum(col("_n")).as("_ns"))
    val total = triple.agg(sum(col("_n")).as("_nt"))
    val classes = triple.groupBy(col(q1), col(q2)).agg(sum(col("_n")).as("group_n"))
    // full class × sensitive-domain grid: a sensitive value ABSENT from
    // a class still contributes |0 − p_s| to the distance
    val grid = classes.crossJoin(broadcast(global))
      .join(triple, Seq(q1, q2, sensitiveCol), "left")
      .na.fill(0L, Seq("_n"))
      .crossJoin(broadcast(total))
    grid.groupBy(col(q1), col(q2))
      .agg(max(col("group_n")).as("group_n"), max(col("_nt")).as("_nt2"),
        sum(abs(col("_n").cast("decimal(38,0)") * col("_nt")
          - col("_ns").cast("decimal(38,0)") * col("group_n"))).as("_num"))
      .select(col(q1), col(q2), col("group_n"),
        (col("_num").cast("double")
          / (lit(2.0) * col("_nt2").cast("double") * col("group_n").cast("double")))
          .as("t_dist"))
      .withColumn("close", col("t_dist") <= t)
      .orderBy(col(q1), col(q2))
  }

  /** License/provenance propagation through derivation — the dataset-
    * governance rule every release pipeline enforces: a derived unit's
    * license is the MOST RESTRICTIVE license of anything it was built
    * from (the meet in the license lattice). Given chunk-grain rows
    * carrying their shard assignment and source license rank (higher =
    * more restrictive), roll each shard up to its binding license plus
    * the provenance breadth that drives re-shard decisions. Emits
    * (`shardCol`, n_chunks, n_docs, n_sources, license_rank, license).
    *
    * Plan: one map-side-combined shard aggregate (the distincts are the
    * standard two-phase expand) — shard count is bounded, rows are
    * provenance tuples, no text moves.
    */
  def licensePropagation(chunks: DataFrame, shardCol: String, docCol: String,
                         sourceCol: String, rankCol: String,
                         names: Seq[String]): DataFrame = {
    require(names.nonEmpty, "need at least one license name")
    chunks.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col(docCol)).as("n_docs"),
        countDistinct(col(sourceCol)).as("n_sources"),
        max(col(rankCol)).as("license_rank"))
      .withColumn("license",
        element_at(typedLit(names), col("license_rank").cast("int") + 1))
      .orderBy(col(shardCol))
  }
}
