package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003 — the MOSS algorithm): slide a window of `w` consecutive
  * k-gram hashes over each document and keep the window minimum
  * (rightmost on ties — "robust winnowing"), yielding a position-aware
  * fingerprint sample with the paper's guarantee: any shared run of at
  * least `w + k − 1` tokens produces at least one shared fingerprint,
  * at an expected density of 2/(w+1) of the k-grams. Unlike the
  * whole-document [[TextAnalysis.fingerprint]] (exact-copy detection)
  * or the per-span corpus counts of the `dedup_spans` family (which
  * keep EVERY span), winnowing is the bounded-size local-fingerprint
  * scheme — the standard tool for plagiarism-style partial-overlap
  * detection at corpus scale.
  *
  * Hash contract: the k-gram hash is the engine-portable md24 (first
  * 24 md5 bits). The span/boilerplate family can hide its hash choice
  * from the oracle because only counts of exact string matches cross
  * engines; here the SELECTION depends on hash ORDER, so the hash must
  * be bit-identical in both engines. The rightmost-min tiebreak is
  * encoded arithmetically: minimizing `h·2²⁴ + (2²⁴−1−pos)` picks the
  * smallest hash and, among equal hashes, the largest position — one
  * integer window-min, no struct comparators. Positions must fit 24
  * bits (16M k-grams per document; a document longer than that should
  * be chunked first — see `TextAnalysis.chunkTokens`).
  *
  * Plan at 100 TB: k-gram generation is a bounded explode (one row per
  * token), hashing is map-local, and selection is ONE window (exchange
  * on the doc id + per-doc sort by position); the fingerprint set is a
  * ~2/(w+1) sample of the k-gram volume. Pair detection buckets by
  * fingerprint with the standard boilerplate guard (a fingerprint
  * shared by more than `maxDf` documents is template noise and is
  * dropped before pairing), so candidate fan-out per fingerprint is
  * ≤ maxDf² — never a cross join.
  */
object Winnow {

  private val PosBits = 16777216L // 2^24

  /** Selected fingerprints: (`idCol`, n_kgrams, fpos, fp) — one row per
    * kept (position, hash), `fpos` the k-gram position the fingerprint
    * covers.
    */
  def fingerprints(docs: DataFrame, textCol: String, idCol: String,
                   k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    // k-gram construction + hashing + position-encoding as ONE codegen
    // pass ([[graft.plans.WinnowKeys]]): the composed form built each
    // gram through a CodegenFallback transform + array_join(slice(..))
    // and hashed it via the md5 → hex → substring → conv chain.
    // Element `pos` of the key array IS the composed `_key` (WinnowSpec
    // asserts it against the kept composed expression), a sub-k-token
    // doc returns the empty array (the composed `_n >= k` filter), and
    // n_kgrams = array size = _n − (k−1).
    val keys = {
      import org.apache.spark.sql.graft.{ColumnBridge => B}
      B.column(graft.plans.WinnowKeys(B.expression(col(textCol)), k))
    }
    val grams = docs
      .select(col(idCol), keys.as("_ks"))
      .where(size(col("_ks")) > 0)
      .select(col(idCol), size(col("_ks")).as("n_kgrams"),
        posexplode(col("_ks")).as(Seq("pos", "_key")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("_selkey", min(col("_key")).over(win))
      .where(col("pos") <= col("n_kgrams") - w) // full windows only
      .select(col(idCol), col("n_kgrams"),
        (lit(PosBits - 1) - pmod(col("_selkey"), lit(PosBits))).as("fpos"),
        expr(s"_selkey div $PosBits").as("fp"))
      .distinct()
  }

  /** Per-document fingerprint profile: (`idCol`, n_kgrams, n_fps,
    * density) — density ≈ 2/(w+1) on random text; sharply lower on
    * internally repetitive documents (repeated spans re-select the
    * same fingerprint), which makes it a quality signal too.
    */
  def profile(docs: DataFrame, textCol: String, idCol: String,
              k: Int = 4, w: Int = 4): DataFrame =
    fingerprints(docs, textCol, idCol, k, w)
      .groupBy(col(idCol))
      .agg(first(col("n_kgrams")).as("n_kgrams"), count(lit(1)).cast("int").as("n_fps"))
      .select(col(idCol), col("n_kgrams"), col("n_fps"),
        (col("n_fps").cast("double") / col("n_kgrams").cast("double")).as("density"))

  /** Partial-overlap candidate pairs: documents sharing at least
    * `minShared` winnowing fingerprints, with fingerprints in more than
    * `maxDf` documents dropped first (template/boilerplate guard — the
    * same df cap as the n-gram decontamination family). Returns
    * (doc_a, doc_b, n_shared), doc_a < doc_b.
    */
  /** Cluster resolution over [[pairs]] — the same star-contraction
    * connected components every near-dup family resolves with
    * ([[Dedup.connectedComponents]]): docs sharing ≥`minShared`
    * fingerprints transitively collapse into one cluster; unpaired
    * docs are their own singleton. Returns (`idCol`, component,
    * cluster_size, is_canonical) — min-id canonical, the
    * `dedup_clusters` contract.
    */
  def clusters(docs: DataFrame, textCol: String, idCol: String,
               k: Int = 4, w: Int = 4, minShared: Int = 2, maxDf: Int = 50,
               maxIter: Int = 20): DataFrame = {
    val comp = Dedup.connectedComponents(
      pairs(docs, textCol, idCol, k, w, minShared, maxDf), "doc_a", "doc_b", maxIter)
    val labeled = docs.select(col(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    labeled
      .join(labeled.groupBy(col("component")).agg(count(lit(1)).as("cluster_size")),
        Seq("component"))
      .select(col(idCol), col("component"), col("cluster_size"),
        (col(idCol) === col("component")).as("is_canonical"))
  }

  def pairs(docs: DataFrame, textCol: String, idCol: String,
            k: Int = 4, w: Int = 4, minShared: Int = 2, maxDf: Int = 50): DataFrame = {
    import graft.operators.Materialize.MatOps
    val fps = fingerprints(docs, textCol, idCol, k, w)
      .select(col(idCol).as("_id"), col("fp")).distinct()
      .materialized // consumed by the df guard and both pair sides
    val ok = fps.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
      .where(col("_df") >= 2 && col("_df") <= maxDf)
      .select(col("fp"))
    val a = fps.join(ok, Seq("fp")).select(col("fp"), col("_id").as("doc_a"))
    val b = fps.join(ok, Seq("fp")).select(col("fp"), col("_id").as("doc_b"))
    a.join(b, Seq("fp"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).cast("int").as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
