package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage — fuzzy entity matching over a name-like
  * column (the dedup step for catalogs, author lists, and crawl-source
  * registries, where "near-duplicate" means edit distance, not shared
  * shingles). The classic blocking design: a cheap deterministic block
  * key prunes the candidate space from all-pairs O(n²) to
  * Σ|block|², then the exact edit-distance verifier runs only inside
  * blocks. The same candidates-then-verify shape as the MinHash banding
  * pipeline ([[Dedup.minHashPairs]]) with the block key playing the
  * band.
  */
object Linkage {

  /** Candidate id pairs within a block whose names sit within
    * `maxDist` Levenshtein edits, rolled up to distinct NAME pairs:
    * (`name_a` ≤ `name_b`, `dist`, `n_pairs` — how many id pairs share
    * that name pair). The name-level rollup is what a linkage review
    * queue consumes (each row is one merge decision covering all its id
    * pairs); `name_a = name_b` rows count exact-name duplicates.
    *
    * `blockKey` must be insensitive to the edits it should tolerate
    * (here: a token the fuzz never touches — the default in
    * [[blockByLastToken]]); pairs split across blocks are the measured
    * recall cost of blocking, exactly the LSH-banding trade
    * (`minhash_banding`'s S-curve, in edit-distance clothing).
    *
    * Plan: names roll up to DISTINCT (block, name, count) rows BEFORE
    * any pairing — real catalogs are vocabulary-like (many rows, few
    * names), so the self-join runs over name rows, not id rows, and
    * the id-pair counts come back by arithmetic: `cntA·cntB` for
    * distinct names, `C(cnt, 2)` within one name. One exchange builds
    * the name rollup; the block-local name self-join is
    * Σ|distinct-names-per-block|² (the worst case — all names unique —
    * degrades to the id-level Σ|block|², never beyond); the
    * thresholded-Levenshtein verifier band-limits each comparison to
    * O(len·maxDist) with early exit. A skewed giant block serializes
    * its own |block|² — compose a second discriminator into the key
    * (length band, first char) before it forms, the salting story of
    * [[SkewJoin]].
    */
  def fuzzyNamePairs(df: DataFrame, idCol: String, nameCol: String,
                     blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    import Materialize.MatOps
    val named = df
      .select(col(idCol).as("_id"), col(nameCol).as("_name"), blockKey.as("_blk"))
      .groupBy(col("_blk"), col("_name"))
      .agg(count(lit(1)).as("_n"))
      .materialized // both sides of the name self-join
    val a = named.select(col("_blk"), col("_name").as("name_a"), col("_n").as("_na"))
    val b = named.select(col("_blk"), col("_name").as("name_b"), col("_n").as("_nb"))
    a.join(b, Seq("_blk"))
      .where(col("name_a") <= col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("dist") >= 0)
      // id pairs under a name pair: cross count for distinct names,
      // unordered within-name pairs for the diagonal
      .withColumn("n_pairs",
        when(col("name_a") === col("name_b"), expr("(_na * (_na - 1)) div 2"))
          .otherwise(col("_na") * col("_nb")).cast("long"))
      .where(col("n_pairs") > 0)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_pairs"))
  }

  /** The default block key for multi-token names: the last
    * whitespace-token, lowercased — the head noun of a product name or
    * the surname of a person name, the token edit-noise touches least.
    */
  def blockByLastToken(nameCol: Column): Column =
    element_at(split(lower(trim(nameCol)), "\\s+"), -1)
}
