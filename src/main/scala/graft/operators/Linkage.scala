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
    * Plan: one exchange on the block key; pair generation is a
    * block-local self-join (Σ|block|² work, never n²), the Levenshtein
    * verifier runs inside the joined projection, and the name rollup is
    * a map-side-combined aggregate over SURVIVING pairs only. A skewed
    * giant block serializes its own Σ|block|² — compose a second
    * discriminator into the key (length band, first char) before it
    * forms, the salting story of [[SkewJoin]].
    */
  def fuzzyNamePairs(df: DataFrame, idCol: String, nameCol: String,
                     blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val slim = df.select(col(idCol).as("_id"), col(nameCol).as("_name"),
      blockKey.as("_blk"))
    val a = slim.select(col("_blk"), col("_id").as("_id_a"), col("_name").as("_name_a"))
    val b = slim.select(col("_blk"), col("_id").as("_id_b"), col("_name").as("_name_b"))
    a.join(b, Seq("_blk"))
      .where(col("_id_a") < col("_id_b"))
      // canonicalize so (x, y) and (y, x) land in one rollup row
      .select(
        least(col("_name_a"), col("_name_b")).as("name_a"),
        greatest(col("_name_a"), col("_name_b")).as("name_b"))
      // thresholded form: the DP band-limits to maxDist+1 diagonals and
      // early-exits with -1 past the bound — the verifier cost per pair
      // is O(len·maxDist), not O(len²), exactly where the candidate
      // volume concentrates
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .where(col("dist") >= 0)
      .groupBy(col("name_a"), col("name_b"), col("dist"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** The default block key for multi-token names: the last
    * whitespace-token, lowercased — the head noun of a product name or
    * the surname of a person name, the token edit-noise touches least.
    */
  def blockByLastToken(nameCol: Column): Column =
    element_at(split(lower(trim(nameCol)), "\\s+"), -1)
}
