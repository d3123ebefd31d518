package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Blocked fuzzy record linkage: pair generation stays inside blocks,
  * the Levenshtein verifier and the name-level rollup match a
  * brute-force all-pairs oracle ON the blocked candidate set.
  */
class LinkageSpec extends SparkSuite {

  import spark.implicits._

  private lazy val parts = Seq(
    (1L, "red bolt"), (2L, "red bolt"),          // exact dup, dist 0
    (3L, "rad bolt"),                            // dist 1 from red bolt
    (4L, "blue bolt"),                           // dist 4 from red bolt — blocked but over maxDist
    (5L, "red gear"),                            // other block entirely
    (6L, "ruby gear")                            // dist 3 from red gear
  ).toDF("id", "name")

  private def run(maxDist: Int) =
    Linkage.fuzzyNamePairs(parts, "id", "name",
      Linkage.blockByLastToken(col("name")), maxDist)
      .as[(String, String, Int, Long)].collect().sortBy(p => (p._1, p._2)).toSeq

  test("pairs within a block verify by edit distance; cross-block pairs never form") {
    val out = run(maxDist = 3)
    assert(out == Seq(
      ("rad bolt", "red bolt", 1, 2L),   // ids 3×{1,2}
      ("red bolt", "red bolt", 0, 1L),   // the exact dup pair (1,2)
      ("red gear", "ruby gear", 3, 1L)))
    // "blue bolt" shares the block but sits at dist 4: verified away;
    // "red bolt" vs "red gear" (dist 4) never even forms a candidate
    assert(!out.exists(p => p._1.endsWith("bolt") && p._2.endsWith("gear")))
    val wide = run(maxDist = 4)
    assert(wide.exists(p => p._1 == "blue bolt" && p._2 == "rad bolt" && p._3 == 4) &&
      wide.exists(p => p._1 == "blue bolt" && p._2 == "red bolt" && p._3 == 4 && p._4 == 2L),
      "blocked candidates at dist 4 must appear once the verifier allows them")
    assert(!wide.exists(p => p._1.endsWith("bolt") && p._2.endsWith("gear")),
      "cross-block pairs must not form even when distance would admit them")
  }

  test("maxDist 0 keeps only exact-name duplicate pairs") {
    assert(run(maxDist = 0) == Seq(("red bolt", "red bolt", 0, 1L)))
  }

  test("n_pairs counts id pairs under one name pair") {
    val dup = Seq((1L, "a x"), (2L, "a x"), (3L, "a x")).toDF("id", "name")
    val out = Linkage.fuzzyNamePairs(dup, "id", "name",
      Linkage.blockByLastToken(col("name")), 0)
      .as[(String, String, Int, Long)].collect()
    assert(out.toSeq == Seq(("a x", "a x", 0, 3L))) // C(3,2) id pairs
  }

  test("blockByLastToken: lowercased head noun, whitespace-robust") {
    val keys = Seq("Red  Bolt ", "gear", " Blue GEAR").toDF("n")
      .select(Linkage.blockByLastToken(col("n"))).as[String].collect()
    assert(keys.toSeq == Seq("bolt", "gear", "gear"))
  }
}
