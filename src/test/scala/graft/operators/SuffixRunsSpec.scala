package graft.operators

import graft.SparkSuite

/** Exact shared-run discovery: hand-computed longest runs, level
  * bracketing, extension boundaries, and determinism.
  */
class SuffixRunsSpec extends SparkSuite {
  import spark.implicits._

  private def runs(docs: Seq[(Long, String)], minRun: Int = 2,
                   levels: Int = 3): Map[(Long, Long), Int] =
    SuffixRuns.sharedRuns(docs.toDF("doc_id", "text"), "text", "doc_id",
      minRun = minRun, levels = levels)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, l) => (a, b) -> l }.toMap

  test("longest shared run is exact (crosses a level boundary)") {
    // run "a b c d e" (5 tokens): max matching level is w=4, the
    // anchor extends to exactly 5
    val got = runs(Seq(
      (1L, "a b c d e x y"),
      (2L, "q a b c d e z")))
    assert(got == Map((1L, 2L) -> 5))
  }

  test("identical documents report their full length") {
    val got = runs(Seq((1L, "m n o p"), (2L, "m n o p")))
    assert(got == Map((1L, 2L) -> 4))
  }

  test("two shared runs: the longest wins") {
    val got = runs(Seq(
      (1L, "a b c x d e f g"),
      (2L, "a b c y d e f g")))
    assert(got == Map((1L, 2L) -> 4))
  }

  test("pairs below minRun are not reported") {
    val got = runs(Seq((1L, "k l m"), (2L, "l k m q")))
    // shared 2-windows: none ("k l" vs "l k", "l m" vs "k m")
    assert(got.isEmpty, got.toString)
  }

  test("two distinct runs on the SAME diagonal both extend (islands, not min-per-diagonal)") {
    // 'a b' (pa=1) and 'd e f' (pa=4,5) both sit on diagonal 0 at the
    // pair's max level w*=2; collapsing the diagonal to min(pa) would
    // extend only 'a b' and report 2 where the truth is 3
    val got = runs(Seq(
      (1L, "a b x d e f"),
      (2L, "a b y d e f")))
    assert(got == Map((1L, 2L) -> 3))
  }

  test("runs at the document boundaries extend correctly") {
    // shared run is a PREFIX of one doc and a SUFFIX of the other
    val got = runs(Seq(
      (1L, "a b c d q r"),
      (2L, "x y a b c d")))
    assert(got == Map((1L, 2L) -> 4))
  }

  test("three documents: every overlapping pair reported") {
    val got = runs(Seq(
      (1L, "a b c d"),
      (2L, "z a b c d"),
      (3L, "a b q q q")))
    assert(got == Map((1L, 2L) -> 4, (1L, 3L) -> 2, (2L, 3L) -> 2))
  }

  test("result is identical under repartitioning") {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val base = (0 until 30).map(i =>
      (i.toLong, Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    // plant: doc 100+i shares a mid-window with doc i
    val planted = (0 until 10).map { i =>
      val toks = base(i)._2.split(" ")
      (100L + i, ("qq rr " + toks.slice(2, 9).mkString(" ") + " ss").trim)
    }
    val docs = base ++ planted
    def run(d: org.apache.spark.sql.DataFrame) =
      SuffixRuns.sharedRuns(d, "text", "doc_id", minRun = 4, levels = 3)
        .orderBy("doc_a", "doc_b")
        .as[(Long, Long, Int)].collect().toSeq
    val df = docs.toDF("doc_id", "text")
    val a = run(df.repartition(1))
    val b = run(df.repartition(7))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("coveredPositions: union of shared windows, hand-computed") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a b c d e"),   // shares "a b c","b c d" with 2 -> covers 1..4
      (2L, "a b c d x"),   // same grams -> covers 1..4
      (3L, "q r s t u"))   // nothing shared
      .toDF("doc_id", "text")
      .select(col("doc_id").as("_id"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
    val got = SuffixRuns.coveredPositions(docs, minRun = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 4L, 0.2), (2L, 5L, 4L, 0.2), (3L, 5L, 0L, 1.0)))
  }
}
