package graft.operators

import graft.SparkSuite

/** BPE merge induction, verified against an independent plain-Scala
  * reimplementation of the same definition (frequency-weighted pair
  * counts, (count desc, left, right) argmax, leftmost non-overlapping
  * string rewriting).
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Reference implementation over a token->freq map. */
  private def referenceMerges(tokens: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var vocab = tokens.toSeq.map { case (t, f) => (s" ${t.split("").mkString(" ")} ", f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var continueSteps = true
    for (step <- 1 to k if continueSteps) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, f) <- vocab) {
        val syms = s.trim.split(" ")
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) continueSteps = false
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((step, a, b, c))
        vocab = vocab.map { case (s, f) => (s.replace(s" $a $b ", s" $a$b "), f) }
      }
    }
    out.result()
  }

  test("merges match the reference implementation on the classic corpus") {
    val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val docs = freq.toSeq.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Bpe.merges(docs, "text", k = 6)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == referenceMerges(freq, 6))
    // sanity on the classic example: the first merge is (e,s) from
    // newest(6)+widest(3) = 9
    assert(got.head == ((1, "e", "s", 9L)))
    // merged symbols keep merging: some later step consumes "es"
    assert(got.exists(m => m._2 == "es" || m._3 == "es"))
  }

  test("encodeCounts applies every merge: classic corpus subword counts") {
    val freq = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val docs = freq.toSeq.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    // independent recomputation: run referenceMerges' rewrite chain on
    // each word and count symbols
    val ms = referenceMerges(freq, 6)
    def encode(w: String): Int = {
      var s = s" ${w.split("").mkString(" ")} "
      ms.foreach { case (_, a, b, _) => s = s.replace(s" $a $b ", s" $a$b ") }
      s.trim.split(" ").length
    }
    val got = Bpe.encodeCounts(docs, "text", "doc_id", k = 6)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val words = freq.toSeq.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) == ((1, encode(w))), s"doc $i word $w")
    }
  }

  test("stops early when the vocabulary runs dry") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // only 2 distinct pairs exist: (a,b) and (c,d); asking for 10 yields 2
    val got = Bpe.merges(docs, "text", k = 10)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(m => (m._2, m._3)) == Seq(("a", "b"), ("c", "d")))
  }

  test("tie-break is (count desc, left asc, right asc)") {
    // "ba" and "ab" each appear twice -> counts tie at 2; (a,b) < (b,a)
    val docs = Seq((1L, "ab ab ba ba")).toDF("doc_id", "text")
    val got = Bpe.merges(docs, "text", k = 1)
      .as[(Int, String, String, Long)].collect()(0)
    assert((got._2, got._3, got._4) == (("a", "b", 2L)))
  }

  test("encodeCountsWith round-trips the merges artifact through parquet") {
    val docs = Seq(
      (1L, "banana band bandana"), (2L, "ana band banana"),
      (3L, "sandbank bandana ana")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_ws_tokens", "n_bpe_tokens")
        .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val direct = rows(Bpe.encodeCounts(docs, "text", "doc_id", k = 6))
    // train once, persist the artifact, reload, encode with it
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpe").resolve("merges").toString
    Bpe.merges(docs, "text", k = 6).write.parquet(tmp)
    val reloaded = spark.read.parquet(tmp)
    assert(rows(Bpe.encodeCountsWith(docs, "text", "doc_id", reloaded)) == direct)
    assert(direct.nonEmpty)
    // unseen corpus: tokens the training never saw still encode
    // (merge rules apply where they can, chars remain elsewhere)
    val unseen = Seq((9L, "banal panda")).toDF("doc_id", "text")
    val enc = rows(Bpe.encodeCountsWith(unseen, "text", "doc_id", reloaded))
    assert(enc.length == 1 && enc.head._2 == 2 && enc.head._3 >= 2)
  }
}
