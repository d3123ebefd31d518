package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hashed-n-gram linear classifier inference: feature extraction,
  * integer-grid determinism, and the broadcast-join plan shape.
  */
class QualityClassifierSpec extends SparkSuite {
  import spark.implicits._

  test("n_feats = 2n-1 (unigrams + bigrams), single-token docs have no bigrams") {
    val df = Seq((1L, "a b c d"), (2L, "solo")).toDF("doc_id", "text")
    val got = QualityClassifier.scoreHashModel(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Int]("n_feats") == 7)
    assert(got(1).getAs[Int]("n_feats") == 1)
  }

  test("score matches a driver-side recomputation of the hash model") {
    // recompute md5-derived buckets/weights in plain Scala (a fully
    // independent path from the Column expressions)
    def md24(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(3).map(b => f"$b%02x").mkString, 16)
    }
    val text = "the quick brown fox the quick"
    val toks = text.split("\\s+").map(_.toLowerCase).toSeq
    val feats = toks ++ toks.sliding(2).map(_.mkString(" "))
    val expectedFp = feats.map(f => md24("w:" + (md24(f) % 4096)) - (1L << 23)).sum
    val expected = expectedFp.toDouble / (feats.size.toDouble * (1L << 23))

    val r = QualityClassifier.scoreHashModel(
      Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id").collect()(0)
    assert(r.getAs[Int]("n_feats") == feats.size)
    assert(r.getAs[Double]("score") == expected)
    assert(r.getAs[Boolean]("label") == (expectedFp > 0))
  }

  test("score is bit-identical under repartitioning (int64 sums)") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val df = (0 until 50).map(i =>
      (i.toLong, Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      QualityClassifier.scoreHashModel(d, "text", "doc_id")
        .orderBy("doc_id").as[(Long, Int, Double, Boolean)].collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(9)))
  }

  test("the weights join broadcasts (model inference never shuffles the corpus)") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = QualityClassifier.scoreHashModel(df, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
