package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.{Dedup, Similarity}

/** Codegen guards for the vector/minhash native expressions — with
  * `spark.sql.codegen.fallback=false` a generated-code compile error (the
  * silent-interpreted-fallback failure mode the snake_case expression hit)
  * throws instead of quietly degrading.
  */
class VectorExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def noFallback[T](body: => T): T = {
    val saved = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally spark.conf.set("spark.sql.codegen.fallback", saved)
  }

  test("DotProduct / HyperplaneBucket generated code compiles and runs") {
    noFallback {
      val rnd = new scala.util.Random(3)
      val df = (0 until 50).map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
      val out = df.select(
        Similarity.dot(col("embedding"), col("embedding")).as("d"),
        Similarity.lshBucket(col("embedding"), 8, 6).as("b"))
        .where(col("d") > 0)
      assert(out.count() == 50)
    }
  }

  test("MinHashSignature generated code compiles; empty shingles yield null") {
    noFallback {
      val df = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "too short"), // < k tokens -> empty shingle array -> null signature
        (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")
      val sigs = Dedup.minHashSignatures(df, "text", "doc_id", k = 3, numHashes = 16)
        .as[(Long, Seq[Long])].collect().toMap
      assert(sigs.keySet == Set(1L)) // 2 and 3 dropped like the explode form
      assert(sigs(1L).length == 16)
    }
  }

  test("fuzz: ShingleHashes set-equals HOF shingles; SimHash64 equals aggregate form on hostile strings") {
    // the whitespace/unicode classes that bit snake_case in round 3:
    // tabs/newlines (split boundaries Spark's trim does NOT strip),
    // multi-space runs, Cyrillic, emoji (surrogate pairs), leading/
    // trailing blanks, empty and blank-only strings
    val charset = "ab zZ \t\n  яЁ 09 😎 ,. \r"
    val rnd = new scala.util.Random(1234)
    val cases = (0 until 600).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, (0 until n).map(_ => charset(rnd.nextInt(charset.length))).mkString)
    } :+ (9000L, "") :+ (9001L, "   ") :+ (9002L, "\t") :+ (9003L, "one two three four")
    val df = cases.toDF("doc_id", "text")
    val sh = df.select(
      col("doc_id"),
      Dedup.shingleHashes(col("text"), 2).as("native"),
      transform(Dedup.shingles(col("text"), 2), x => xxhash64(x)).as("hof"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    for ((id, native, hof) <- sh)
      assert(native.toSet == hof.toSet, s"doc $id: shingle sets differ (native=$native hof=$hof)")
    val fp = df.select(col("doc_id"), col("text")).where(col("text").isNotNull)
    val nativeFp = Dedup.simHash(fp, "text", "doc_id").as[(Long, Long)].collect().toMap
    val aggFp = Dedup.simHashAgg(fp, "text", "doc_id").as[(Long, Long)].collect().toMap
    assert(nativeFp == aggFp)
  }

  test("new kernels are SQL-callable through GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  size(shingle_hashes('one two three four', 2)) AS nsh,
        |  simhash64('one two three', 48) AS fp""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 0.5)
    assert(r.getInt(2) == 3)
    assert(!r.isNullAt(3))
  }

  test("minHashPairs end-to-end under no-fallback codegen") {
    noFallback {
      val df = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "alpha beta gamma delta epsilon zeta eta iota"),
        (3L, "completely unrelated words nothing shared here at all"))
        .toDF("doc_id", "text")
      val pairs = Dedup.minHashPairs(df, "text", "doc_id", threshold = 0.5)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L)))
    }
  }
}
