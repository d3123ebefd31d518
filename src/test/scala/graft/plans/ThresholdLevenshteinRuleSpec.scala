package graft.plans

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The optimizer rule rewrites naive Levenshtein comparisons to the
  * band-limited thresholded form without changing results.
  */
class ThresholdLevenshteinRuleSpec extends SparkSuite {

  import spark.implicits._

  // RDD-backed, NOT a LocalRelation: ConvertToLocalRelation would
  // otherwise evaluate the whole filter at optimize time and leave no
  // expression to inspect
  private lazy val pairs = spark.createDataset(spark.sparkContext.parallelize(Seq(
    ("red bolt", "red bolt"),   // 0
    ("red bolt", "rad bolt"),   // 1
    ("red bolt", "blue bolt"),  // 4
    ("gear", "gears")           // 1
  ))).toDF("a", "b")

  /** Collect every Levenshtein expression in the OPTIMIZED plan with its
    * threshold presence.
    */
  private def levThresholds(df: org.apache.spark.sql.DataFrame): Seq[Option[Int]] = {
    val buf = scala.collection.mutable.ArrayBuffer[Option[Int]]()
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case l @ Levenshtein(_, _, t) =>
        buf += t.map(_.eval().asInstanceOf[Int]); l
    }
    buf.toSeq
  }

  test("lev <= k, < k, and = k comparisons gain a threshold; results unchanged") {
    GraftExtensions.register(spark)
    val le = pairs.where(levenshtein(col("a"), col("b")) <= 1)
    assert(levThresholds(le) == Seq(Some(1)), "<= 1 must band-limit at 1")
    assert(le.count() == 3)

    val lt = pairs.where(levenshtein(col("a"), col("b")) < 2)
    assert(levThresholds(lt) == Seq(Some(1)), "< 2 must band-limit at 1")
    assert(lt.count() == 3)

    val eq = pairs.where(levenshtein(col("a"), col("b")) === 4)
    assert(levThresholds(eq) == Seq(Some(4)), "= 4 must band-limit at 4")
    assert(eq.count() == 1)

    // mirrored literal-first form
    val ge = pairs.where(lit(1) >= levenshtein(col("a"), col("b")))
    assert(levThresholds(ge) == Seq(Some(1)))
    assert(ge.count() == 3)
  }

  test("a projected Levenshtein value is left untouched") {
    GraftExtensions.register(spark)
    val proj = pairs.select(levenshtein(col("a"), col("b")).as("d"))
    assert(levThresholds(proj) == Seq(None), "projection must keep the full DP")
    assert(proj.as[Int].collect().sorted.toSeq == Seq(0, 1, 1, 4))
  }

  test("rewrite agrees with the unoptimized predicate across random strings") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(5)
    def word() = (0 until 3 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val df = spark.createDataset(spark.sparkContext.parallelize(
      Seq.fill(300)((word(), word())))).toDF("a", "b")
    val viaRule = df.where(levenshtein(col("a"), col("b")) <= 2).count()
    val manual = df.select(col("a"), col("b"), levenshtein(col("a"), col("b")).as("d"))
      .where(col("d") <= 2).count() // projection form: rule does not fire
    assert(viaRule == manual)
  }
}
