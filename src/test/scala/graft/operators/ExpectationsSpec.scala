package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions.col

class ExpectationsSpec extends SparkSuite {

  import spark.implicits._

  private val rules = Seq(
    "nonneg" -> (col("v") >= 0),
    "named" -> col("name").isNotNull)

  private val df = Seq(
    (1L, 5.0, "a"),                          // clean
    (2L, -1.0, "b"),                         // fails nonneg
    (3L, 2.0, null.asInstanceOf[String]),    // fails named
    // NOTE: Spark SQL orders NaN ABOVE every number, so NaN >= 0 is
    // TRUE — a rule that must reject NaN needs an explicit isnan()
    (4L, java.lang.Double.NaN, null.asInstanceOf[String])
  ).toDF("id", "v", "name")

  test("check labels each row with its failed rules; null predicate = violation") {
    val got = Expectations.check(df, rules)
      .select("id", "failed_rules").as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Nil)
    assert(got(2L) == Seq("nonneg"))
    assert(got(3L) == Seq("named"))
    assert(got(4L) == Seq("named")) // NaN passes nonneg (Spark NaN ordering)
  }

  test("passing/quarantined split the batch exactly") {
    val checked = Expectations.check(df, rules)
    assert(Expectations.passing(checked).select("id").as[Long].collect().toSeq == Seq(1L))
    assert(Expectations.quarantined(checked).select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
    // id 4 is quarantined by `named` alone — see the NaN note above
    // passing drops the bookkeeping column
    assert(!Expectations.passing(checked).columns.contains("failed_rules"))
  }

  test("summary reports every rule, including zero-violation ones") {
    val got = Expectations.summary(df, rules :+ ("id_positive" -> (col("id") > 0)))
      .select("rule", "n_violations", "n_rows").as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("nonneg") == (1L, 4L)) // NaN passes nonneg (Spark NaN ordering)
    assert(got("named") == (2L, 4L))
    assert(got("id_positive") == (0L, 4L))
  }
}
