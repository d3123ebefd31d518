package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.StringFns

/** The one-pass native snake_case must agree with the 4-regex chain on the
  * reference goldens AND on fuzzed inputs over the full character mix.
  */
class SnakeCaseExpressionSpec extends SparkSuite {

  private lazy val registered = { GraftExtensions.register(spark); true }

  test("matches the regex chain on the reference golden cases") {
    assert(registered)
    val cases = Seq(
      "русскаястрока", "РусскийВерблюд", "русскийВерблюд2", "Русские пробелы",
      "русский-кебаб", "РУССКИЕ_БОЛЬШИЕ", "русская_змея",
      "РусскийДлинныйВерблюдПлюсЧисло1", "singlestring", "camelCase",
      "longCamelCaseWithNumber1", "PascalCase", "CONSTANT_CASE",
      "camelCase-kebab_snakePascalCaseCONSTANT_case", "separated string case", " ")
    import spark.implicits._
    val out = cases.toDF("s")
      .select(GraftExtensions.snakeCaseExpr(col("s")).as("native"), StringFns.snakeCase(col("s")).as("regex"))
      .collect()
    for (r <- out) assert(r.getString(0) == r.getString(1), s"case mismatch: $r")
  }

  test("fuzz: 2000 random mixed-charset strings agree with the regex chain") {
    assert(registered)
    val charset = "abzABZ рЯя ёЁ019-_.#/😎\tФф"
    val rnd = new scala.util.Random(99)
    val cases = (0 until 2000).map { _ =>
      val n = rnd.nextInt(24)
      (0 until n).map(_ => charset(rnd.nextInt(charset.length))).mkString
    }
    import spark.implicits._
    val out = cases.toDF("s")
      .select(col("s"), GraftExtensions.snakeCaseExpr(col("s")).as("native"), StringFns.snakeCase(col("s")).as("regex"))
      .collect()
    for (r <- out)
      assert(r.getString(1) == r.getString(2), s"input '${r.getString(0)}': native=${r.getString(1)} regex=${r.getString(2)}")
  }

  test("generated code actually compiles (no silent interpreted fallback)") {
    assert(registered)
    // with fallback disabled, a codegen compile error (e.g. a missing
    // static forwarder — the eval-name collision this guards against)
    // would throw instead of silently running interpreted
    val saved = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = graft.sources.Tables.part(spark, "/root/testdata/sf0.001")
        .select(GraftExtensions.snakeCaseExpr(col("p_name")).as("s"))
      assert(out.count() > 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", saved)
  }

  test("null passthrough and SQL callability") {
    assert(registered)
    val r = spark.sql("SELECT snake_case('PascalCase') AS a, snake_case(CAST(NULL AS STRING)) AS n").collect()(0)
    assert(r.getString(0) == "pascal_case")
    assert(r.isNullAt(1))
  }
}
