package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Golden port of the reference's snake_case / string_normalize cases
  * (tests/test_helpers.py:131-160, :229-244).
  */
class StringFnsSpec extends SparkSuite {

  private val snakeCases = Seq(
    "русскаястрока" -> "русскаястрока",
    "РусскийВерблюд" -> "русский_верблюд",
    "русскийВерблюд2" -> "русский_верблюд_2",
    "Русские пробелы" -> "русские_пробелы",
    "русский-кебаб" -> "русский_кебаб",
    "РУССКИЕ_БОЛЬШИЕ" -> "русские_большие",
    "русская_змея" -> "русская_змея",
    "РусскийДлинныйВерблюдПлюсЧисло1" -> "русский_длинный_верблюд_плюс_число_1",
    "singlestring" -> "singlestring",
    "camelCase" -> "camel_case",
    "longCamelCase" -> "long_camel_case",
    "longCamelCaseWithNumber1" -> "long_camel_case_with_number_1",
    "PascalCase" -> "pascal_case",
    "LongPascalCase" -> "long_pascal_case",
    "LongPascalCaseWithNumber1" -> "long_pascal_case_with_number_1",
    "snake_case" -> "snake_case",
    "kebab-case" -> "kebab_case",
    "CONSTANT_CASE" -> "constant_case",
    "camelCase-kebab_snakePascalCaseCONSTANT_case" -> "camel_case_kebab_snake_pascal_case_constant_case",
    "separated string case" -> "separated_string_case")

  for ((in, out) <- snakeCases)
    test(s"snakeCase: '$in' -> '$out'") {
      assert(evalOne(StringFns.snakeCase(lit(in))) == out)
    }

  test("snakeCase: null -> null") {
    assert(evalOne(StringFns.snakeCase(lit(null).cast("string"))) == null)
  }

  test("snakeCase: blank -> empty") {
    assert(evalOne(StringFns.snakeCase(lit(" "))) == "")
  }

  test("stripEmoji removes emoji, keeps text") {
    assert(evalOne(StringFns.stripEmoji(lit("normalized"))) == "normalized")
    assert(evalOne(StringFns.stripEmoji(lit("emoji😎"))) == "emoji")
    assert(evalOne(StringFns.stripEmoji(lit("a😎🚀b🇷🇺c"))) == "abc")
  }

  test("lowerSafe lowers and passes null through") {
    assert(evalOne(StringFns.lowerSafe(lit("AbC"))) == "abc")
    assert(evalOne(StringFns.lowerSafe(lit(null).cast("string"))) == null)
  }
}
