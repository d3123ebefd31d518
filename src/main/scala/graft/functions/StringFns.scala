package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String normalization column functions.
  *
  * Semantics mirror the reference's scalar helpers
  * (`/root/reference/tracker_exporter/utils/helpers.py:102-117` snake_case,
  * `:247-258` emoji strip), re-expressed as codegen-friendly native
  * `regexp_replace` chains — no UDFs.
  */
object StringFns {

  /** Cyrillic-aware `snake_case` conversion.
    *
    * Four-step regex chain (helpers.py:110-113):
    *   1. insert `_` between a lowercase letter and an uppercase letter
    *   2. insert `_` between a lowercase letter and a digit
    *   3. insert `_` between a digit and a lowercase letter
    *   4. replace any non-alphanumeric with `_`
    * then lowercase. Null stays null; blank input collapses to "".
    */
  def snakeCase(c: Column): Column = {
    val s1 = regexp_replace(c, "(?<=[a-zа-яё])(?=[A-ZА-ЯЁ])", "_")
    val s2 = regexp_replace(s1, "(?<=[a-zа-яё])(?=\\d)", "_")
    val s3 = regexp_replace(s2, "(?<=\\d)(?=[a-zа-яё])", "_")
    val s4 = regexp_replace(s3, "[^a-zA-Zа-яёА-ЯЁ0-9_]", "_")
    when(c.isNull, lit(null).cast("string"))
      .when(trim(c) === "", trim(c))
      .otherwise(lower(s4))
  }

  /** Emoji / pictograph / transport / flag block stripper
    * (helpers.py `string_normalize`, applied to issue titles).
    */
  def stripEmoji(c: Column): Column =
    regexp_replace(
      c,
      "[\\x{1F600}-\\x{1F64F}\\x{1F300}-\\x{1F5FF}\\x{1F680}-\\x{1F6FF}\\x{1F1E0}-\\x{1F1FF}]+",
      ""
    )

  /** Null-safe lowered string access (helpers.py `validate_resource` with
    * `low=True`): lowercases non-null strings, passes nulls through.
    */
  def lowerSafe(c: Column): Column = lower(c)
}
