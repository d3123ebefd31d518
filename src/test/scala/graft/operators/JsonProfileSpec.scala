package graft.operators

import graft.SparkSuite

/** JSON schema profiling: key presence, type classification order, and
  * null/absent handling.
  */
class JsonProfileSpec extends SparkSuite {

  import spark.implicits._

  test("classifies bool / long / double / string and counts presence per key") {
    val docs = Seq(
      """{"a": 1, "b": 0.5, "c": "x", "d": true}""",
      """{"a": 2, "b": 1.0e-3, "c": "7seas"}""",
      """{"a": "oops", "b": -4.25}""",          // a drifts to string here
      """{"e": -12}"""
    ).toDF("doc")
    val out = JsonProfile.profile(docs, "doc")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("a", 3L, 0L, 2L, 0L, 1L),   // two longs, one drifted string
      ("b", 3L, 0L, 0L, 3L, 0L),   // incl. scientific notation
      ("c", 2L, 0L, 0L, 0L, 2L),   // "7seas" is not numeric
      ("d", 1L, 1L, 0L, 0L, 0L),
      ("e", 1L, 0L, 1L, 0L, 0L)))  // negative long
  }

  test("explicit JSON nulls and malformed documents contribute nothing") {
    val docs = Seq("""{"a": null, "b": 3}""", """not json at all""", """{}""")
      .toDF("doc")
    val out = JsonProfile.profile(docs, "doc")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("b", 1L, 0L, 1L, 0L, 0L)))
  }

  test("boolean strings beat the numeric classes in priority order") {
    // a string-typed "true" is indistinguishable from a bool in the
    // schemaless map parse — document the contract: it counts as bool
    val docs = Seq("""{"x": "true", "y": "123"}""").toDF("doc")
    val out = JsonProfile.profile(docs, "doc")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("x", 1L, 1L, 0L, 0L, 0L), ("y", 1L, 0L, 1L, 0L, 0L)))
  }
}
