package graft.operators

import graft.SparkSuite

/** Batch MERGE semantics: upsert-over-existing, insert-of-new, delete,
  * delete-of-absent, kept rows, and last-change-wins collapsing.
  */
class ChangeMergeSpec extends SparkSuite {

  import spark.implicits._

  private lazy val snapshot = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")
  ).toDF("id", "payload")

  private lazy val changes = Seq(
    (2L, "upsert", 10L, "B"),     // update existing
    (3L, "delete", 11L, "x"),     // delete existing
    (5L, "upsert", 12L, "E"),     // insert new
    (6L, "delete", 13L, "x"),     // delete absent: no-op
    (4L, "upsert", 14L, "D1"),    // superseded by seq 15
    (4L, "delete", 15L, "x")      // last change wins: 4 deletes
  ).toDF("id", "op", "seq", "payload")

  test("merge outcomes: kept / updated / inserted / deleted, latest change wins") {
    val out = ChangeMerge.applyChanges(snapshot, changes, "id", "op", "seq", Seq("payload"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "a", "kept"),
      (2L, "B", "updated"),
      (5L, "E", "inserted")))
  }

  test("reversed sequence keeps 4 alive (upsert supersedes the delete)") {
    val swapped = changes
      .withColumn("seq", org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("id") === 4L,
        org.apache.spark.sql.functions.lit(30L) - org.apache.spark.sql.functions.col("seq"))
        .otherwise(org.apache.spark.sql.functions.col("seq")))
    val out = ChangeMerge.applyChanges(snapshot, swapped, "id", "op", "seq", Seq("payload"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out.contains((4L, "D1", "updated")))
  }

  test("empty change feed passes the snapshot through as kept") {
    val out = ChangeMerge.applyChanges(snapshot, changes.limit(0), "id", "op", "seq", Seq("payload"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a", "kept"), (2L, "b", "kept"), (3L, "c", "kept"), (4L, "d", "kept")))
  }
}
