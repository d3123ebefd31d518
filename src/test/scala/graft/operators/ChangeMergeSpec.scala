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

  test("mergeRollups(base, delta) equals the full recomputation, any split point") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    val raw = Seq.fill(300)((s"k${rnd.nextInt(5)}", rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
      .toDF("key", "day", "v")
    def rollup(df: org.apache.spark.sql.DataFrame) = df.groupBy("key", "day")
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"), min("v").as("lo"), max("v").as("hi"))
    val full = rollup(raw).orderBy("key", "day")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    for (cut <- Seq(0L, 3L, 7L, 10L)) {
      val merged = ChangeMerge.mergeRollups(
        Seq(rollup(raw.where(col("day") < cut)), rollup(raw.where(col("day") >= cut))),
        Seq("key", "day"), sumCols = Seq("cnt", "s"), minCols = Seq("lo"), maxCols = Seq("hi"))
        .orderBy("key", "day")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      assert(merged == full, s"cut=$cut")
    }
  }

  test("mergeRollups folds three partial snapshots") {
    import org.apache.spark.sql.functions._
    val parts = Seq(
      Seq(("a", 2L, 10L)), Seq(("a", 3L, 7L), ("b", 1L, 1L)), Seq(("b", 4L, 2L))
    ).map(_.toDF("key", "cnt", "s"))
    val out = ChangeMerge.mergeRollups(parts, Seq("key"), sumCols = Seq("cnt", "s"))
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 5L, 17L), ("b", 5L, 3L)))
  }
}
