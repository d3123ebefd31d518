package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join — "which events fall inside which windows"
  * (incident correlation, maintenance-window attribution, ad-exposure
  * sessions). Spark has no native range join, and the naive encoding
  * `a.key = b.key AND a.ts >= b.start AND a.ts < b.end` plans as a join
  * with a non-equi predicate: per key it degenerates to |points|×|intervals|
  * comparisons — a cross join in key clothing.
  *
  * The scale form is bucket decomposition (the interval-join design
  * every range-join engine uses underneath): quantize time into
  * `bucketSeconds` buckets, explode each interval into the buckets it
  * covers (a BOUNDED fan-out: ⌈len/bucket⌉ rows per interval), tag each
  * point with its single bucket, equi-join on (key, bucket), and keep
  * the exact predicate as a residual filter. Every matched pair meets
  * in exactly ONE bucket — the point's — so no dedup pass is needed.
  *
  * Pick `bucketSeconds` near the typical interval length: fan-out stays
  * a small constant while each bucket's population stays sparse. A
  * pathologically hot (key, bucket) cell — every point and every
  * interval in one hour of one tenant — is ordinary join skew; AQE
  * splits it, or the [[SkewJoin]] salt composes in.
  */
object IntervalJoin {

  /** Join `points` (carrying `tsCol`) against `intervals` (carrying
    * `[startCol, endCol)` — end EXCLUSIVE) on equal `keyCols` and
    * containment. Emits all columns of both inputs (key columns once);
    * the caller ensures the remaining names don't collide.
    */
  def pointInInterval(points: DataFrame, tsCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      keyCols: Seq[String], bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val us = bucketSeconds * 1000000L
    val p = points.withColumn("_b", expr(s"unix_micros($tsCol) div ${us}L"))
    val iv = intervals
      .where(col(endCol) > col(startCol)) // empty intervals match nothing
      .withColumn("_b", explode(sequence(
        expr(s"unix_micros($startCol) div ${us}L"),
        expr(s"(unix_micros($endCol) - 1L) div ${us}L"))))
    iv.join(p, keyCols :+ "_b")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_b")
  }

  /** Interval-interval overlap join: all pairs from `a` × `b` (equal
    * keys) whose half-open spans intersect, with the exact overlap
    * length in microseconds — ad-exposure vs session attribution,
    * incident-window vs deploy-window blame, any "how long were these
    * two states simultaneously true" question.
    *
    * Same bucket decomposition as [[pointInInterval]], with one twist:
    * an overlapping PAIR shares every bucket their overlap covers, so
    * the equi-join would emit it once per shared bucket. Instead of a
    * dedup pass, each pair is CREDITED to exactly one bucket — the one
    * containing the overlap's start `max(startA, startB)` (which lies
    * inside both intervals by definition, so both sides exploded into
    * that bucket) — and all other meetings are filtered by the residual.
    * No distinct, no window; the join output is exact pairs.
    *
    * Fan-out is ⌈len/bucket⌉ per interval per side — pick
    * `bucketSeconds` near the typical interval length. Emits key
    * columns once, both payloads, and `overlap_us`.
    */
  def intervalOverlap(a: DataFrame, startA: String, endA: String,
                      b: DataFrame, startB: String, endB: String,
                      keyCols: Seq[String], bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val us = bucketSeconds * 1000000L
    def exploded(df: DataFrame, s: String, e: String): DataFrame = df
      .where(col(e) > col(s))
      .withColumn("_b", explode(sequence(
        expr(s"unix_micros($s) div ${us}L"),
        expr(s"(unix_micros($e) - 1L) div ${us}L"))))
    exploded(a, startA, endA).join(exploded(b, startB, endB), keyCols :+ "_b")
      .where(col(startA) < col(endB) && col(startB) < col(endA))
      .where(expr(s"greatest(unix_micros($startA), unix_micros($startB)) div ${us}L") === col("_b"))
      .withColumn("overlap_us",
        expr(s"least(unix_micros($endA), unix_micros($endB))") -
          expr(s"greatest(unix_micros($startA), unix_micros($startB))"))
      .drop("_b")
  }
}
