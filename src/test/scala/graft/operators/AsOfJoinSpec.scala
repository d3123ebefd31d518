package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOf picks the latest right row at or before each left row, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after two clicks -> latest (09:30)
      (1L, 11L, ts("2024-01-01 09:00:00")), // exactly at a click -> inclusive
      (1L, 12L, ts("2024-01-01 08:00:00")), // before any click -> null
      (2L, 20L, ts("2024-01-01 12:00:00"))  // other key: only its own rows visible
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 09:30:00"), 101L),
      (2L, ts("2024-01-01 11:00:00"), 200L),
      (3L, ts("2024-01-01 00:00:00"), 300L) // unrelated key never leaks
    ).toDF("user_id", "ts", "click_id")

    val got = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("click_id"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(10L -> Some(101L), 11L -> Some(100L), 12L -> None, 20L -> Some(200L)))
  }

  test("asOfForward picks the earliest right row at or after each left row, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 08:00:00")), // before both clicks -> earliest (09:00)
      (1L, 11L, ts("2024-01-01 09:30:00")), // exactly at a click -> inclusive
      (1L, 12L, ts("2024-01-01 10:00:00")), // after the history ends -> null
      (2L, 20L, ts("2024-01-01 10:00:00"))  // other key: only its own rows
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 09:30:00"), 101L),
      (2L, ts("2024-01-01 11:00:00"), 200L),
      (3L, ts("2024-01-01 23:00:00"), 300L)
    ).toDF("user_id", "ts", "click_id")
    val got = AsOfJoin.asOfForward(left, right, Seq("user_id"), "ts", "ts", Seq("click_id"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(10L -> Some(100L), 11L -> Some(101L), 12L -> None, 20L -> Some(200L)))
  }

  test("asOfNearest picks the closer direction, backward on tie, survives one-sided nulls") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 09:10:00")), // back 09:00 (10m) vs fwd 09:40 (30m) -> back
      (1L, 11L, ts("2024-01-01 09:35:00")), // back 09:00 (35m) vs fwd 09:40 (5m) -> fwd
      (1L, 12L, ts("2024-01-01 09:20:00")), // exact 20m tie -> backward
      (1L, 13L, ts("2024-01-01 08:00:00")), // nothing before -> forward only
      (2L, 20L, ts("2024-01-01 12:00:00"))  // nothing after -> backward only
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 09:40:00"), 101L),
      (2L, ts("2024-01-01 11:00:00"), 200L)
    ).toDF("user_id", "ts", "click_id")
    val got = AsOfJoin.asOfNearest(left, right, Seq("user_id"), "ts", "ts",
      Seq("ts", "click_id"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(10L -> Some(100L), 11L -> Some(101L), 12L -> Some(100L),
      13L -> Some(100L), 20L -> Some(200L)))
  }

  test("asOf payload fields all come from the SAME right row (struct carry, not per-column)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    // the newer right row has a null tag: per-column carry-forward would
    // stitch (newer id, older tag); the struct carry must keep both from
    // the newest row
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "old"),
      (1L, ts("2024-01-01 09:30:00"), 2L, null.asInstanceOf[String])
    ).toDF("user_id", "ts", "rid", "tag")
    val r = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("rid", "tag"))
      .select("asof_rid", "asof_tag").collect()(0)
    assert(r.getLong(0) == 2L && r.isNullAt(1))
  }

  test("asOf is deterministic under duplicate right timestamps (payload-hash tiebreak)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 5L),
      (1L, ts("2024-01-01 09:00:00"), 9L)
    ).toDF("user_id", "ts", "rid")
    // ties order by xxhash64 of the payload struct: the max-hash payload
    // wins, every run, regardless of input partitioning
    val expected = right.select(org.apache.spark.sql.functions.col("rid"),
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.struct(org.apache.spark.sql.functions.col("rid"))).as("h"))
      .as[(Long, Long)].collect().maxBy(_._2)._1
    val runs = (1 to 3).map { _ =>
      AsOfJoin.asOf(left, right.repartition(7), Seq("user_id"), "ts", "ts", Seq("rid"))
        .select("asof_rid").as[Long].collect().toSeq
    }
    assert(runs.forall(_ == Seq(expected)))
  }

  test("asOf never matches null timestamps: null right ts is ignored, null left ts gets null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, null.asInstanceOf[Timestamp]) // null left ts -> no match
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, null.asInstanceOf[Timestamp], 999L) // null right ts must never carry
    ).toDF("user_id", "ts", "click_id")
    for (buckets <- Seq(None, Some(3600L))) {
      val got = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("click_id"),
          skewBucketSeconds = buckets)
        .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
      assert(got == Map(10L -> Some(100L), 11L -> None), s"buckets=$buckets")
    }
  }

  test("bucketed path is result-identical to the merge path on mixed edge cases") {
    // covers: match in same bucket, match carried across empty buckets,
    // no match at all, inclusive equality, other-key isolation
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:05:00")),
      (1L, 11L, ts("2024-01-01 09:00:00")),
      (1L, 12L, ts("2024-01-01 08:00:00")),
      (1L, 13L, ts("2024-01-03 23:59:00")), // carry across many empty buckets
      (2L, 20L, ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 09:30:00"), 101L),
      (1L, ts("2024-01-01 10:01:00"), 102L),
      (2L, ts("2024-01-01 11:00:00"), 200L),
      (3L, ts("2024-01-01 00:00:00"), 300L)
    ).toDF("user_id", "ts", "click_id")
    val naive = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("ts", "click_id"))
      .orderBy("user_id", "event_id").collect().toSeq
    for (sec <- Seq(60L, 3600L, 86400L)) {
      val bucketed = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("ts", "click_id"),
          skewBucketSeconds = Some(sec))
        .orderBy("user_id", "event_id").collect().toSeq
      assert(bucketed == naive, s"bucket=$sec s")
    }
  }

  test("bucketed path equals merge path on seeded random data with nulls and duplicate timestamps") {
    val rnd = new scala.util.Random(20260813L)
    def randTs(): Timestamp =
      if (rnd.nextInt(20) == 0) null
      else new Timestamp(1700000000000L + rnd.nextInt(500000) * 1000L)
    val left = (0 until 400).map(i => (rnd.nextInt(8).toLong, i.toLong, randTs()))
      .toDF("user_id", "event_id", "ts")
    // duplicate right timestamps on purpose: nextInt(500) at 1s grain collides
    val right = (0 until 600).map(i =>
      (rnd.nextInt(8).toLong,
        if (rnd.nextInt(20) == 0) null
        else new Timestamp(1700000000000L + rnd.nextInt(500) * 1000L),
        i.toLong))
      .toDF("user_id", "ts", "click_id")
    val naive = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("ts", "click_id"))
      .orderBy("user_id", "event_id").collect().toSeq
    for (sec <- Seq(17L, 3600L, 1000000L)) {
      val bucketed = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("ts", "click_id"),
          skewBucketSeconds = Some(sec))
        .orderBy("user_id", "event_id").collect().toSeq
      assert(bucketed == naive, s"bucket=$sec s")
    }
  }

  test("bucketed path matches the merge path on a pathologically hot key (~1M right rows)") {
    import org.apache.spark.sql.functions._
    // ONE key owns a million right rows spread over ~11.5 days; 1000
    // left probes. The merge path serializes this key into a single
    // sorted partition; the bucketed path must split it and still agree.
    val right = spark.range(1000000).select(
      lit(7L).as("user_id"),
      (lit(1704067200L) + col("id")).cast("timestamp").as("ts"),
      col("id").as("click_id"))
    val left = spark.range(1000).select(
      lit(7L).as("user_id"),
      col("id").as("event_id"),
      (lit(1704067200L) + col("id") * 997 + 1).cast("timestamp").as("ts"))
    val naive = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("click_id"))
      .orderBy("event_id").select("asof_click_id").as[Long].collect().toSeq
    val bucketed = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("click_id"),
        skewBucketSeconds = Some(3600L))
      .orderBy("event_id").select("asof_click_id").as[Long].collect().toSeq
    assert(bucketed == naive)
    // spot-check the semantics themselves: probe at t0 + 997k + 1 sees
    // click_id = 997k (the most recent click at or before it)
    assert(naive.head == 1L && naive(3) == 3 * 997L + 1)
  }

  test("asOfWithTolerance masks stale matches, keeps fresh ones, leaves no-match null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // click at 09:30 -> 30 min old, fresh
      (1L, 11L, ts("2024-01-01 13:00:00")), // latest click 09:30 -> 3.5 h old, STALE
      (1L, 12L, ts("2024-01-01 08:00:00"))  // no click at or before -> null
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 09:30:00"), 101L)
    ).toDF("user_id", "ts", "click_id")
    val got = AsOfJoin.asOfWithTolerance(left, right, Seq("user_id"), "ts", "ts",
      rightPayload = Seq("ts", "click_id"), toleranceSeconds = 3600L)
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(10L -> Some(101L), 11L -> None, 12L -> None))
    // boundary is inclusive: exactly tolerance-old still matches
    val edge = AsOfJoin.asOfWithTolerance(
      Seq((1L, 1L, ts("2024-01-01 10:30:00"))).toDF("user_id", "event_id", "ts"),
      right, Seq("user_id"), "ts", "ts", Seq("ts", "click_id"), toleranceSeconds = 3600L)
      .select("asof_click_id").as[Option[Long]].collect()(0)
    assert(edge == Some(101L))
  }

  test("asOfWithTolerance rejects a payload without the right timestamp") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("user_id", "ts", "click_id")
    intercept[IllegalArgumentException](
      AsOfJoin.asOfWithTolerance(df, df, Seq("user_id"), "ts", "ts",
        rightPayload = Seq("click_id"), toleranceSeconds = 60L))
  }

  test("asOfNative: known picks, inclusive boundary, no-match null, key isolation") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 09:00:00")), // exactly at a click: inclusive
      (1L, 12L, ts("2024-01-01 08:00:00")), // before history: null
      (2L, 20L, ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L),
      (1L, ts("2024-01-01 09:30:00"), 101L),
      (2L, ts("2024-01-01 11:00:00"), 200L),
      (3L, ts("2024-01-01 00:00:00"), 300L)
    ).toDF("user_id", "ts", "click_id")
    val df = AsOfJoin.asOfNative(left, right, "user_id", "ts", "ts", Seq("click_id"))
    // the plan must actually run the custom physical operator
    assert(df.queryExecution.executedPlan.toString.contains("AsOfMergeJoin"))
    val got = df.select("event_id", "asof_click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(10L -> Some(101L), 11L -> Some(100L), 12L -> None, 20L -> Some(200L)))
  }

  test("asOfNative is result-identical to the composed asOf on random histories") {
    val rnd = new scala.util.Random(37)
    val base = ts("2024-01-01 00:00:00").getTime
    // distinct timestamps per side (the tie rule differs only on exact
    // duplicate (key, ts) right rows, documented)
    val lTs = rnd.shuffle((1 to 4000).toList).take(500)
    val rTs = rnd.shuffle((1 to 4000).toList).drop(1200).take(400)
    val left = lTs.zipWithIndex.map { case (t, i) =>
      (rnd.nextInt(8).toLong, i.toLong, new Timestamp(base + t * 1000L))
    }.toDF("user_id", "event_id", "ts")
    val right = rTs.zipWithIndex.map { case (t, i) =>
      (rnd.nextInt(10).toLong, new Timestamp(base + t * 1000L), i.toLong, rnd.nextDouble())
    }.toDF("user_id", "ts", "click_id", "value")
    val native = AsOfJoin.asOfNative(left, right, "user_id", "ts", "ts",
      Seq("ts", "click_id", "value"))
      .select("user_id", "event_id", "asof_ts", "asof_click_id", "asof_value")
      .as[(Long, Long, Option[Timestamp], Option[Long], Option[Double])]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    val composed = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts",
      Seq("ts", "click_id", "value"))
      .select("user_id", "event_id", "asof_ts", "asof_click_id", "asof_value")
      .as[(Long, Long, Option[Timestamp], Option[Long], Option[Double])]
      .collect().sortBy(t => (t._1, t._2)).toSeq
    assert(native == composed)
    assert(native.exists(_._3.isEmpty) && native.exists(_._3.nonEmpty),
      "fixture must exercise both match and no-match rows")
  }

  test("asOfNative: null left ts gets a null payload; null right ts never matches") {
    val left = Seq(
      (1L, 1L, Option(ts("2024-01-01 10:00:00"))),
      (1L, 2L, Option.empty[Timestamp])
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, Option(ts("2024-01-01 09:00:00")), 100L),
      (1L, Option.empty[Timestamp], 999L)
    ).toDF("user_id", "ts", "click_id")
    val got = AsOfJoin.asOfNative(left, right, "user_id", "ts", "ts", Seq("click_id"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(100L), 2L -> None))
  }
}
