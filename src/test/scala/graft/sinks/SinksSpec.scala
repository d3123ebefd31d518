package graft.sinks

import scala.collection.mutable

import graft.SparkSuite

object SinksSpec {
  // local-mode executors share the JVM, so a synchronized buffer captures
  // the per-partition statements the transport would POST
  val captured: mutable.Buffer[String] = mutable.Buffer.empty[String]
  def capture(sql: String): Unit = captured.synchronized { captured += sql }
}

class SinksSpec extends SparkSuite {
  import spark.implicits._

  test("ClickHouseBatchSink: JSONEachRow batches per partition, null dates omitted (P11)") {
    SinksSpec.captured.clear()
    val df = Seq(
      ("K-1", Some("2024-01-09"), 1),
      ("K-2", None, 2),
      ("K-3", None, 3)).toDF("issue_key", "deadline", "n").coalesce(1)
    new ClickHouseBatchSink(SinksSpec.capture, database = "agile", batchSize = 2)
      .write(df, "issues")
    val stmts = SinksSpec.captured.toList
    assert(stmts.size == 2) // 3 rows, batchSize 2, one partition
    assert(stmts.forall(_.startsWith("INSERT INTO agile.issues FORMAT JSONEachRow ")))
    val payload = stmts.mkString(" ")
    assert(payload.contains(""""deadline":"2024-01-09""""))
    // fix_null_dates semantics: null fields are absent, CH DEFAULT applies
    assert(!payload.contains(""""deadline":null"""))
    assert(payload.contains(""""issue_key":"K-2""""))
  }

  test("ClickHouseClient executes raw SQL with retry and issues OPTIMIZE FINAL") {
    val seen = mutable.Buffer.empty[String]
    var failures = 1
    val client = new ClickHouseClient({ sql =>
      if (failures > 0) { failures -= 1; throw new RuntimeException("transient") }
      seen += sql; "ok"
    }, baseDelayMs = 1)
    assert(client.deduplicate("agile", "issues") == "ok")
    assert(seen == Seq("OPTIMIZE TABLE agile.issues FINAL"))
  }

  test("Retry.withBackoff does not retry fatal errors or swallow interrupts") {
    var calls = 0
    intercept[OutOfMemoryError] {
      Retry.withBackoff(tries = 3, baseDelayMs = 1) { calls += 1; throw new OutOfMemoryError("boom") }
    }
    assert(calls == 1) // fatal: no retry, no backoff sleep
    var calls2 = 0
    intercept[InterruptedException] {
      Retry.withBackoff(tries = 3, baseDelayMs = 1) { calls2 += 1; throw new InterruptedException("killed") }
    }
    assert(calls2 == 1)
    assert(Thread.interrupted()) // interrupt flag restored (and cleared here)
  }

  test("Retry.withBackoff retries then succeeds / exhausts") {
    var calls = 0
    val r = Retry.withBackoff(tries = 3, baseDelayMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(r == "ok" && calls == 3)
    var calls2 = 0
    intercept[RuntimeException] {
      Retry.withBackoff(tries = 2, baseDelayMs = 1) { calls2 += 1; throw new RuntimeException("always") }
    }
    assert(calls2 == 2)
  }

  test("BucketedTableSink: joins between co-bucketed tables plan ZERO exchanges") {
    import spark.implicits._
    val issues = (0 until 200).map(i => (s"K-$i", s"queue${i % 5}", i.toLong))
      .toDF("issue_key", "queue", "version")
    val metrics = (0 until 200).flatMap(i =>
      Seq("open", "closed").map(st => (s"K-$i", st, i * 10L)))
      .toDF("issue_key", "status", "duration")
    val sink = new BucketedTableSink(buckets = 8, keys = Seq("issue_key"))
    sink.write(issues, "sink_spec_issues")
    sink.write(metrics, "sink_spec_metrics")
    // tables this small take the broadcast path (which ignores
    // bucketing); disable it so the plan is the sort-merge join a
    // 100 TB issues⋈metrics would use — THAT is the exchange-free claim
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.table("sink_spec_issues")
      val b = spark.table("sink_spec_metrics")
      val joined = a.join(b, Seq("issue_key"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 400)
      // the dedup readback (A4 latest-version) also rides the bucketing:
      // its aggregate needs no exchange either
      val dedup = graft.operators.Dedup.latestByKey(a, Seq("issue_key"), Seq("version"))
      assert(!dedup.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
      assert(dedup.count() == 200)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS sink_spec_issues")
      spark.sql("DROP TABLE IF EXISTS sink_spec_metrics")
    }
  }
}
