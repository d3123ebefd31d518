package graft

/** Contract guards for the driver-facing registry — the failure mode that
  * zeroed rounds 1–2 was an empty/mismatched registry, so these are
  * load-bearing assertions, not formalities.
  */
class SparkEntrySpec extends SparkSuite {

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("the registry is populated and oracle coverage is near-total") {
    assert(SparkEntry.queries.size >= 40)
    val uncovered = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // EVERY query is oracle-covered: ann_lsh regenerates its LCG
    // hyperplanes in SQL, ann_ivf replays the java.util.Random centroid
    // draws + Lloyd iterations in SQL
    assert(uncovered == Set.empty[String], s"unexpected rows-only queries: $uncovered")
  }

  test("entry() flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows on sf0.001 — with codegen fallback disabled") {
    // Every query must return rows — dedup_embedding included, since it
    // now plants deterministic near-dup copies inside its lineage.
    // fallback=false makes ANY silent interpreted-fallback (a codegen
    // compile error in a native kernel inside any of the plans) throw
    // instead of quietly degrading.
    val saved = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val failures = SparkEntry.queries.flatMap { case (name, fn) =>
        try {
          val n = fn(spark, "/root/testdata/sf0.001").count()
          if (n > 0) None else Some(s"$name: 0 rows")
        } catch { case e: Throwable => Some(s"$name: ${String.valueOf(e.getMessage).take(100)}") }
      }
      assert(failures.isEmpty, failures.mkString("; "))
    } finally spark.conf.set("spark.sql.codegen.fallback", saved)
  }
}
