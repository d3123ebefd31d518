package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  // a pathologically hot key: 90% of fact rows share user 1
  private lazy val fact = ((1 to 90).map(i => (i.toLong, 1L)) ++
    (91 to 100).map(i => (i.toLong, (i % 5 + 2).toLong)))
    .toDF("event_id", "user_id")
  private lazy val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
    (5L, "d"), (6L, "e")).toDF("user_id", "tag")

  test("saltedJoin equals the plain inner join") {
    val plain = fact.join(dim, "user_id")
      .select("event_id", "user_id", "tag").as[(Long, Long, String)].collect().sorted
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("user_id"), col("event_id"), 8)
      .select("event_id", "user_id", "tag").as[(Long, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 100)
  }

  test("salting spreads the hot key over multiple buckets") {
    val buckets = fact
      .withColumn("_salt", pmod(hash(col("event_id")), lit(8)))
      .where(col("user_id") === 1L)
      .select(col("_salt")).distinct().count()
    assert(buckets > 4, s"hot key landed in only $buckets of 8 salt buckets")
  }

  test("factor 1 degenerates to the plain join; unmatched fact keys drop") {
    val withOrphan = fact.union(Seq((999L, 42L)).toDF("event_id", "user_id"))
    val out = SkewJoin.saltedJoin(withOrphan, dim, Seq("user_id"), col("event_id"), 1)
    assert(out.count() == 100) // orphan user 42 has no dim row
    assert(!out.columns.contains("_salt"))
  }

  test("autoJoin picks broadcast under the budget, salted above it, same result set") {
    def results(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "tag").as[(Long, Long, String)].collect().sorted.toSeq
    val want = results(fact.join(dim, "user_id"))

    val bhj = SkewJoin.autoJoin(fact, dim, Seq("user_id"))
    bhj.collect()
    assert(bhj.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "small dim under the default budget must broadcast")
    assert(results(bhj) == want)

    val salted = SkewJoin.autoJoin(fact, dim, Seq("user_id"),
      broadcastBytes = 0L, skew = Some((col("event_id"), 8)))
    assert(results(salted) == want)

    val plain = SkewJoin.autoJoin(fact, dim, Seq("user_id"), broadcastBytes = 0L)
    assert(results(plain) == want)
  }
}
