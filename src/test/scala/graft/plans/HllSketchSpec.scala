package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite

class HllSketchSpec extends SparkSuite {
  import spark.implicits._

  graft.plans.GraftExtensions.register(spark)

  /** The engine's portable 56-bit coin of a string value. */
  private def coin56(v: String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(v).substring(0, 14), 16)

  /** Reference register computation, straight off the definition. */
  private def refRegisters(values: Seq[String], p: Int): Seq[Int] = {
    val m = 1 << p
    val wBits = 56 - p
    val regs = new Array[Int](m)
    values.foreach { v =>
      val c = coin56(v)
      val j = (c >>> wBits).toInt & (m - 1)
      val w = c & ((1L << wBits) - 1)
      val rho = wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(j)) regs(j) = rho
    }
    regs.toSeq
  }

  private def sketch(df: org.apache.spark.sql.DataFrame, p: Int): Seq[Int] =
    df.select(conv(substring(md5(col("v")), 1, 14), 16, 10).cast("long").as("coin"))
      .agg(call_function("hll_registers", col("coin"), lit(p)).as("regs"))
      .as[Seq[Int]].head()

  test("hll_registers matches the definitional register computation") {
    val values = (0 until 3000).map(i => s"item-${i % 1100}")
    assert(sketch(values.toDF("v"), 8) == refRegisters(values, 8))
  }

  test("registers are invariant under partitioning (max per register is order-free)") {
    val values = (0 until 4000).map(i => s"u-${i % 900}")
    def run(parts: Int): Seq[Int] = sketch(values.toDF("v").repartition(parts), 8)
    assert(run(1) == run(5))
    assert(run(5) == run(32))
  }

  test("merging per-group sketches by elementwise max equals the global sketch") {
    val df = (0 until 5000).map(i => (s"g${i % 4}", s"val-${i % 1300}")).toDF("g", "v")
      .withColumn("coin", conv(substring(md5(col("v")), 1, 14), 16, 10).cast("long"))
    val per = df.groupBy(col("g"))
      .agg(call_function("hll_registers", col("coin"), lit(8)).as("regs"))
    val merged = per.select(posexplode(col("regs")).as(Seq("j", "r")))
      .groupBy(col("j")).agg(max(col("r")).as("r"))
      .orderBy(col("j")).as[(Int, Int)].collect().map(_._2).toSeq
    val global = df
      .agg(call_function("hll_registers", col("coin"), lit(8)).as("regs"))
      .as[Seq[Int]].head()
    assert(merged == global)
  }

  test("the p=8 estimate lands inside the HLL error envelope on a 10k-distinct stream") {
    val values = (0 until 30000).map(i => s"card-${i % 10000}")
    val est = values.toDF("v")
      .select(conv(substring(md5(col("v")), 1, 14), 16, 10).cast("long").as("coin"))
      .agg(call_function("hll_registers", col("coin"), lit(8)).as("regs"))
      .select(HllRegisters.sumScaled(col("regs"), 8).as("s"))
      .select(HllRegisters.estimateQ10(col("s"), 8).as("e"))
      .as[Long].head().toDouble / 1024.0
    // sigma = 1.04/sqrt(256) ~ 6.5%; 4 sigma on a FIXED stream is a
    // deterministic bound, not a statistical assertion
    val relErr = math.abs(est - 10000.0) / 10000.0
    assert(relErr < 0.26, s"est $est (relErr $relErr)")
  }
}
