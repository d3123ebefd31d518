package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("mortonCode interleaves bits (known values, symmetry, monotone blocks)") {
    def m(a: Long, b: Long): Long = graft.plans.MortonCode.interleave(a, b, 16)
    assert(m(0, 0) == 0L)
    assert(m(1, 0) == 1L)   // a on even bit positions
    assert(m(0, 1) == 2L)   // b on odd
    assert(m(3, 0) == 5L)   // 0b11 -> 0b101
    assert(m(0, 3) == 10L)  // 0b11 -> 0b1010
    assert(m(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
    // column form agrees with the static form
    val got = Seq((5L, 9L)).toDF("a", "b")
      .select(Layout.mortonCode(col("a"), col("b"), 16)).as[Long].head()
    assert(got == m(5, 9))
  }

  test("hilbertCode walks every cell exactly once with unit steps (the locality Z-order lacks)") {
    def h(a: Long, b: Long): Long = graft.plans.HilbertCode.encode(a, b, 4)
    // pinned values (independently computed)
    assert(h(0, 0) == 0L)
    assert(h(7, 2) == 25L)
    assert(graft.plans.HilbertCode.encode(65535, 65535, 16) == 2863311530L)
    // bijection + Manhattan-adjacency over the full order-4 grid
    val byCode = (for (x <- 0L until 16L; y <- 0L until 16L) yield h(x, y) -> ((x, y))).toMap
    assert(byCode.size == 256, "not a bijection")
    val jumps = (0L until 255L).count { d =>
      val (x1, y1) = byCode(d); val (x2, y2) = byCode(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(jumps == 0, s"$jumps non-adjacent Hilbert steps")
    // ...and Morton provably jumps at quadrant seams on the same grid
    val mByCode = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield graft.plans.MortonCode.interleave(x, y, 4) -> ((x, y))).toMap
    val mortonJumps = (0L until 255L).count { d =>
      val (x1, y1) = mByCode(d); val (x2, y2) = mByCode(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(mortonJumps > 0, "expected Z-curve seam jumps")
    // column form agrees with the static form
    val got = Seq((298L, 40000L)).toDF("a", "b")
      .select(Layout.hilbertCode(col("a"), col("b"), 16)).as[Long].head()
    assert(got == graft.plans.HilbertCode.encode(298, 40000, 16))
  }

  test("z-order layout prunes on BOTH dimensions where a single-column sort prunes on one") {
    val rnd = new scala.util.Random(53)
    val rows = (0 until 4000).map(_ => (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .toDF("a", "b")
    val tmp = Files.createTempDirectory("graft-layout")
    val aDir = tmp.resolve("asort").toString
    val zDir = tmp.resolve("zorder").toString
    rows.repartitionByRange(8, col("a")).sortWithinPartitions(col("a"))
      .write.parquet(aDir)
    Layout.zorderLayout(rows, "a", "b", bits = 8, numFiles = 8)
      .write.parquet(zDir)

    val aRanges = Layout.fileRanges(spark, aDir, Seq("a", "b"))
    val zRanges = Layout.fileRanges(spark, zDir, Seq("a", "b"))

    // predicate on the SECOND dimension: b in [0, 31]
    val aPruneB = Layout.prunableFraction(aRanges, "b", 0, 31)
    val zPruneB = Layout.prunableFraction(zRanges, "b", 0, 31)
    // the a-sorted layout cannot skip anything for a b predicate;
    // the z-order layout skips a substantial fraction
    assert(aPruneB == 0.0, s"a-sorted layout unexpectedly prunable on b: $aPruneB")
    assert(zPruneB >= 0.3, s"z-order layout should prune on b, got $zPruneB")

    // predicate on the FIRST dimension: z-order still prunes there too
    val zPruneA = Layout.prunableFraction(zRanges, "a", 0, 31)
    assert(zPruneA >= 0.3, s"z-order layout should prune on a, got $zPruneA")
    // (the a-sorted layout is near-perfect on a, as expected)
    assert(Layout.prunableFraction(aRanges, "a", 0, 31) >= 0.5)
  }

  test("compact rewrites a small-files directory to the size-targeted file count") {
    val rows = (0 until 4000).map(i => (i.toLong, s"payload_$i")).toDF("id", "payload")
    val tmp = Files.createTempDirectory("graft-compact")
    val smallDir = tmp.resolve("small").toString
    val outDir = tmp.resolve("compacted").toString
    rows.repartition(64).write.parquet(smallDir)

    def parquetFiles(dir: String) =
      Files.list(java.nio.file.Paths.get(dir)).filter(_.toString.endsWith(".parquet")).count()
    assert(parquetFiles(smallDir) == 64)
    val totalBytes = Files.list(java.nio.file.Paths.get(smallDir))
      .filter(_.toString.endsWith(".parquet"))
      .mapToLong(p => java.nio.file.Files.size(p)).sum()

    // target a quarter of the actual bytes -> exactly 4 output files
    val n = Layout.compact(spark, smallDir, outDir, targetBytes = (totalBytes + 3) / 4)
    assert(n == 4, s"expected 4 target files, got $n")
    assert(parquetFiles(outDir) == 4)
    // content survives the rewrite
    val got = spark.read.parquet(outDir).as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == (0 until 4000).map(i => (i.toLong, s"payload_$i")))
  }

  test("zonemapSkipAudit: a-sort prunes only a, z-order prunes both, ingest neither") {
    // 16x16 (a, b) grid; arrival order is the bijective shuffle
    // i -> (i*101) mod 256, so "ingest" files mix grid cells
    val rows = (0 until 256).map { i =>
      val id = (i * 101) % 256 // grid cell visited at arrival i
      (i.toLong, (id % 16).toLong, (id / 16).toLong)
    }
    val df = rows.toDF("arrival", "a", "b")
      .withColumn("z", Layout.mortonCode(col("a"), col("b"), 4))
    val out = Layout.zonemapSkipAudit(df, "a", "b",
      Seq(
        "ingest" -> Seq(col("arrival")),
        "sort_a" -> Seq(col("a"), col("arrival")),
        "zorder" -> Seq(col("z"), col("arrival"))),
      numFiles = 16,
      boxes = Seq(("a_slice", 0L, 0L, 0L, 15L), ("b_slice", 0L, 15L, 0L, 0L)))
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    // a-sorted: a=0 lives in exactly one of 16 files; b spans everywhere
    assert(out(("sort_a", "a_slice")) == 15.0 / 16.0)
    assert(out(("sort_a", "b_slice")) == 0.0)
    // z-order files are 4x4 quadrant tiles: each 1-wide slice hits the
    // 4 tiles of its row/column strip -> 12/16 skipped on BOTH dims
    assert(out(("zorder", "a_slice")) == 12.0 / 16.0)
    assert(out(("zorder", "b_slice")) == 12.0 / 16.0)
    // shuffled arrival smears both dimensions across files: strictly
    // worse than the curve on both probes
    assert(out(("ingest", "a_slice")) < out(("zorder", "a_slice")))
    assert(out(("ingest", "b_slice")) < out(("zorder", "b_slice")))
  }
}
