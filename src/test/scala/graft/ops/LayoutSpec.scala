package graft.ops

import graft.SparkSpec
import graft.functions.ZValue
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave puts x on odd bits, y on even bits") {
    ZValue.interleave(0L, 0L, 8) shouldBe 0L
    ZValue.interleave(1L, 0L, 8) shouldBe 2L
    ZValue.interleave(0L, 1L, 8) shouldBe 1L
    ZValue.interleave(3L, 0L, 8) shouldBe 10L  // x=0b11 -> z=0b1010
    ZValue.interleave(0L, 3L, 8) shouldBe 5L   // y=0b11 -> z=0b0101
    ZValue.interleave(255L, 255L, 8) shouldBe 65535L
  }

  test("column expression matches the reference loop") {
    val df = (0L until 512L).map(i => (i % 32, i / 32)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      ZValue.zValue(col("x"), col("y"), 6).as("z")).collect()
    got.foreach { r =>
      r.getLong(2) shouldBe ZValue.interleave(r.getLong(0), r.getLong(1), 6)
    }
  }

  test("zorder layout shrinks per-partition spans on BOTH dimensions") {
    // 64x64 grid, shuffled arrival order
    val grid = scala.util.Random.shuffle(
      (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)).toList)
      .toDF("x", "y")
    val zed = Layout.zorderLayout(grid, "x", "y", bits = 6, numPartitions = 16)
    val spans = Layout.localityReport(zed, "x", "y")
      .agg(avg("x_span"), avg("y_span")).first()
    // random layout would span ~63 on both; Z-order 16 partitions of a
    // 64x64 grid cover 16x16 tiles (span 15) per curve segment
    spans.getDouble(0) should be <= 24.0
    spans.getDouble(1) should be <= 24.0
  }

  test("z-order write prunes parquet reads under a 2-D range predicate") {
    // The p10 payoff, measured: the same box predicate over the same
    // rows reads far fewer rows from a Z-ordered write than from an
    // unsorted one, because each Z-ordered file covers a small (x, y)
    // rectangle and parquet footer/page stats exclude it wholesale.
    // File listing can't show this (stat pruning happens inside the
    // reader, not at planning), so assert on the scan node's
    // numOutputRows metric: rows in skipped row groups are never
    // emitted.
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val n = 64
    val rng = new scala.util.Random(7)
    val grid = rng.shuffle(
      (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)).toList)
      .toDF("x", "y")
    Layout.zorderWrite(grid, s"$dir/zed", "x", "y", bits = 6, numPartitions = 16)
    grid.repartition(16).write.mode("overwrite").parquet(s"$dir/flat")

    def scannedRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter($"x" >= 8 && $"x" < 16 && $"y" >= 8 && $"y" < 16)
      q.collect().length shouldBe 64 // same answer either way
      val scans = q.queryExecution.executedPlan.collectLeaves()
      scans should have size 1
      scans.head.metrics("numOutputRows").value
    }

    val flatRows = scannedRows(s"$dir/flat")
    val zedRows = scannedRows(s"$dir/zed")
    // unsorted files each span the whole domain: nothing prunes
    flatRows shouldBe (n.toLong * n)
    // Z-order: the 8x8 query box intersects a handful of 16x16 curve
    // tiles; most of the 16 files never produce a row
    zedRows should be < flatRows / 4
  }

  test("layout is a permutation: no rows lost or duplicated") {
    val df = (1L to 1000L).map(i => (i % 97, i % 89)).toDF("x", "y")
    val out = Layout.zorderLayout(df, "x", "y", bits = 7, numPartitions = 4)
    out.count() shouldBe 1000L
    out.columns shouldBe df.columns
    val a = out.groupBy("x", "y").agg(count(lit(1)).as("ca"))
    val b = df.groupBy("x", "y").agg(count(lit(1)).as("cb"))
    a.join(b, Seq("x", "y"), "full")
      .filter($"ca".isNull || $"cb".isNull || $"ca" =!= $"cb")
      .count() shouldBe 0L
  }
}
