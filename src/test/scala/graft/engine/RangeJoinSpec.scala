package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join: must equal the naive BETWEEN join on every bin
  * width, and must never plan a nested-loop/cartesian join.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val facts = (0 until 200).map(i =>
    (i.toLong, ts(f"2020-03-01 ${i % 24}%02d:${i % 60}%02d:30")))
    .toDF("fid", "fts")
  // overlapping, irregular intervals — some spanning many bins, some none
  private val dims = Seq(
    (1L, ts("2020-03-01 00:00:00"), ts("2020-03-01 02:59:59")),
    (2L, ts("2020-03-01 02:30:00"), ts("2020-03-01 02:45:00")),
    (3L, ts("2020-03-01 10:00:00"), ts("2020-03-01 23:59:59")),
    (4L, ts("2020-03-02 00:00:00"), ts("2020-03-02 01:00:00")) // matches none
  ).toDF("did", "w_start", "w_end")

  private def naive =
    facts.join(dims, $"fts".between($"w_start", $"w_end"))
      .select("fid", "did")

  test("binned join equals the naive BETWEEN join across bin widths") {
    for (bw <- Seq(60L, 3600L, 86400L)) {
      val got = RangeJoin.binnedRangeJoin(facts, dims,
        "fts", "w_start", "w_end", bw).select("fid", "did")
      got.except(naive).count() shouldBe 0
      naive.except(got).count() shouldBe 0
    }
  }

  test("plan is a hash join on the bin — no BNLJ, no cartesian") {
    val plan = RangeJoin.binnedRangeJoin(facts, dims,
        "fts", "w_start", "w_end", 3600L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    (plan should include).regex("BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin")
  }

  test("shared column names are rejected") {
    val bad = dims.withColumnRenamed("did", "fid")
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.binnedRangeJoin(facts, bad, "fts", "w_start", "w_end", 60L)
  }
}
