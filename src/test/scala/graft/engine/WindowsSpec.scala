package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling is ROWS-based (physical rows, not calendar range)") {
    // gap in dates: row-frame of 2 preceding still spans the gap
    val df = Seq(("A", d("2020-01-01"), 10.0), ("A", d("2020-01-02"), 5.0),
      ("A", d("2020-03-01"), 8.0), ("A", d("2020-03-02"), 1.0))
      .toDF("sym", "dt", "low")
    val out = Windows.rolling(df, Seq($"sym"), Seq($"dt"), precedingRows = 2,
      "roll_min" -> min($"low")).orderBy("dt")
      .select("roll_min").as[Double].collect()
    // row 3 (2020-03-02): frame = rows {01-02, 03-01, 03-02} -> min 1.0;
    // row 2 (2020-03-01): frame = {01-01, 01-02, 03-01} -> 5.0 (calendar
    // range would have excluded the January rows)
    out shouldBe Array(10.0, 5.0, 5.0, 1.0)
  }

  test("trailingSumExclusive excludes current row") {
    val df = Seq(("C", 1, 1.0), ("C", 2, 2.0), ("C", 3, 4.0), ("C", 4, 8.0),
      ("C", 5, 16.0), ("C", 6, 32.0)).toDF("cid", "q", "eps")
    val out = Windows.trailingSumExclusive(df, Seq($"cid"), Seq($"q"),
      $"eps", preceding = 4, as = "sum_prior_4")
      .orderBy("q").select("sum_prior_4").as[Double].collect()
    out shouldBe Array(0.0, 1.0, 3.0, 7.0, 15.0, 30.0)
  }

  test("gapFill carries last non-null forward within partition") {
    val df = Seq(
      (1L, 1, "addr1", "em1"), (1L, 2, null, "em2"), (1L, 3, null, null),
      (2L, 1, null, "x")).toDF("cust", "seq", "addr", "email")
    val out = Windows.gapFill(df, Seq($"cust"), Seq($"seq"), Seq("addr", "email"))
      .orderBy("cust", "seq").select("addr", "email").collect()
    out.map(r => (r.getString(0), r.getString(1))) shouldBe Array(
      ("addr1", "em1"), ("addr1", "em2"), ("addr1", "em2"), (null, "x"))
  }

  test("overPartition computes whole-partition min/max regardless of order") {
    val df = Seq((7L, ts("2020-01-03 00:00:00")), (7L, ts("2020-01-01 00:00:00")),
      (7L, ts("2020-01-02 00:00:00"))).toDF("trade_id", "h_ts")
    val out = Windows.overPartition(df, Seq($"trade_id"),
      "create_ts" -> min($"h_ts"), "close_ts" -> max($"h_ts"))
      .select("create_ts", "close_ts").distinct().collect()
    out.length shouldBe 1
    out(0).getTimestamp(0) shouldBe ts("2020-01-01 00:00:00")
    out(0).getTimestamp(1) shouldBe ts("2020-01-03 00:00:00")
  }
}
