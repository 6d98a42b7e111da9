package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window kernels beyond SCD2 (SURVEY §2.5 W3-W7). */
object Windows {

  /** W3: rolling trading-window min/max — ROWS-based (364 preceding
    * physical rows, NOT calendar days), replicating
    * models/silver/daily_market.sql:4-14 exactly. One Window exchange for
    * all aggregates (shared spec).
    */
  def rolling(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column],
              precedingRows: Int, aggs: (String, Column)*): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(-precedingRows.toLong, 0L)
    aggs.foldLeft(df) { case (d, (name, agg)) => d.withColumn(name, agg.over(w)) }
  }

  /** W5: trailing-N sum excluding the current row
    * (models/work/wrk_company_financials.sql:5-9:
    * `sum(x) over (rows between 4 preceding and current row) - x`).
    */
  def trailingSumExclusive(df: DataFrame, partitionCols: Seq[Column],
                           orderCols: Seq[Column], value: Column,
                           preceding: Int, as: String): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(-preceding.toLong, 0L)
    df.withColumn(as, sum(value).over(w) - value)
  }

  /** W6: gap-fill — carry the last non-null value forward
    * (models/gold/dim_customer.sql:14-80:
    * `coalesce(last_value(col IGNORE NULLS) over (...))`).
    *
    * The frame is EXPLICIT rows unbounded-preceding..current: Snowflake's
    * implicit frame with ORDER BY is RANGE..CURRENT ROW which differs on
    * ties, and Spark's `last(col, ignoreNulls=true)` default frame would
    * too (SURVEY §7.4.2) — so callers must pass a total order.
    */
  def gapFill(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column],
              cols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** W4: whole-partition min/max (no orderBy => unbounded frame), as in
    * models/silver/trades.sql:16-17.
    */
  def overPartition(df: DataFrame, partitionCols: Seq[Column],
                    aggs: (String, Column)*): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*)
    aggs.foldLeft(df) { case (d, (name, agg)) => d.withColumn(name, agg.over(w)) }
  }
}
