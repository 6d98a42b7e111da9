package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window kernels beyond SCD2 (SURVEY §2.5 W3-W7). */
object Windows {

  /** A value-constant, NON-FOLDABLE partition key for windows whose
    * frame is single-partition BY CONSTRUCTION (bounded subtotal /
    * sample relations). `partitionBy(lit(0))` does not work: the
    * optimizer constant-folds the literal out of the partitionSpec,
    * leaving it empty, and WindowExec then logs its
    * all-rows-to-one-partition performance warning on every execution.
    * `pmod(hash(anchor), 1)` evaluates to 0 for every row but
    * references a real column and survives expression simplification
    * (`hash(x) * 0` does not — the multiply-by-zero folds), so the
    * spec stays non-empty. Use ONLY where the scaladoc of the call
    * site documents why the frame is bounded.
    */
  def singlePartitionKey(anchor: Column): Column = pmod(hash(anchor), lit(1))

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
