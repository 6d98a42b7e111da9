package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 kernel: turn an append-only change log into versioned dimension
  * rows with `effective_timestamp` / `end_timestamp` / `is_current`.
  *
  * Semantics from the reference's canonical instance
  * (models/silver/accounts.sql:35-57, repeated in companies/customers/
  * securities/financials/trades_history): `lag(ts)` over a DESC sort is
  * the *next* change chronologically, minus 1 millisecond; open rows get
  * the year-9999 sentinel; `is_current` = row_number()==1 over the same
  * DESC window (one shuffle total — both window functions share the spec,
  * so Catalyst plans a single Window exchange).
  */
object Scd2 {
  val SentinelEnd = "9999-12-31 23:59:59.999"

  /** Adds effective_timestamp / end_timestamp / is_current.
    *
    * @param idCols   entity identity (SCD2 partition)
    * @param tsCol    change timestamp
    * @param tieBreak extra DESC sort columns for deterministic ordering
    *                 when two changes share a timestamp (SURVEY §7.4.3)
    */
  def scd2(df: DataFrame, idCols: Seq[String], tsCol: String,
           tieBreak: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = (tsCol +: tieBreak).map(col(_).desc)
    val w = Window.partitionBy(idCols.map(col): _*).orderBy(ord: _*)
    df.withColumn("effective_timestamp", col(tsCol))
      .withColumn("__next_ts", lag(col(tsCol), 1).over(w))
      .withColumn("end_timestamp",
        coalesce(
          expr("__next_ts - INTERVAL '0.001' SECOND"),
          lit(SentinelEnd).cast("timestamp")))
      .withColumn("is_current", row_number().over(w) === 1)
      .drop("__next_ts")
  }
}
