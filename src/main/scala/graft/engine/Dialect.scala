package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Helpers for Snowflake-dialect constructs with no direct Spark syntax
  * (SURVEY §4 tail): QUALIFY, GROUP BY ALL, decode, datetime format-token
  * translation, try_cast.
  */
object Dialect {

  /** Snowflake `decode(x, k1,v1, k2,v2, ..., [default])`
    * (models/silver/accounts.sql:3-7). Null-safe equality like decode:
    * decode(x, NULL, v) matches null.
    */
  def decode(x: Column, pairs: Seq[(Column, Column)],
             default: Column = lit(null)): Column =
    pairs.foldRight(default) { case ((k, v), acc) => when(x <=> k, v).otherwise(acc) }

  /** QUALIFY row_number() OVER (...) <= n  (models/silver/daily_market.sql:36-40).
    * Spark has no QUALIFY; rewrite as window + filter + drop.
    */
  def qualifyRowNumber(df: DataFrame, partitionCols: Seq[Column],
                       orderCols: Seq[Column], n: Int = 1): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)))
      .filter(col("__rn") <= n)
      .drop("__rn")

  /** GROUP BY ALL (models/gold/fact_cash_balances.sql:5-12): group by every
    * non-aggregate output column. Caller passes the aggregates; everything
    * else in the frame's column list becomes a key.
    */
  def groupByAll(df: DataFrame, aggs: Seq[Column], aggNames: Set[String]): DataFrame = {
    val keys = df.columns.filterNot(aggNames.contains).map(col).toSeq
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Snowflake -> Java datetime format-token translation (SURVEY §7.4.1).
    * A literal copy of e.g. `yyyy-mm-ddThh:mi:ss` (tpcdi.py:293) would
    * silently parse months as minutes in Spark.
    */
  def snowflakeFormat(fmt: String): String = {
    // Longest-match token rewrite; Snowflake tokens are case-insensitive,
    // we accept the lowercase forms the reference uses.
    val tokens = Seq(
      "yyyy" -> "yyyy", "mi" -> "mm", "mm" -> "MM", "mon" -> "MMM",
      "dd" -> "dd", "hh24" -> "HH", "hh12" -> "hh", "hh" -> "HH",
      "ss" -> "ss", "ff3" -> "SSS", "am" -> "a", "pm" -> "a", "T" -> "'T'")
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      tokens.find { case (s, _) => fmt.regionMatches(i, s, 0, s.length) } match {
        case Some((s, j)) => sb.append(j); i += s.length
        case None         => sb.append(fmt.charAt(i)); i += 1
      }
    }
    sb.toString
  }

  /** Parse with a Snowflake-style format string. */
  def toTimestampSf(c: Column, sfFmt: String): Column =
    to_timestamp(c, snowflakeFormat(sfFmt))

  def toDateSf(c: Column, sfFmt: String): Column =
    to_date(c, snowflakeFormat(sfFmt))

  /** try_cast-to-DATE with an explicit format (Snowflake's try_cast DATE
    * parses 'yyyymmdd' via its AUTO input format; Spark's cast doesn't, so
    * route through try_to_timestamp which nulls on mismatch).
    */
  def tryToDateSf(c: Column, sfFmt: String): Column =
    try_to_timestamp(c, lit(snowflakeFormat(sfFmt))).cast("date")

  /** Snowflake try_to_number / try_cast (tpcdi.py:299, finwire_financial.sql:5):
    * null on conversion failure instead of ANSI error.
    */
  def tryCast(c: Column, to: String): Column = c.try_cast(to)

  /** timestampadd('millisecond', -1, ts) (models/silver/accounts.sql:37-39). */
  def minusMillis(c: Column, ms: Int): Column =
    c - make_interval(secs = lit(BigDecimal(ms) / 1000))

  private def make_interval(secs: Column): Column =
    org.apache.spark.sql.functions.make_interval(
      lit(0), lit(0), lit(0), lit(0), lit(0), lit(0), secs)
}
