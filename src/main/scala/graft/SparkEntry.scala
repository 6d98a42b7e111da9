package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def allDefs: Seq[QueryDef] = RelationalQueries.defs ++ OpsQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * A gold-fact-style star query (fact_trade shape,
    * reference models/gold/fact_trade.sql): SCD2 dim from the purchase
    * event log, temporal join of click facts against it, surrogate keys,
    * and a final aggregate.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val dim = RelationalQueries.purchaseDim(spark, dir).select(
      col("user_id").as("d_user_id"), col("event_id").as("purchase_id"),
      col("effective_timestamp"), col("end_timestamp"))
    val fact = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    TemporalJoin.temporalJoin(fact, broadcast(dim),
        fact("user_id"), dim("d_user_id"), fact("ts"))
      .select(col("user_id"),
        Keys.surrogateKey(col("click_id"), col("purchase_id")).as("sk"))
      .groupBy("user_id").agg(count(col("sk")).as("n_attributed_clicks"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
