package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.engine.Sources

/** Loader: declared schemas + readers for the 17 TPC-DI source tables
  * (the reference's Snowpark loader, tpcdi.py:192-535). Delimiter rule:
  * `.csv` => ',', else '|' (tpcdi.py:102-106). No inference anywhere.
  *
  * The reference stages files into Snowflake first (tpcdi.py:88-125);
  * Spark reads the filesystem (or object store) directly, so loading is
  * just a schema'd scan — at 100 TB these scans parallelize per-file
  * split with no loader bottleneck (the reference loader is explicitly
  * single-threaded, README.md:10).
  */
object Loader {

  private def s(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  // tpcdi.py:194-213
  val dateSchema: StructType = s(
    "sk_date_id" -> IntegerType, "date_value" -> DateType,
    "date_desc" -> StringType, "calendar_year_id" -> IntegerType,
    "calendar_year_desc" -> StringType, "calendar_qtr_id" -> IntegerType,
    "calendar_qtr_desc" -> StringType, "calendar_month_id" -> IntegerType,
    "calendar_month_desc" -> StringType, "calendar_week_id" -> IntegerType,
    "calendar_week_desc" -> StringType, "day_of_week_num" -> IntegerType,
    "day_of_week_desc" -> StringType, "fiscal_year_id" -> IntegerType,
    "fiscal_year_desc" -> StringType, "fiscal_qtr_id" -> IntegerType,
    "fiscal_qtr_desc" -> StringType, "holiday_flag" -> BooleanType)

  // tpcdi.py:218-225
  val dailyMarketSchema: StructType = s(
    "dm_date" -> DateType, "dm_s_symb" -> StringType,
    "dm_close" -> DoubleType, "dm_high" -> DoubleType,
    "dm_low" -> DoubleType, "dm_vol" -> DoubleType)

  // tpcdi.py:230-234
  val industrySchema: StructType = s(
    "in_id" -> StringType, "in_name" -> StringType, "in_sc_id" -> StringType)

  // tpcdi.py:239-262
  val prospectSchema: StructType = s(
    "agency_id" -> StringType, "last_name" -> StringType,
    "first_name" -> StringType, "middle_initial" -> StringType,
    "gender" -> StringType, "address_line1" -> StringType,
    "address_line2" -> StringType, "postal_code" -> StringType,
    "city" -> StringType, "state" -> StringType, "country" -> StringType,
    "phone" -> StringType, "income" -> IntegerType,
    "number_cars" -> IntegerType, "number_children" -> IntegerType,
    "marital_status" -> StringType, "age" -> IntegerType,
    "credit_rating" -> IntegerType, "own_or_rent_flag" -> StringType,
    "employer" -> StringType, "number_credit_cards" -> IntegerType,
    "net_worth" -> LongType)

  // tpcdi.py:335-339
  val taxRateSchema: StructType = s(
    "tx_id" -> StringType, "tx_name" -> StringType, "tx_rate" -> DoubleType)

  // tpcdi.py:344-354
  val hrSchema: StructType = s(
    "employee_id" -> IntegerType, "manager_id" -> IntegerType,
    "employee_first_name" -> StringType, "employee_last_name" -> StringType,
    "employee_mi" -> StringType, "employee_job_code" -> IntegerType,
    "employee_branch" -> StringType, "employee_office" -> StringType,
    "employee_phone" -> StringType)

  // tpcdi.py:359-364
  val watchHistorySchema: StructType = s(
    "w_c_id" -> LongType, "w_s_symb" -> StringType,
    "w_dts" -> TimestampType, "w_action" -> StringType)

  // tpcdi.py:369-384
  val tradeSchema: StructType = s(
    "t_id" -> LongType, "t_dts" -> TimestampType, "t_st_id" -> StringType,
    "t_tt_id" -> StringType, "t_is_cash" -> BooleanType,
    "t_s_symb" -> StringType, "t_qty" -> DoubleType,
    "t_bid_price" -> DoubleType, "t_ca_id" -> LongType,
    "t_exec_name" -> StringType, "t_trade_price" -> DoubleType,
    "t_chrg" -> DoubleType, "t_comm" -> DoubleType, "t_tax" -> DoubleType)

  // tpcdi.py:389-394
  val tradeHistorySchema: StructType = s(
    "th_t_id" -> LongType, "th_dts" -> TimestampType, "th_st_id" -> StringType)

  // tpcdi.py:398-402
  val statusTypeSchema: StructType = s(
    "st_id" -> StringType, "st_name" -> StringType)

  // tpcdi.py:406-412
  val tradeTypeSchema: StructType = s(
    "tt_id" -> StringType, "tt_name" -> StringType,
    "tt_is_sell" -> BooleanType, "tt_is_market" -> BooleanType)

  // tpcdi.py:416-422
  val holdingHistorySchema: StructType = s(
    "hh_h_t_id" -> LongType, "hh_t_id" -> LongType,
    "hh_before_qty" -> DoubleType, "hh_after_qty" -> DoubleType)

  // tpcdi.py:426-432
  val cashTransactionSchema: StructType = s(
    "ct_ca_id" -> LongType, "ct_dts" -> TimestampType,
    "ct_amt" -> DoubleType, "ct_name" -> StringType)

  /** File name (within the DIGen Batch1 dir) and schema per delimited
    * source table. Phone/watch/trade-style big facts are plain `|` text.
    */
  val delimitedSources: Map[String, (String, StructType)] = Map(
    "date" -> ("Date.txt", dateSchema),
    "daily_market" -> ("DailyMarket.txt", dailyMarketSchema),
    "industry" -> ("Industry.txt", industrySchema),
    "prospect" -> ("Prospect.csv", prospectSchema),
    "tax_rate" -> ("TaxRate.txt", taxRateSchema),
    "hr" -> ("HR.csv", hrSchema),
    "watch_history" -> ("WatchHistory.txt", watchHistorySchema),
    "trade" -> ("Trade.txt", tradeSchema),
    "trade_history" -> ("TradeHistory.txt", tradeHistorySchema),
    "status_type" -> ("StatusType.txt", statusTypeSchema),
    "trade_type" -> ("TradeType.txt", tradeTypeSchema),
    "holding_history" -> ("HoldingHistory.txt", holdingHistorySchema),
    "cash_transaction" -> ("CashTransaction.txt", cashTransactionSchema))

  /** Load all 17 source tables from a DIGen Batch1 directory:
    * 13 delimited + customer_mgmt (XML) + cmp/sec/fin (FINWIRE split).
    */
  def loadAll(spark: SparkSession, batchDir: String): Map[String, DataFrame] = {
    val delimited = delimitedSources.map { case (name, (file, schema)) =>
      name -> Sources.delimited(spark, s"$batchDir/$file", schema)
    }
    val finwire = Finwire.read(spark, s"$batchDir/FINWIRE??????").cache()
    delimited ++ Map(
      "customer_mgmt" -> CustomerXml.customerMgmt(spark, s"$batchDir/CustomerMgmt.xml"),
      "cmp" -> Finwire.cmp(finwire),
      "sec" -> Finwire.sec(finwire),
      "fin" -> Finwire.fin(finwire))
  }
}
