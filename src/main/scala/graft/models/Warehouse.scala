package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full TPC-DI warehouse DAG (17 bronze + 14 silver + 13 gold models
  * + 1 ephemeral work model), mirroring the reference's dbt project
  * (dbt_project.yml:29-50). Each model is a lazy val — the DAG is the
  * Scala evaluation order, memoized per Warehouse instance; Spark keeps
  * everything lazy until a sink materializes it (the Dynamic Table
  * refresh semantics reduce to batch recompute in dependency order,
  * SURVEY §2.9).
  *
  * @param sources the 17 loader tables (Loader.loadAll or test fixtures)
  */
final class Warehouse(sources: Map[String, DataFrame]) {

  // ---- bronze (models/bronze/, pass-throughs + typing) -----------------
  lazy val brokerageCashTransaction: DataFrame = sources("cash_transaction")
  lazy val brokerageDailyMarket: DataFrame = sources("daily_market")
  lazy val brokerageHoldingHistory: DataFrame = sources("holding_history")
  lazy val brokerageTrade: DataFrame = sources("trade")
  lazy val brokerageTradeHistory: DataFrame = sources("trade_history")
  lazy val brokerageWatchHistory: DataFrame = sources("watch_history")
  lazy val crmCustomerMgmt: DataFrame = sources("customer_mgmt")
  lazy val finwireCompany: DataFrame = sources("cmp")
  /** bronze finwire typing (finwire_financial.sql / finwire_security.sql) */
  lazy val finwireFinancial: DataFrame = Finwire.finTyped(sources("fin"))
  lazy val finwireSecurity: DataFrame = Finwire.secTyped(sources("sec"))
  lazy val hrEmployee: DataFrame = sources("hr")
  /** reference_date.sql:1-20 — SK_DATE_ID replaced by the date value. */
  lazy val referenceDate: DataFrame =
    sources("date").withColumn("sk_date_id", col("date_value"))
  lazy val referenceIndustry: DataFrame = sources("industry")
  lazy val referenceStatusType: DataFrame = sources("status_type")
  lazy val referenceTaxRate: DataFrame = sources("tax_rate")
  lazy val referenceTradeType: DataFrame = sources("trade_type")
  lazy val syndicatedProspect: DataFrame = sources("prospect")

  // ---- silver (models/silver/) ----------------------------------------
  lazy val date: DataFrame = Silver.date(referenceDate)
  lazy val employees: DataFrame = Silver.employees(hrEmployee)
  lazy val accounts: DataFrame = Silver.accounts(crmCustomerMgmt, referenceTaxRate)
  lazy val customers: DataFrame = Silver.customers(crmCustomerMgmt, referenceTaxRate)
  lazy val companies: DataFrame =
    Silver.companies(finwireCompany, referenceStatusType, referenceIndustry)
  lazy val financials: DataFrame = Silver.financials(finwireFinancial, companies)
  lazy val securities: DataFrame = Silver.securities(finwireSecurity, companies)
  lazy val tradesHistory: DataFrame = Silver.tradesHistory(
    brokerageTrade, brokerageTradeHistory, referenceTradeType, referenceStatusType)
  lazy val trades: DataFrame = Silver.trades(tradesHistory)
  lazy val cashTransactions: DataFrame =
    Silver.cashTransactions(brokerageCashTransaction, accounts)
  lazy val dailyMarket: DataFrame = Silver.dailyMarket(brokerageDailyMarket)
  lazy val watchesHistory: DataFrame =
    Silver.watchesHistory(brokerageWatchHistory, securities)
  lazy val watches: DataFrame = Silver.watches(watchesHistory)
  lazy val holdingsHistory: DataFrame =
    Silver.holdingsHistory(brokerageHoldingHistory, trades)

  // ---- gold (models/gold/) --------------------------------------------
  lazy val dimDate: DataFrame = Gold.dimDate(date)
  lazy val dimBroker: DataFrame = Gold.dimBroker(employees)
  lazy val dimCompany: DataFrame = Gold.dimCompany(companies)
  lazy val dimCustomer: DataFrame = Gold.dimCustomer(customers, syndicatedProspect)
  lazy val dimAccount: DataFrame = Gold.dimAccount(accounts, dimCustomer, dimBroker)
  lazy val dimSecurity: DataFrame = Gold.dimSecurity(securities, dimCompany)
  lazy val dimTrade: DataFrame = Gold.dimTrade(tradesHistory)
  lazy val factTrade: DataFrame =
    Gold.factTrade(trades, dimTrade, dimAccount, dimSecurity)
  lazy val factCashTransactions: DataFrame =
    Gold.factCashTransactions(cashTransactions, dimAccount)
  lazy val factCashBalances: DataFrame =
    Gold.factCashBalances(factCashTransactions)
  lazy val factHoldings: DataFrame =
    Gold.factHoldings(holdingsHistory, dimTrade, dimAccount, dimSecurity)
  lazy val factWatches: DataFrame =
    Gold.factWatches(watches, dimCustomer, dimSecurity)
  lazy val wrkCompanyFinancials: DataFrame =
    Gold.wrkCompanyFinancials(financials, dimCompany)
  lazy val factMarketHistory: DataFrame =
    Gold.factMarketHistory(dailyMarket, dimSecurity, wrkCompanyFinancials)

  /** tests/fact_trade__unique_trade.sql:1-6 — sk_trade_id must be unique
    * in fact_trade; non-empty result = violation.
    */
  lazy val uniqueTradeViolations: DataFrame =
    factTrade.groupBy("sk_trade_id").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** All materialized models in reference dependency order (bronze →
    * silver → gold; observed build order README.md:216-305). The work
    * model is ephemeral and excluded, like the reference.
    */
  def all: Seq[(String, DataFrame)] = Seq(
    "brokerage_cash_transaction" -> brokerageCashTransaction,
    "brokerage_daily_market" -> brokerageDailyMarket,
    "brokerage_holding_history" -> brokerageHoldingHistory,
    "brokerage_trade" -> brokerageTrade,
    "brokerage_trade_history" -> brokerageTradeHistory,
    "brokerage_watch_history" -> brokerageWatchHistory,
    "crm_customer_mgmt" -> crmCustomerMgmt,
    "finwire_company" -> finwireCompany,
    "finwire_financial" -> finwireFinancial,
    "finwire_security" -> finwireSecurity,
    "hr_employee" -> hrEmployee,
    "reference_date" -> referenceDate,
    "reference_industry" -> referenceIndustry,
    "reference_status_type" -> referenceStatusType,
    "reference_tax_rate" -> referenceTaxRate,
    "reference_trade_type" -> referenceTradeType,
    "syndicated_prospect" -> syndicatedProspect,
    "date" -> date,
    "employees" -> employees,
    "accounts" -> accounts,
    "customers" -> customers,
    "companies" -> companies,
    "financials" -> financials,
    "securities" -> securities,
    "trades_history" -> tradesHistory,
    "trades" -> trades,
    "cash_transactions" -> cashTransactions,
    "daily_market" -> dailyMarket,
    "watches_history" -> watchesHistory,
    "watches" -> watches,
    "holdings_history" -> holdingsHistory,
    "dim_date" -> dimDate,
    "dim_broker" -> dimBroker,
    "dim_company" -> dimCompany,
    "dim_customer" -> dimCustomer,
    "dim_account" -> dimAccount,
    "dim_security" -> dimSecurity,
    "dim_trade" -> dimTrade,
    "fact_trade" -> factTrade,
    "fact_cash_transactions" -> factCashTransactions,
    "fact_cash_balances" -> factCashBalances,
    "fact_holdings" -> factHoldings,
    "fact_watches" -> factWatches,
    "fact_market_history" -> factMarketHistory)
}

object Warehouse {
  /** Build from a DIGen Batch1 directory. */
  def fromBatchDir(spark: SparkSession, batchDir: String): Warehouse =
    new Warehouse(Loader.loadAll(spark, batchDir))

  /** Materialize every model to parquet under outDir in dependency
    * order (the dbt-build analog; zone target_lag reduces to batch
    * recompute, SURVEY §3.2-3.3).
    */
  def build(wh: Warehouse, outDir: String): Unit =
    wh.all.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
}
