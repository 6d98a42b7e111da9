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
  * `mat` is the materialization hook, applied to every model as its
  * lazy val is first evaluated. Default = identity (fully lazy, for
  * composition). `Warehouse.build` passes write-then-reread, which is
  * dbt's semantics: each model computes ONCE and downstream models scan
  * its table — without it, every gold fact re-derives its whole
  * upstream from the raw files (measured 2× the total build time on
  * fact_holdings alone at 500k trades).
  *
  * @param sources the 17 loader tables (Loader.loadAll or test fixtures)
  * @param mat     materialization hook (name, plan) => DataFrame seen
  *                by downstream models
  */
final class Warehouse(sources: Map[String, DataFrame],
                      mat: (String, DataFrame) => DataFrame = (_, df) => df) {

  private def m(name: String)(df: => DataFrame): DataFrame = mat(name, df)

  // ---- bronze (models/bronze/, pass-throughs + typing) -----------------
  lazy val brokerageCashTransaction: DataFrame = m("brokerage_cash_transaction")(sources("cash_transaction"))
  lazy val brokerageDailyMarket: DataFrame = m("brokerage_daily_market")(sources("daily_market"))
  lazy val brokerageHoldingHistory: DataFrame = m("brokerage_holding_history")(sources("holding_history"))
  lazy val brokerageTrade: DataFrame = m("brokerage_trade")(sources("trade"))
  lazy val brokerageTradeHistory: DataFrame = m("brokerage_trade_history")(sources("trade_history"))
  lazy val brokerageWatchHistory: DataFrame = m("brokerage_watch_history")(sources("watch_history"))
  lazy val crmCustomerMgmt: DataFrame = m("crm_customer_mgmt")(sources("customer_mgmt"))
  lazy val finwireCompany: DataFrame = m("finwire_company")(sources("cmp"))
  /** bronze finwire typing (finwire_financial.sql / finwire_security.sql) */
  lazy val finwireFinancial: DataFrame = m("finwire_financial")(Finwire.finTyped(sources("fin")))
  lazy val finwireSecurity: DataFrame = m("finwire_security")(Finwire.secTyped(sources("sec")))
  lazy val hrEmployee: DataFrame = m("hr_employee")(sources("hr"))
  /** reference_date.sql:1-20 — SK_DATE_ID replaced by the date value. */
  lazy val referenceDate: DataFrame = m("reference_date")(sources("date").withColumn("sk_date_id", col("date_value")))
  lazy val referenceIndustry: DataFrame = m("reference_industry")(sources("industry"))
  lazy val referenceStatusType: DataFrame = m("reference_status_type")(sources("status_type"))
  lazy val referenceTaxRate: DataFrame = m("reference_tax_rate")(sources("tax_rate"))
  lazy val referenceTradeType: DataFrame = m("reference_trade_type")(sources("trade_type"))
  lazy val syndicatedProspect: DataFrame = m("syndicated_prospect")(sources("prospect"))

  // ---- silver (models/silver/) ----------------------------------------
  lazy val date: DataFrame = m("date")(Silver.date(referenceDate))
  lazy val employees: DataFrame = m("employees")(Silver.employees(hrEmployee))
  lazy val accounts: DataFrame = m("accounts")(Silver.accounts(crmCustomerMgmt, referenceTaxRate))
  lazy val customers: DataFrame = m("customers")(Silver.customers(crmCustomerMgmt, referenceTaxRate))
  lazy val companies: DataFrame = m("companies")(Silver.companies(finwireCompany, referenceStatusType, referenceIndustry))
  lazy val financials: DataFrame = m("financials")(Silver.financials(finwireFinancial, companies))
  lazy val securities: DataFrame = m("securities")(Silver.securities(finwireSecurity, companies))
  lazy val tradesHistory: DataFrame = m("trades_history")(Silver.tradesHistory(
    brokerageTrade, brokerageTradeHistory, referenceTradeType, referenceStatusType))
  lazy val trades: DataFrame = m("trades")(Silver.trades(tradesHistory))
  lazy val cashTransactions: DataFrame = m("cash_transactions")(Silver.cashTransactions(brokerageCashTransaction, accounts))
  lazy val dailyMarket: DataFrame = m("daily_market")(Silver.dailyMarket(brokerageDailyMarket))
  lazy val watchesHistory: DataFrame = m("watches_history")(Silver.watchesHistory(brokerageWatchHistory, securities))
  lazy val watches: DataFrame = m("watches")(Silver.watches(watchesHistory))
  lazy val holdingsHistory: DataFrame = m("holdings_history")(Silver.holdingsHistory(brokerageHoldingHistory, trades))

  // ---- gold (models/gold/) --------------------------------------------
  lazy val dimDate: DataFrame = m("dim_date")(Gold.dimDate(date))
  lazy val dimBroker: DataFrame = m("dim_broker")(Gold.dimBroker(employees))
  lazy val dimCompany: DataFrame = m("dim_company")(Gold.dimCompany(companies))
  lazy val dimCustomer: DataFrame = m("dim_customer")(Gold.dimCustomer(customers, syndicatedProspect))
  lazy val dimAccount: DataFrame = m("dim_account")(Gold.dimAccount(accounts, dimCustomer, dimBroker))
  lazy val dimSecurity: DataFrame = m("dim_security")(Gold.dimSecurity(securities, dimCompany))
  lazy val dimTrade: DataFrame = m("dim_trade")(Gold.dimTrade(tradesHistory))
  lazy val factTrade: DataFrame = m("fact_trade")(Gold.factTrade(trades, dimTrade, dimAccount, dimSecurity))
  lazy val factCashTransactions: DataFrame = m("fact_cash_transactions")(Gold.factCashTransactions(cashTransactions, dimAccount))
  lazy val factCashBalances: DataFrame = m("fact_cash_balances")(Gold.factCashBalances(factCashTransactions))
  lazy val factHoldings: DataFrame = m("fact_holdings")(Gold.factHoldings(holdingsHistory, dimTrade, dimAccount, dimSecurity))
  lazy val factWatches: DataFrame = m("fact_watches")(Gold.factWatches(watches, dimCustomer, dimSecurity))
  lazy val wrkCompanyFinancials: DataFrame =
    Gold.wrkCompanyFinancials(financials, dimCompany)
  lazy val factMarketHistory: DataFrame = m("fact_market_history")(Gold.factMarketHistory(dailyMarket, dimSecurity, wrkCompanyFinancials))

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
    * order — the dbt-build analog (zone target_lag reduces to batch
    * recompute, SURVEY §3.2-3.3). Each model is computed exactly once:
    * the materializer writes its parquet as the lazy val first
    * evaluates, and every downstream model reads the written table
    * instead of re-deriving the upstream plan.
    *
    * Returns the materialized Warehouse (all models backed by parquet).
    */
  def build(spark: SparkSession, sources: Map[String, DataFrame],
            outDir: String): Warehouse = {
    val wh = new Warehouse(sources, (name, df) => {
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      spark.read.parquet(s"$outDir/$name")
    })
    wh.all.foreach(_ => ()) // force every model in dependency order
    wh
  }

  /** Convenience: generate + build straight from a Batch1 directory. */
  def buildFromBatchDir(spark: SparkSession, batchDir: String,
                        outDir: String): Warehouse =
    build(spark, Loader.loadAll(spark, batchDir), outDir)
}
