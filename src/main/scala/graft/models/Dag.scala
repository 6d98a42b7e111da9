package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Explicit-dependency DAG runner — the dbt-scheduler analog
  * (20 threads in the reference build, README.md:215): independent
  * branches (e.g. the FINWIRE/company spine vs the trade spine vs the
  * CRM spine) materialize concurrently, with Spark's scheduler
  * interleaving their jobs across the executor slots.
  *
  * Nodes mirror `Warehouse`'s lazy vals 1:1 but take their inputs from
  * the materialized outputs of their dependencies, so each model still
  * computes exactly once and the parallelism is driver-side job
  * submission only — no recomputation, no shared-lazy-val lock (Scala
  * lazy vals hold the object monitor during initialization, which would
  * serialize a naive parallel force).
  */
object Dag {

  final case class Node(name: String, deps: Seq[String],
                        fn: Map[String, DataFrame] => DataFrame)

  /** The 44 materialized models (work model stays ephemeral/inlined). */
  def nodes(sources: Map[String, DataFrame]): Seq[Node] = {
    def src(model: String, key: String) = Node(model, Nil, _ => sources(key))
    Seq(
      src("brokerage_cash_transaction", "cash_transaction"),
      src("brokerage_daily_market", "daily_market"),
      src("brokerage_holding_history", "holding_history"),
      src("brokerage_trade", "trade"),
      src("brokerage_trade_history", "trade_history"),
      src("brokerage_watch_history", "watch_history"),
      src("crm_customer_mgmt", "customer_mgmt"),
      src("finwire_company", "cmp"),
      Node("finwire_financial", Nil, _ => Finwire.finTyped(sources("fin"))),
      Node("finwire_security", Nil, _ => Finwire.secTyped(sources("sec"))),
      src("hr_employee", "hr"),
      Node("reference_date", Nil, _ => sources("date")
        .withColumn("sk_date_id", org.apache.spark.sql.functions.col("date_value"))),
      src("reference_industry", "industry"),
      src("reference_status_type", "status_type"),
      src("reference_tax_rate", "tax_rate"),
      src("reference_trade_type", "trade_type"),
      src("syndicated_prospect", "prospect"),

      Node("date", Seq("reference_date"), d => Silver.date(d("reference_date"))),
      Node("employees", Seq("hr_employee"), d => Silver.employees(d("hr_employee"))),
      Node("accounts", Seq("crm_customer_mgmt", "reference_tax_rate"),
        d => Silver.accounts(d("crm_customer_mgmt"), d("reference_tax_rate"))),
      Node("customers", Seq("crm_customer_mgmt", "reference_tax_rate"),
        d => Silver.customers(d("crm_customer_mgmt"), d("reference_tax_rate"))),
      Node("companies", Seq("finwire_company", "reference_status_type", "reference_industry"),
        d => Silver.companies(d("finwire_company"), d("reference_status_type"),
          d("reference_industry"))),
      Node("financials", Seq("finwire_financial", "companies"),
        d => Silver.financials(d("finwire_financial"), d("companies"))),
      Node("securities", Seq("finwire_security", "companies"),
        d => Silver.securities(d("finwire_security"), d("companies"))),
      Node("trades_history",
        Seq("brokerage_trade", "brokerage_trade_history",
          "reference_trade_type", "reference_status_type"),
        d => Silver.tradesHistory(d("brokerage_trade"), d("brokerage_trade_history"),
          d("reference_trade_type"), d("reference_status_type"))),
      Node("trades", Seq("trades_history"), d => Silver.trades(d("trades_history"))),
      Node("cash_transactions", Seq("brokerage_cash_transaction", "accounts"),
        d => Silver.cashTransactions(d("brokerage_cash_transaction"), d("accounts"))),
      Node("daily_market", Seq("brokerage_daily_market"),
        d => Silver.dailyMarket(d("brokerage_daily_market"))),
      Node("watches_history", Seq("brokerage_watch_history", "securities"),
        d => Silver.watchesHistory(d("brokerage_watch_history"), d("securities"))),
      Node("watches", Seq("watches_history"), d => Silver.watches(d("watches_history"))),
      Node("holdings_history", Seq("brokerage_holding_history", "trades"),
        d => Silver.holdingsHistory(d("brokerage_holding_history"), d("trades"))),

      Node("dim_date", Seq("date"), d => Gold.dimDate(d("date"))),
      Node("dim_broker", Seq("employees"), d => Gold.dimBroker(d("employees"))),
      Node("dim_company", Seq("companies"), d => Gold.dimCompany(d("companies"))),
      Node("dim_customer", Seq("customers", "syndicated_prospect"),
        d => Gold.dimCustomer(d("customers"), d("syndicated_prospect"))),
      Node("dim_account", Seq("accounts", "dim_customer", "dim_broker"),
        d => Gold.dimAccount(d("accounts"), d("dim_customer"), d("dim_broker"))),
      Node("dim_security", Seq("securities", "dim_company"),
        d => Gold.dimSecurity(d("securities"), d("dim_company"))),
      Node("dim_trade", Seq("trades_history"), d => Gold.dimTrade(d("trades_history"))),
      Node("fact_trade", Seq("trades", "dim_trade", "dim_account", "dim_security"),
        d => Gold.factTrade(d("trades"), d("dim_trade"), d("dim_account"),
          d("dim_security"))),
      Node("fact_cash_transactions", Seq("cash_transactions", "dim_account"),
        d => Gold.factCashTransactions(d("cash_transactions"), d("dim_account"))),
      Node("fact_cash_balances", Seq("fact_cash_transactions"),
        d => Gold.factCashBalances(d("fact_cash_transactions"))),
      Node("fact_holdings",
        Seq("holdings_history", "dim_trade", "dim_account", "dim_security"),
        d => Gold.factHoldings(d("holdings_history"), d("dim_trade"),
          d("dim_account"), d("dim_security"))),
      Node("fact_watches", Seq("watches", "dim_customer", "dim_security"),
        d => Gold.factWatches(d("watches"), d("dim_customer"), d("dim_security"))),
      // work model inlined (ephemeral), like the reference
      Node("fact_market_history", Seq("daily_market", "dim_security", "financials", "dim_company"),
        d => Gold.factMarketHistory(d("daily_market"), d("dim_security"),
          Gold.wrkCompanyFinancials(d("financials"), d("dim_company")))))
  }

  /** Source table key → the bronze model that scans it (the roots a
    * source delta dirties in the DAG).
    */
  val sourceModel: Map[String, String] = Map(
    "cash_transaction" -> "brokerage_cash_transaction",
    "daily_market" -> "brokerage_daily_market",
    "holding_history" -> "brokerage_holding_history",
    "trade" -> "brokerage_trade",
    "trade_history" -> "brokerage_trade_history",
    "watch_history" -> "brokerage_watch_history",
    "customer_mgmt" -> "crm_customer_mgmt",
    "cmp" -> "finwire_company",
    "fin" -> "finwire_financial",
    "sec" -> "finwire_security",
    "hr" -> "hr_employee",
    "date" -> "reference_date",
    "industry" -> "reference_industry",
    "status_type" -> "reference_status_type",
    "tax_rate" -> "reference_tax_rate",
    "trade_type" -> "reference_trade_type",
    "prospect" -> "syndicated_prospect")

  /** Models transitively downstream of `roots` (inclusive) — structural
    * only, no DataFrames touched. This is what lets an incremental
    * batch apply skip every model whose upstream closure the delta
    * can't reach ([[Warehouse.applyBatch2]]).
    */
  def downstream(roots: Set[String]): Set[String] = {
    val ns = nodes(Map.empty)
    var affected = roots
    var changed = true
    while (changed) {
      changed = false
      ns.foreach { n =>
        if (!affected(n.name) && n.deps.exists(affected)) {
          affected += n.name; changed = true
        }
      }
    }
    affected
  }

  /** Materialize the whole DAG with `parallelism` concurrent model
    * builds. Returns per-model wall seconds (overlapping).
    */
  def runParallel(spark: SparkSession, sources: Map[String, DataFrame],
                  outDir: String, parallelism: Int = 8): Map[String, Double] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val ns = nodes(sources)
    val futures = scala.collection.mutable.Map.empty[String, Future[DataFrame]]
    val timings = new java.util.concurrent.ConcurrentHashMap[String, Double]()

    def futureOf(n: Node): Future[DataFrame] = synchronized {
      futures.getOrElseUpdate(n.name, {
        val depF = Future.sequence(
          n.deps.map(dn => futureOf(ns.find(_.name == dn).get)))
        depF.map { depDfs =>
          val t0 = System.nanoTime()
          val df = n.fn(n.deps.zip(depDfs).toMap)
          df.write.mode("overwrite").parquet(s"$outDir/${n.name}")
          timings.put(n.name, (System.nanoTime() - t0) / 1e9)
          spark.read.parquet(s"$outDir/${n.name}")
        }
      })
    }
    try {
      Await.result(Future.sequence(ns.map(futureOf)), Duration.Inf)
      import scala.jdk.CollectionConverters._
      timings.asScala.toMap
    } finally pool.shutdown()
  }
}
