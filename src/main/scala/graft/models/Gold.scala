package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine._

/** Gold-zone models: star-schema dims and facts — one pure function per
  * reference model in models/gold/ (13 models) plus the ephemeral work
  * model. Surrogate keys via Keys.surrogateKey (dbt_utils semantics).
  *
  * Scale notes: every dim→fact lookup is an equi+temporal join on the
  * business key (J10) — Catalyst plans the equi conjunct as the join key
  * with the BETWEEN as post-join filter, so facts shuffle once per key.
  * Dims small enough to broadcast are marked; the big SCD2 dims
  * (customer/account/security at 100 TB) go through sort-merge with AQE.
  */
object Gold {

  private val lowGrade =
    Seq("BB", "B", "CCC", "CC", "C", "D", "BB+", "B+", "CCC+", "BB-", "B-", "CCC-")

  /** models/gold/dim_date.sql — pass-through. */
  def dimDate(date: DataFrame): DataFrame = date

  /** models/gold/dim_broker.sql — surrogate key over employees. */
  def dimBroker(employees: DataFrame): DataFrame =
    employees.select(
      Keys.surrogateKey(col("employee_id")).as("sk_broker_id"),
      col("employee_id").as("broker_id"),
      col("manager_id"), col("first_name"), col("last_name"),
      col("middle_initial"), col("job_code"), col("branch"),
      col("office"), col("phone"))

  /** models/gold/dim_company.sql — surrogate key + is_lowgrade flag. */
  def dimCompany(companies: DataFrame): DataFrame =
    companies.select(
      Keys.surrogateKey(col("company_id"), col("effective_timestamp"))
        .as("sk_company_id"),
      col("company_id"), col("status"), col("name"), col("industry"),
      col("ceo"), col("address_line1"), col("address_line2"),
      col("postal_code"), col("city"), col("state_province"), col("country"),
      col("description"), col("founding_date"), col("sp_rating"),
      col("sp_rating").isin(lowGrade: _*).as("is_lowgrade"),
      col("effective_timestamp"), col("end_timestamp"), col("is_current"))

  /** models/gold/dim_customer.sql — prospect enrichment (5-column USING
    * join, J8) + 20-column gap-fill (W6) + surrogate key.
    */
  def dimCustomer(customers: DataFrame, prospect: DataFrame): DataFrame = {
    val p = prospect.select("first_name", "last_name", "postal_code",
      "address_line1", "address_line2", "agency_id", "credit_rating", "net_worth")
    val s1 = customers.join(p,
      Seq("first_name", "last_name", "postal_code", "address_line1", "address_line2"),
      "left")
    val filled = Windows.gapFill(s1,
      Seq(col("customer_id")), Seq(col("effective_timestamp")),
      cols = Seq("tax_id", "last_name", "first_name", "middle_name", "gender",
        "tier", "dob", "address_line1", "address_line2", "postal_code", "city",
        "state_province", "country", "phone1", "phone2", "phone3",
        "primary_email", "alternate_email", "local_tax_rate_name",
        "local_tax_rate", "national_tax_rate_name", "national_tax_rate"))
    filled.select(
      Keys.surrogateKey(col("customer_id"), col("effective_timestamp"))
        .as("sk_customer_id"),
      col("customer_id"), col("tax_id"), col("status"), col("last_name"),
      col("first_name"), col("middle_name").as("middleinitial"), col("gender"),
      col("tier"), col("dob"), col("address_line1"), col("address_line2"),
      col("postal_code"), col("city"), col("state_province"), col("country"),
      col("phone1"), col("phone2"), col("phone3"), col("primary_email"),
      col("alternate_email"), col("local_tax_rate_name"), col("local_tax_rate"),
      col("national_tax_rate_name"), col("national_tax_rate"),
      col("agency_id"), col("credit_rating"), col("net_worth"),
      col("effective_timestamp"), col("end_timestamp"), col("is_current"))
  }

  /** models/gold/dim_account.sql — accounts + temporal customer lookup +
    * broker equi-join (broadcast: brokers are HR-sized).
    */
  def dimAccount(accounts: DataFrame, dimCustomer: DataFrame,
                 dimBroker: DataFrame): DataFrame = {
    val c = dimCustomer.select(col("customer_id").as("__c_customer_id"),
      col("sk_customer_id"),
      col("effective_timestamp").as("__c_eff"), col("end_timestamp").as("__c_end"))
    val b = broadcast(dimBroker.select(col("broker_id").as("__b_broker_id"),
      col("sk_broker_id")))
    accounts
      .join(c, accounts("customer_id") === c("__c_customer_id") &&
        accounts("effective_timestamp").between(c("__c_eff"), c("__c_end")))
      .join(b, accounts("broker_id") === b("__b_broker_id"))
      .select(
        Keys.surrogateKey(col("account_id"), col("effective_timestamp"))
          .as("sk_account_id"),
        col("account_id"), col("sk_broker_id"), col("sk_customer_id"),
        col("status"), col("account_desc"), col("tax_status"),
        col("effective_timestamp"), col("end_timestamp"), col("is_current"))
  }

  /** models/gold/dim_security.sql — securities + temporal company lookup. */
  def dimSecurity(securities: DataFrame, dimCompany: DataFrame): DataFrame = {
    val c = dimCompany.select(col("company_id").as("__c_company_id"),
      col("sk_company_id"),
      col("effective_timestamp").as("__c_eff"), col("end_timestamp").as("__c_end"))
    securities
      .join(c, securities("company_id") === c("__c_company_id") &&
        securities("effective_timestamp").between(c("__c_eff"), c("__c_end")))
      .select(
        Keys.surrogateKey(col("symbol"), col("effective_timestamp"))
          .as("sk_security_id"),
        col("symbol"), col("issue_type").as("issue"), col("status"),
        col("name"), col("exchange_id"), col("sk_company_id"),
        col("shares_outstanding"), col("first_trade_date"),
        col("first_exchange_date"), col("dividend"),
        col("effective_timestamp"), col("end_timestamp"), col("is_current"))
  }

  /** models/gold/dim_trade.sql — trade status versions with surrogate key. */
  def dimTrade(tradesHistory: DataFrame): DataFrame =
    tradesHistory.select(
      Keys.surrogateKey(col("trade_id"), col("effective_timestamp"))
        .as("sk_trade_id"),
      col("trade_id"), col("trade_status").as("status"),
      col("transaction_type"), col("trade_type").as("type"),
      col("executor_name").as("executed_by"),
      col("effective_timestamp"), col("end_timestamp"), col("is_current"))

  /** models/gold/fact_trade.sql — trades + three temporal dim lookups
    * (dim_trade on trade_id, dim_account on account_id, dim_security on
    * symbol), all keyed at create_timestamp.
    */
  def factTrade(trades: DataFrame, dimTrade: DataFrame, dimAccount: DataFrame,
                dimSecurity: DataFrame): DataFrame = {
    val dt = dimTrade.select(col("trade_id").as("__dt_trade_id"),
      col("sk_trade_id"), col("executed_by"),
      col("effective_timestamp").as("__dt_eff"), col("end_timestamp").as("__dt_end"))
    val a = dimAccount.select(col("account_id").as("__a_account_id"),
      col("sk_account_id"), col("sk_customer_id"), col("sk_broker_id"),
      col("effective_timestamp").as("__a_eff"), col("end_timestamp").as("__a_end"))
    val s = dimSecurity.select(col("symbol").as("__s_symbol"),
      col("sk_security_id"),
      col("effective_timestamp").as("__s_eff"), col("end_timestamp").as("__s_end"))
    trades
      .join(dt, trades("trade_id") === dt("__dt_trade_id") &&
        trades("create_timestamp").between(dt("__dt_eff"), dt("__dt_end")))
      .join(a, trades("account_id") === a("__a_account_id") &&
        trades("create_timestamp").between(a("__a_eff"), a("__a_end")))
      .join(s, trades("symbol") === s("__s_symbol") &&
        trades("create_timestamp").between(s("__s_eff"), s("__s_end")))
      .select(
        col("sk_trade_id"), col("sk_broker_id"), col("sk_customer_id"),
        col("sk_account_id"), col("sk_security_id"),
        to_date(col("create_timestamp")).as("sk_create_date"),
        col("create_timestamp"),
        to_date(col("close_timestamp")).as("sk_close_date"),
        col("close_timestamp"),
        col("executed_by"), col("quantity"), col("bid_price"),
        col("trade_price"), col("fee"), col("commission"), col("tax"))
  }

  /** models/gold/fact_cash_transactions.sql — ledger + temporal
    * dim_account lookup at the transaction timestamp.
    */
  def factCashTransactions(cashTransactions: DataFrame,
                           dimAccount: DataFrame): DataFrame = {
    val a = dimAccount.select(col("account_id").as("__a_account_id"),
      col("sk_account_id"), col("sk_customer_id"),
      col("effective_timestamp").as("__a_eff"), col("end_timestamp").as("__a_end"))
    cashTransactions
      .join(a, cashTransactions("account_id") === a("__a_account_id") &&
        cashTransactions("transaction_timestamp").between(a("__a_eff"), a("__a_end")))
      .select(col("sk_customer_id"), col("sk_account_id"),
        to_date(col("transaction_timestamp")).as("sk_transaction_date"),
        col("transaction_timestamp"), col("amount"), col("description"))
  }

  /** models/gold/fact_cash_balances.sql — GROUP BY ALL + sum over the
    * cash-transaction fact (A1).
    */
  def factCashBalances(factCashTransactions: DataFrame): DataFrame =
    factCashTransactions
      .groupBy("sk_customer_id", "sk_account_id", "sk_transaction_date",
        "description")
      .agg(sum("amount").as("amount"))
      .select("sk_customer_id", "sk_account_id", "sk_transaction_date",
        "amount", "description")
      .orderBy("sk_transaction_date", "sk_customer_id", "sk_account_id")

  /** models/gold/fact_holdings.sql — holdings + dim_trade twice (current
    * and previous trade), temporal dim_account, equi dim_security.
    */
  def factHoldings(holdingsHistory: DataFrame, dimTrade: DataFrame,
                   dimAccount: DataFrame, dimSecurity: DataFrame): DataFrame = {
    val ct = dimTrade.select(col("trade_id"),
      col("sk_trade_id").as("sk_current_trade_id"))
    val pt = dimTrade.select(col("trade_id").as("__pt_trade_id"),
      col("sk_trade_id"))
    val a = dimAccount.select(col("account_id").as("__a_account_id"),
      col("sk_account_id"), col("sk_customer_id"),
      col("effective_timestamp").as("__a_eff"), col("end_timestamp").as("__a_end"))
    val s = dimSecurity.select(col("symbol").as("__s_symbol"), col("sk_security_id"))
    holdingsHistory
      .join(ct, Seq("trade_id"))
      .join(pt, holdingsHistory("previous_trade_id") === pt("__pt_trade_id"))
      .join(a, holdingsHistory("account_id") === a("__a_account_id") &&
        holdingsHistory("create_timestamp").between(a("__a_eff"), a("__a_end")))
      .join(s, holdingsHistory("symbol") === s("__s_symbol"))
      .select(
        col("sk_current_trade_id"), col("sk_trade_id"),
        col("sk_customer_id"), col("sk_account_id"), col("sk_security_id"),
        to_date(col("create_timestamp")).as("sk_trade_date"),
        col("create_timestamp").as("trade_timestamp"),
        col("trade_price").as("current_price"),
        col("quantity").as("current_holding"),
        col("bid_price").as("current_bid_price"),
        col("fee").as("current_fee"),
        col("commission").as("current_commission"))
  }

  /** models/gold/fact_watches.sql — watches + temporal customer and
    * security lookups at placed_timestamp.
    */
  def factWatches(watches: DataFrame, dimCustomer: DataFrame,
                  dimSecurity: DataFrame): DataFrame = {
    val c = dimCustomer.select(col("customer_id").as("__c_customer_id"),
      col("sk_customer_id"),
      col("effective_timestamp").as("__c_eff"), col("end_timestamp").as("__c_end"))
    val s = dimSecurity.select(col("symbol").as("__s_symbol"),
      col("sk_security_id"),
      col("effective_timestamp").as("__s_eff"), col("end_timestamp").as("__s_end"))
    watches
      .join(c, watches("customer_id") === c("__c_customer_id") &&
        watches("placed_timestamp").between(c("__c_eff"), c("__c_end")))
      .join(s, watches("symbol") === s("__s_symbol") &&
        watches("placed_timestamp").between(s("__s_eff"), s("__s_end")))
      .select(col("sk_customer_id"), col("sk_security_id"),
        to_date(col("placed_timestamp")).as("sk_date_placed"),
        to_date(col("removed_timestamp")).as("sk_date_removed"),
        lit(1).as("watch_cnt"))
  }

  /** models/work/wrk_company_financials.sql — trailing-4-quarter EPS sum
    * excluding current (W5) over financials + temporal dim_company join.
    * Ephemeral: inlined into consumers, never materialized.
    */
  def wrkCompanyFinancials(financials: DataFrame, dimCompany: DataFrame): DataFrame = {
    val c = dimCompany.select(col("company_id").as("__c_company_id"),
      col("sk_company_id"),
      col("effective_timestamp").as("__c_eff"), col("end_timestamp").as("__c_end"))
    val joined = financials
      .join(c, financials("company_id") === c("__c_company_id") &&
        financials("effective_timestamp").between(c("__c_eff"), c("__c_end")))
    Windows.trailingSumExclusive(joined,
      Seq(col("company_id")), Seq(col("quarter_start_date")),
      col("eps"), preceding = 4, as = "sum_basic_eps")
      .select("sk_company_id", "company_id", "quarter_start_date", "sum_basic_eps")
  }

  /** models/gold/fact_market_history.sql — daily market + temporal
    * dim_security lookup (DATE-vs-TIMESTAMP comparison, J10) + left join
    * to company financials. NB the reference's USING(sk_company_id) left
    * join fans out across quarters; replicated as-is for parity (its
    * selected columns don't include the financials).
    */
  def factMarketHistory(dailyMarket: DataFrame, dimSecurity: DataFrame,
                        wrkCompanyFinancials: DataFrame): DataFrame = {
    val s = dimSecurity.select(col("symbol").as("__s_symbol"),
      col("sk_security_id"), col("sk_company_id"), col("dividend"),
      col("effective_timestamp").as("__s_eff"), col("end_timestamp").as("__s_end"))
    val f = wrkCompanyFinancials.select(col("sk_company_id"),
      col("sum_basic_eps"))
    dailyMarket
      .join(s, dailyMarket("dm_s_symb") === s("__s_symbol") &&
        dailyMarket("dm_date").cast("timestamp")
          .between(s("__s_eff"), s("__s_end")))
      .join(f, Seq("sk_company_id"), "left")
      .select(
        col("sk_security_id"), col("sk_company_id"),
        col("dm_date").as("sk_date_id"),
        ((col("dividend") / col("dm_close")) / 100).as("yield"),
        col("fifty_two_week_high"),
        col("fifty_two_week_high_date").as("sk_fifty_two_week_high_date"),
        col("fifty_two_week_low"),
        col("fifty_two_week_low_date").as("sk_fifty_two_week_low_date"),
        col("dm_close").as("closeprice"),
        col("dm_high").as("dayhigh"),
        col("dm_low").as("daylow"),
        col("dm_vol").as("volume"))
  }
}
