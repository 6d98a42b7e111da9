package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine._

/** Silver-zone models: business entities with SCD2 history — one pure
  * function per reference model in models/silver/ (14 models). Inputs are
  * the bronze DataFrames; outputs match the reference's column sets.
  *
  * Deviations from the reference, by design:
  *  - fixed-width string fields are right-trimmed in the typed layer (the
  *    reference keeps Snowflake `substring` padding everywhere; padding is
  *    consistent across FINWIRE-derived tables there, so joins behave the
  *    same — trimming is the Spark-native normalization, SURVEY §7.4.9)
  *  - `company_id` is LongType end-to-end (the reference mixes a 10-char
  *    zero-padded CIK string in companies with NUMBER in financials and
  *    relies on Snowflake implicit casts)
  */
object Silver {

  private val lowGradeRatings =
    Seq("BB", "B", "CCC", "CC", "C", "D", "BB+", "B+", "CCC+", "BB-", "B-", "CCC-")

  /** models/silver/date.sql — pass-through of bronze reference_date. */
  def date(referenceDate: DataFrame): DataFrame = referenceDate

  /** models/silver/employees.sql:1-11 — rename projection over hr. */
  def employees(hr: DataFrame): DataFrame =
    hr.select(
      col("employee_id"), col("manager_id"),
      col("employee_first_name").as("first_name"),
      col("employee_last_name").as("last_name"),
      col("employee_mi").as("middle_initial"),
      col("employee_job_code").as("job_code"),
      col("employee_branch").as("branch"),
      col("employee_office").as("office"),
      col("employee_phone").as("phone"))

  /** Shared CRM shape for accounts/customers (models/silver/accounts.sql
    * and customers.sql differ only in decode map, filter, SCD2 key, and
    * two column aliases).
    */
  private def crmJoined(customerMgmt: DataFrame, taxRate: DataFrame): DataFrame = {
    val ntx = broadcast(taxRate.select(col("tx_id").as("__ntx_id"),
      col("tx_rate").as("national_tax_rate")))
    val ltx = broadcast(taxRate.select(col("tx_id").as("__ltx_id"),
      col("tx_rate").as("local_tax_rate")))
    customerMgmt
      .join(ntx, col("c_nat_tx_id") === col("__ntx_id"), "left")
      .join(ltx, col("c_lcl_tx_id") === col("__ltx_id"), "left")
      .drop("__ntx_id", "__ltx_id")
  }

  /** models/silver/accounts.sql — SCD2 account versions from the CRM
    * action log, partitioned by ca_id.
    */
  def accounts(customerMgmt: DataFrame, taxRate: DataFrame): DataFrame =
    Scd2.scd2(accountsBase(customerMgmt, taxRate), Seq("account_id"),
      "action_ts").drop("action_ts")

  /** The account change rows BEFORE versioning (the `base` CTE of
    * accounts.sql): payload columns + `action_ts`. Exposed so
    * incremental Batch2 maintenance ([[Incremental.mergeScd2Batch]],
    * [[Warehouse.applyBatch2]]) can route a CRM delta through the exact
    * same projection the full model uses.
    */
  private[models] def accountsBase(customerMgmt: DataFrame,
                                   taxRate: DataFrame): DataFrame = {
    crmJoined(customerMgmt, taxRate)
      .filter(col("ca_id").isNotNull)
      .select(
        col("action_type"),
        Dialect.decode(col("action_type"), Seq(
          lit("NEW") -> lit("Active"), lit("ADDACCT") -> lit("Active"),
          lit("UPDACCT") -> lit("Active"), lit("CLOSEACCT") -> lit("Inactive")))
          .as("status"),
        col("ca_id").as("account_id"),
        col("ca_name").as("account_desc"),
        col("c_id").as("customer_id"),
        col("c_tax_id").as("tax_id"),
        col("c_gndr").as("gender"), col("c_tier").as("tier"),
        col("c_dob").as("dob"),
        col("c_l_name").as("last_name"), col("c_f_name").as("first_name"),
        col("c_m_name").as("middle_name"),
        col("c_adline1").as("address_line1"), col("c_adline2").as("address_line2"),
        col("c_zipcode").as("postal_code"), col("c_city").as("city"),
        col("c_state_prov").as("state_province"), col("c_ctry").as("country"),
        col("c_prim_email").as("primary_email"), col("c_alt_email").as("alternate_email"),
        col("c_phone_1").as("phone1"), col("c_phone_2").as("phone2"),
        col("c_phone_3").as("phone3"),
        col("c_lcl_tx_id").as("local_tax_rate_name"), col("local_tax_rate"),
        col("c_nat_tx_id").as("national_tax_rate_name"), col("national_tax_rate"),
        col("ca_tax_st").as("tax_status"),
        col("ca_b_id").as("broker_id"),
        col("action_ts"))
  }

  /** models/silver/customers.sql — SCD2 customer versions, partitioned by
    * c_id, NEW/INACT/UPDCUST actions only.
    */
  def customers(customerMgmt: DataFrame, taxRate: DataFrame): DataFrame =
    Scd2.scd2(customersBase(customerMgmt, taxRate), Seq("customer_id"),
      "action_ts").drop("action_ts")

  /** Customer change rows before versioning — see [[accountsBase]]. */
  private[models] def customersBase(customerMgmt: DataFrame,
                                    taxRate: DataFrame): DataFrame = {
    crmJoined(customerMgmt, taxRate)
      .filter(col("action_type").isin("NEW", "INACT", "UPDCUST"))
      .select(
        col("action_type"),
        Dialect.decode(col("action_type"), Seq(
          lit("NEW") -> lit("Active"), lit("ADDACCT") -> lit("Active"),
          lit("UPDACCT") -> lit("Active"), lit("UPDCUST") -> lit("Active"),
          lit("INACT") -> lit("Inactive"))).as("status"),
        col("c_id").as("customer_id"),
        col("ca_id").as("account_id"),
        col("c_tax_id").as("tax_id"),
        col("c_gndr").as("gender"), col("c_tier").as("tier"),
        col("c_dob").as("dob"),
        col("c_l_name").as("last_name"), col("c_f_name").as("first_name"),
        col("c_m_name").as("middle_name"),
        col("c_adline1").as("address_line1"), col("c_adline2").as("address_line2"),
        col("c_zipcode").as("postal_code"), col("c_city").as("city"),
        col("c_state_prov").as("state_province"), col("c_ctry").as("country"),
        col("c_prim_email").as("primary_email"), col("c_alt_email").as("alternate_email"),
        col("c_phone_1").as("phone1"), col("c_phone_2").as("phone2"),
        col("c_phone_3").as("phone3"),
        col("c_lcl_tx_id").as("local_tax_rate_name"), col("local_tax_rate"),
        col("c_nat_tx_id").as("national_tax_rate_name"), col("national_tax_rate"),
        col("ca_tax_st").as("account_tax_status"),
        col("ca_b_id").as("broker_id"),
        col("action_ts"))
  }

  /** models/silver/companies.sql — SCD2 company master from FINWIRE CMP +
    * status/industry lookups (broadcast: 6 and ~100 rows).
    */
  /** The pre-SCD2 company change rows (CMP record → typed payload +
    * pts) — factored out so [[graft.models.Warehouse.applyBatch]] can
    * route a CMP delta through the SAME projection into the SCD2 merge
    * (the accountsBase pattern).
    */
  def companiesBase(cmpRaw: DataFrame, statusType: DataFrame,
                    industry: DataFrame): DataFrame = {
    val st = broadcast(statusType.select(col("st_id"), col("st_name")))
    val ind = broadcast(industry.select(col("in_id"), col("in_name")))
    cmpRaw
      .join(st, col("status") === col("st_id"))
      .join(ind, col("industry_id") === col("in_id"))
      .select(
        Dialect.tryCast(trim(col("cik")), "long").as("company_id"),
        col("st_name").as("status"),
        rtrim(col("company_name")).as("name"),
        col("in_name").as("industry"),
        rtrim(col("ceo_name")).as("ceo"),
        rtrim(col("address_line1")).as("address_line1"),
        rtrim(col("address_line2")).as("address_line2"),
        rtrim(col("postal_code")).as("postal_code"),
        rtrim(col("city")).as("city"),
        rtrim(col("state_province")).as("state_province"),
        rtrim(col("country")).as("country"),
        rtrim(col("description")).as("description"),
        col("founding_date"),
        rtrim(col("sp_rating")).as("sp_rating"),
        col("pts"))
  }

  def companies(cmpRaw: DataFrame, statusType: DataFrame,
                industry: DataFrame): DataFrame =
    Scd2.scd2(companiesBase(cmpRaw, statusType, industry),
      Seq("company_id"), "pts").drop("pts")

  /** models/silver/financials.sql — FINWIRE FIN + dual-key (cik-or-name)
    * temporal join to companies, then SCD2 by company_id.
    */
  def financials(finTyped: DataFrame, companies: DataFrame): DataFrame = {
    val joined = TemporalJoin.dualKeyTemporalJoin(
      finTyped.withColumnRenamed("company_name", "__fin_company_name"),
      companies.select("company_id", "name", "effective_timestamp", "end_timestamp"),
      (col("cik"), d => d("__k1_company_id")),
      (col("__fin_company_name"), d => d("__k2_name")),
      col("pts"), attrs = Seq("name", "company_id"))
    val base = joined.select(
      col("year"), col("quarter"), col("quarter_start_date"), col("posting_date"),
      col("revenue"), col("earnings"), col("eps"), col("diluted_eps"),
      col("margin"), col("inventory"), col("assets"), col("liabilities"),
      col("sh_out"), col("diluted_sh_out"),
      col("name").as("company_name"),
      col("company_id"),
      col("pts").as("effective_timestamp"))
    Scd2.scd2(base, Seq("company_id"), "effective_timestamp")
  }

  /** models/silver/securities.sql — FINWIRE SEC + dual-key temporal join
    * to companies, SCD2 by symbol. The SEC record's own `name` (security
    * display name) is kept distinct from the matched company's name.
    */
  def securities(secTyped: DataFrame, companies: DataFrame): DataFrame = {
    val s = secTyped
      .withColumnRenamed("name", "__sec_name")
      .withColumnRenamed("company_name", "__sec_co_name")
    val joined = TemporalJoin.dualKeyTemporalJoin(s,
      companies.select("company_id", "name", "effective_timestamp", "end_timestamp"),
      (col("cik"), d => d("__k1_company_id")),
      (col("__sec_co_name"), d => d("__k2_name")),
      col("pts"), attrs = Seq("name", "company_id"))
    val base = joined.select(
      col("symbol"), col("issue_type"),
      when(col("status") === "ACTV", "Active")
        .when(col("status") === "INAC", "Inactive").as("status"),
      col("__sec_name").as("name"),
      col("ex_id").as("exchange_id"),
      col("sh_out").as("shares_outstanding"),
      col("first_trade_date"), col("first_exchange_date"), col("dividend"),
      col("name").as("company_name"), col("company_id"), col("pts"))
    Scd2.scd2(base, Seq("symbol"), "pts").drop("pts")
  }

  /** models/silver/trades_history.sql — 5-way join (trade ⋈ trade_history
    * ⋈ trade_type ⋈ status_type ×2 role-playing) then SCD2 by trade_id
    * over the history timestamps.
    *
    * `update_status` breaks th_dts ties (SURVEY §7.4.3): the reference
    * SQL orders only by the timestamp, so two status rows sharing a
    * th_dts slot into versions nondeterministically — harmless to the
    * downstream fact (tie-insensitive aggregates) but it makes the
    * model's own output layout-dependent, which broke the q47
    * incremental-vs-full comparison on real tied data. Tied rows with
    * EQUAL status are identical payloads, so the output multiset is
    * fully deterministic with this one extra sort column.
    */
  def tradesHistory(trade: DataFrame, tradeHistory: DataFrame,
                    tradeType: DataFrame, statusType: DataFrame): DataFrame = {
    val tt = broadcast(tradeType.select(col("tt_id"), col("tt_name")))
    val ts = broadcast(statusType.select(col("st_id").as("__ts_id"),
      col("st_name").as("trade_status")))
    val us = broadcast(statusType.select(col("st_id").as("__us_id"),
      col("st_name").as("update_status")))
    val base = trade
      .join(tradeHistory, col("t_id") === col("th_t_id"))
      .join(tt, col("t_tt_id") === col("tt_id"))
      .join(ts, col("t_st_id") === col("__ts_id"))
      .join(us, col("th_st_id") === col("__us_id"))
      .select(
        col("t_id").as("trade_id"),
        col("t_dts").as("trade_timestamp"),
        col("t_ca_id").as("account_id"),
        col("trade_status"),
        col("tt_name").as("trade_type"),
        when(col("t_is_cash") === true, "Cash")
          .when(col("t_is_cash") === false, "Margin").as("transaction_type"),
        col("t_s_symb").as("symbol"),
        col("t_exec_name").as("executor_name"),
        col("t_qty").as("quantity"),
        col("t_bid_price").as("bid_price"),
        col("t_trade_price").as("trade_price"),
        col("t_chrg").as("fee"),
        col("t_comm").as("commission"),
        col("t_tax").as("tax"),
        col("update_status"),
        col("th_dts"))
    Scd2.scd2(base, Seq("trade_id"), "th_dts",
      tieBreak = Seq("update_status")).drop("th_dts")
  }

  /** models/silver/trades.sql — distinct trade-grain rows with
    * whole-partition create/close timestamps (W4; window BEFORE distinct,
    * SURVEY §7.4.4).
    */
  def trades(tradesHistory: DataFrame): DataFrame =
    Windows.overPartition(
      tradesHistory.select(
        col("trade_id"), col("account_id"), col("trade_status"),
        col("trade_type"), col("transaction_type"), col("symbol"),
        col("executor_name"), col("quantity"), col("bid_price"),
        col("trade_price"), col("fee"), col("commission"), col("tax"),
        col("effective_timestamp")),
      Seq(col("trade_id")),
      "create_timestamp" -> min(col("effective_timestamp")),
      "close_timestamp" -> max(col("effective_timestamp")))
      .drop("effective_timestamp")
      .distinct()

  /** models/silver/cash_transactions.sql — temporal join of the cash
    * ledger to SCD2 accounts (J4, the canonical site).
    *
    * @param skewSalts 0 (default) = plain temporal join, AQE handles
    *                  moderate skew. > 0 = route through
    *                  [[SkewJoin.saltedJoin]]: the ledger side is salted
    *                  and the account dim replicated ×salts, for
    *                  power-law account activity (one robo-trading
    *                  account carrying a large share of the ledger)
    *                  where one shuffle partition would otherwise
    *                  receive the hot account's entire volume.
    *                  Result-equality with the plain path is oracle-
    *                  gated (q31).
    */
  def cashTransactions(cashTransaction: DataFrame, accounts: DataFrame,
                       skewSalts: Int = 0): DataFrame = {
    val t = cashTransaction.select(
      col("ct_ca_id").as("account_id"),
      col("ct_dts").as("transaction_timestamp"),
      col("ct_amt").as("amount"),
      col("ct_name").as("description"))
    val a = accounts.select(col("account_id").as("__a_account_id"),
      col("customer_id"), col("effective_timestamp"), col("end_timestamp"))
    val joined =
      if (skewSalts > 0)
        SkewJoin.saltedJoin(t, a, t("account_id"), a("__a_account_id"),
          salts = skewSalts,
          extra = t("transaction_timestamp")
            .between(a("effective_timestamp"), a("end_timestamp")))
      else TemporalJoin.temporalJoin(t, a, t("account_id"), a("__a_account_id"),
        t("transaction_timestamp"))
    joined
      .select("customer_id", "account_id", "transaction_timestamp",
        "amount", "description")
  }

  /** models/silver/daily_market.sql — rolling 52-week (ROWS-based, W3)
    * high/low, extremum-date recovery via range self-join (J9), tie dedup
    * via QUALIFY (W7/P9).
    */
  def dailyMarket(brokerageDailyMarket: DataFrame): DataFrame = {
    val s1 = Windows.rolling(brokerageDailyMarket,
      Seq(col("dm_s_symb")), Seq(col("dm_date")), precedingRows = 364,
      "fifty_two_week_low" -> min(col("dm_low")),
      "fifty_two_week_high" -> max(col("dm_high")))
    // extremum-date branches need only raw columns: derive them from the
    // pre-window scan so the rolling Window runs once, not three times
    // (the reference's s1 self-join relies on the same pruning)
    val b = brokerageDailyMarket.select(col("dm_s_symb").as("__b_symb"),
      col("dm_date").as("__b_date"), col("dm_low").as("__b_low"))
    val c = brokerageDailyMarket.select(col("dm_s_symb").as("__c_symb"),
      col("dm_date").as("__c_date"), col("dm_high").as("__c_high"))
    val s2 = s1
      .join(b, col("dm_s_symb") === col("__b_symb") &&
        col("fifty_two_week_low") === col("__b_low") &&
        col("__b_date").between(add_months(col("dm_date"), -12), col("dm_date")))
      .join(c, col("dm_s_symb") === col("__c_symb") &&
        col("fifty_two_week_high") === col("__c_high") &&
        col("__c_date").between(add_months(col("dm_date"), -12), col("dm_date")))
      .withColumn("fifty_two_week_low_date", col("__b_date"))
      .withColumn("fifty_two_week_high_date", col("__c_date"))
      .drop("__b_symb", "__b_date", "__b_low", "__c_symb", "__c_date", "__c_high")
    Dialect.qualifyRowNumber(s2,
      Seq(col("dm_s_symb"), col("dm_date")),
      Seq(col("fifty_two_week_low_date"), col("fifty_two_week_high_date")))
  }

  /** Flagged fast path for [[dailyMarket]]: recovers the extremum dates
    * with min_by/max_by in the SAME single rolling-window pass instead
    * of the value-equality self-join. The parity path is quadratic per
    * (symbol, extremum-value) tie group — a flat price series shares
    * one 52-week low across many days and fans out before the QUALIFY
    * dedup, the chain's most likely blowup at 100x scale. This path is
    * one Exchange+Sort+Window total (four aggregates share the frame).
    *
    * Semantics vs the reference-parity path (why it is a separate
    * method, not a replacement — see PLANS.md):
    *   - extremum dates come from the 364-ROW frame on BOTH value and
    *     date, while the parity self-join searches the trailing
    *     CALENDAR year for the date; they coincide on dense daily
    *     series (the reference's data shape) and on any window where
    *     the frame spans <= 12 calendar months.
    *   - on value ties both resolve to the earliest date (min_by keeps
    *     the first minimum in frame order; QUALIFY sorts dates asc),
    *     but min_by's choice is evaluation-order-dependent by contract,
    *     so equality is gated on tie-free data (q30).
    */
  def dailyMarketFast(brokerageDailyMarket: DataFrame): DataFrame =
    Windows.rolling(brokerageDailyMarket,
      Seq(col("dm_s_symb")), Seq(col("dm_date")), precedingRows = 364,
      "fifty_two_week_low" -> min(col("dm_low")),
      "fifty_two_week_high" -> max(col("dm_high")),
      "fifty_two_week_low_date" -> min_by(col("dm_date"), col("dm_low")),
      "fifty_two_week_high_date" -> max_by(col("dm_date"), col("dm_high")))

  /** models/silver/watches_history.sql — watch action log + securities
    * attributes (join USING symbol, J7).
    */
  def watchesHistory(watchHistory: DataFrame, securities: DataFrame): DataFrame = {
    val s1 = watchHistory.select(
      col("w_c_id").as("customer_id"),
      col("w_s_symb").as("symbol"),
      col("w_dts").as("watch_timestamp"),
      when(col("w_action") === "ACTV", "Activate")
        .when(col("w_action") === "CNCL", "Cancelled").as("action_type"))
    val s = securities.select(col("symbol"), col("company_id"),
      col("company_name"), col("exchange_id"),
      col("status").as("security_status"))
    s1.join(s, Seq("symbol"))
  }

  /** models/silver/watches.sql — collapse the watch log to one row per
    * watch with placed/removed timestamps (A2 GROUP BY ALL + min/max).
    */
  def watches(watchesHistory: DataFrame): DataFrame = {
    val s1 = watchesHistory.select(
      col("customer_id"), col("symbol"), col("company_id"),
      col("company_name"), col("exchange_id"), col("security_status"),
      when(col("action_type") === "Activate", col("watch_timestamp"))
        .as("placed_timestamp"),
      when(col("action_type") === "Cancelled", col("watch_timestamp"))
        .as("removed_timestamp"))
    s1.groupBy("customer_id", "symbol", "company_id", "company_name",
        "exchange_id", "security_status")
      .agg(min("placed_timestamp").as("placed_timestamp"),
        max("removed_timestamp").as("removed_timestamp"))
      .withColumn("watch_status",
        when(col("removed_timestamp").isNull, "Active").otherwise("Inactive"))
  }

  /** models/silver/holdings_history.sql — holding events + trade
    * attributes (join USING trade_id, J7).
    */
  def holdingsHistory(holdingHistory: DataFrame, trades: DataFrame): DataFrame = {
    val s1 = holdingHistory.select(
      col("hh_t_id").as("trade_id"),
      col("hh_h_t_id").as("previous_trade_id"),
      col("hh_before_qty").as("previous_quantity"),
      col("hh_after_qty").as("quantity"))
    val ct = trades.select(col("trade_id"), col("account_id"), col("symbol"),
      col("create_timestamp"), col("close_timestamp"), col("trade_price"),
      col("bid_price"), col("fee"), col("commission"))
    s1.join(ct, Seq("trade_id"))
  }
}
