package graft.models

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end DAG test: tiny literal fixtures for all 17 sources pushed
  * through every silver and gold model, asserting the reference's
  * semantics (SCD2 chains, temporal lookups, gap-fill, surrogate-key
  * uniqueness — tests/fact_trade__unique_trade.sql).
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val crmSchema = StructType(Seq(
    StructField("action_ts", TimestampType), StructField("action_type", StringType),
    StructField("c_id", LongType), StructField("c_tax_id", StringType),
    StructField("c_gndr", StringType), StructField("c_tier", LongType),
    StructField("c_dob", DateType), StructField("c_l_name", StringType),
    StructField("c_f_name", StringType), StructField("c_m_name", StringType),
    StructField("c_adline1", StringType), StructField("c_adline2", StringType),
    StructField("c_zipcode", StringType), StructField("c_city", StringType),
    StructField("c_state_prov", StringType), StructField("c_ctry", StringType),
    StructField("c_prim_email", StringType), StructField("c_alt_email", StringType),
    StructField("c_phone_1", StringType), StructField("c_phone_2", StringType),
    StructField("c_phone_3", StringType), StructField("c_lcl_tx_id", StringType),
    StructField("c_nat_tx_id", StringType), StructField("ca_id", StringType),
    StructField("ca_tax_st", LongType), StructField("ca_b_id", LongType),
    StructField("ca_name", StringType)))

  private def crm(vals: (String, Any)*): Row = {
    val m = vals.toMap
    Row.fromSeq(crmSchema.fields.map(f => m.getOrElse(f.name, null)).toSeq)
  }

  private lazy val wh: Warehouse = {
    val customerMgmt = spark.createDataFrame(
      java.util.Arrays.asList(
        crm("action_ts" -> ts("2020-01-05 09:00:00"), "action_type" -> "NEW",
          "c_id" -> 42L, "c_tax_id" -> "TX42", "c_gndr" -> "F", "c_tier" -> 2L,
          "c_dob" -> d("1986-04-11"), "c_l_name" -> "Doe", "c_f_name" -> "Jane",
          "c_adline1" -> "1 Elm St", "c_zipcode" -> "94105", "c_city" -> "SF",
          "c_state_prov" -> "CA", "c_ctry" -> "USA", "c_prim_email" -> "j@x.com",
          "c_lcl_tx_id" -> "CA1", "c_nat_tx_id" -> "US1",
          "ca_id" -> "7", "ca_tax_st" -> 1L, "ca_b_id" -> 1L, "ca_name" -> "Main"),
        crm("action_ts" -> ts("2020-03-01 09:00:00"), "action_type" -> "UPDCUST",
          "c_id" -> 42L, "c_city" -> "Oakland"),  // sparse update: rest null
        crm("action_ts" -> ts("2020-04-01 09:00:00"), "action_type" -> "ADDACCT",
          "c_id" -> 42L, "ca_id" -> "8", "ca_tax_st" -> 2L, "ca_b_id" -> 1L,
          "ca_name" -> "Second"),
        crm("action_ts" -> ts("2020-01-06 09:00:00"), "action_type" -> "NEW",
          "c_id" -> 43L, "c_tax_id" -> "TX43", "c_gndr" -> "M", "c_tier" -> 1L,
          "c_dob" -> d("1990-01-01"), "c_l_name" -> "Roe", "c_f_name" -> "Rick",
          "c_adline1" -> "2 Oak St", "c_zipcode" -> "10001", "c_city" -> "NYC",
          "c_state_prov" -> "NY", "c_ctry" -> "USA",
          "c_lcl_tx_id" -> "CA1", "c_nat_tx_id" -> "US1",
          "ca_id" -> "9", "ca_tax_st" -> 1L, "ca_b_id" -> 1L, "ca_name" -> "Solo")),
      crmSchema)

    // FINWIRE raw extracts via the real fixed-width parser
    val pad = (s: String, n: Int) => s.padTo(n, ' ')
    def cmpLine(ptsS: String, name: String, cik: String) =
      pad(ptsS, 15) + "CMP" + pad(name, 60) + pad(cik, 10) + pad("ACTV", 4) +
        "AB" + pad("AAA", 4) + pad("19870105", 8) + pad("1 Main St", 80) +
        pad("", 80) + pad("94105", 12) + pad("SF", 25) + pad("CA", 20) +
        pad("USA", 24) + pad("Jane Doe", 46) + pad("Stuff", 150)
    def secLine(ptsS: String, sym: String, cik: String) =
      pad(ptsS, 15) + "SEC" + pad(sym, 15) + pad("COMMON", 6) + pad("ACTV", 4) +
        pad(s"$sym Common", 70) + pad("NYSE", 6) + pad("1000000", 13) +
        pad("19870106", 8) + pad("19870107", 8) + pad("0.42", 12) + pad(cik, 60)
    def finLine(ptsS: String, q: String, qStart: String, eps: String, cik: String) =
      pad(ptsS, 15) + "FIN" + "2020" + q + pad(qStart, 8) + pad("20200315", 8) +
        pad("1000000.5", 17) + pad("250000.25", 17) + pad(eps, 12) +
        pad("1.20", 12) + pad("0.25", 12) + pad("50000", 17) + pad("2000000", 17) +
        pad("750000", 17) + pad("1000000", 13) + pad("1050000", 13) + pad(cik, 60)
    val finwire = Finwire.parsePrefix(Seq(
      cmpLine("20200101-090000", "Acme Corporation", "0000012345"),
      cmpLine("20200601-090000", "Acme Corporation", "0000012345"),
      secLine("20200201-090000", "ACME", "0000012345"),
      finLine("20200315-170000", "1", "20200101", "1.25", "0000012345"),
      finLine("20200620-170000", "2", "20200401", "1.10", "0000012345"))
      .toDF("value"))

    new Warehouse(Map(
      "cash_transaction" -> Seq(
        (7L, ts("2020-03-15 12:00:00"), 100.0, "deposit"),
        (7L, ts("2020-03-15 13:00:00"), -40.0, "withdrawal"))
        .toDF("ct_ca_id", "ct_dts", "ct_amt", "ct_name"),
      "daily_market" -> Seq(
        (d("2020-03-02"), "ACME", 10.0, 11.0, 9.0, 1000.0),
        (d("2020-03-03"), "ACME", 10.5, 12.0, 10.0, 1100.0),
        (d("2020-03-04"), "ACME", 11.0, 12.5, 8.5, 1200.0),
        (d("2020-03-05"), "ACME", 11.5, 13.0, 10.5, 1300.0),
        (d("2020-03-06"), "ACME", 12.0, 14.0, 11.0, 1400.0))
        .toDF("dm_date", "dm_s_symb", "dm_close", "dm_high", "dm_low", "dm_vol"),
      "holding_history" -> Seq((100L, 100L, 0.0, 10.0), (100L, 101L, 10.0, 5.0))
        .toDF("hh_h_t_id", "hh_t_id", "hh_before_qty", "hh_after_qty"),
      "trade" -> Seq(
        (100L, ts("2020-03-10 10:00:00"), "CMPT", "TMB", true, "ACME", 10.0,
          9.5, 7L, "Jane Doe", 10.1, 1.0, 0.5, 0.2),
        (101L, ts("2020-03-11 10:00:00"), "CNCL", "TMS", false, "ACME", 5.0,
          11.0, 7L, "Jane Doe", 0.0, 1.0, 0.5, 0.0))
        .toDF("t_id", "t_dts", "t_st_id", "t_tt_id", "t_is_cash", "t_s_symb",
          "t_qty", "t_bid_price", "t_ca_id", "t_exec_name", "t_trade_price",
          "t_chrg", "t_comm", "t_tax"),
      "trade_history" -> Seq(
        (100L, ts("2020-03-10 10:00:00"), "SBMT"),
        (100L, ts("2020-03-10 11:00:00"), "CMPT"),
        (101L, ts("2020-03-11 10:00:00"), "SBMT"),
        (101L, ts("2020-03-11 11:00:00"), "CNCL"))
        .toDF("th_t_id", "th_dts", "th_st_id"),
      "watch_history" -> Seq(
        (42L, "ACME", ts("2020-02-10 09:00:00"), "ACTV"),
        (42L, "ACME", ts("2020-05-01 09:00:00"), "CNCL"),
        (43L, "ACME", ts("2020-02-15 09:00:00"), "ACTV"))
        .toDF("w_c_id", "w_s_symb", "w_dts", "w_action"),
      "customer_mgmt" -> customerMgmt,
      "cmp" -> Finwire.cmp(finwire),
      "sec" -> Finwire.sec(finwire),
      "fin" -> Finwire.fin(finwire),
      "hr" -> Seq((1, 0, "Bob", "Broker", "B", 314, "HQ", "1F", "555"))
        .toDF("employee_id", "manager_id", "employee_first_name",
          "employee_last_name", "employee_mi", "employee_job_code",
          "employee_branch", "employee_office", "employee_phone"),
      "date" -> Seq((20200302, d("2020-03-02"), "March 2, 2020", 2020))
        .toDF("sk_date_id", "date_value", "date_desc", "calendar_year_id"),
      "industry" -> Seq(("AB", "Airlines", "SC1"))
        .toDF("in_id", "in_name", "in_sc_id"),
      "status_type" -> Seq(("ACTV", "Active"), ("CMPT", "Completed"),
        ("CNCL", "Canceled"), ("PNDG", "Pending"), ("SBMT", "Submitted"),
        ("INAC", "Inactive")).toDF("st_id", "st_name"),
      "tax_rate" -> Seq(("US1", "US Federal", 0.30), ("CA1", "California", 0.10))
        .toDF("tx_id", "tx_name", "tx_rate"),
      "trade_type" -> Seq(("TMB", "Market Buy", false, true),
        ("TMS", "Market Sell", true, true)).toDF(
        "tt_id", "tt_name", "tt_is_sell", "tt_is_market"),
      "prospect" -> Seq(("AG1", "Roe", "Rick", "P", "M", "2 Oak St", null,
        "10001", "NYC", "NY", "USA", "555", 90000, 1, 0, "S", 36, 720, "O",
        "ACME", 3, 500000L))
        .toDF("agency_id", "last_name", "first_name", "middle_initial",
          "gender", "address_line1", "address_line2", "postal_code", "city",
          "state", "country", "phone", "income", "number_cars",
          "number_children", "marital_status", "age", "credit_rating",
          "own_or_rent_flag", "employer", "number_credit_cards", "net_worth")))
  }

  test("silver accounts: one SCD2 version per account action, ca filter") {
    val a = wh.accounts.orderBy("account_id").collect()
    a.length shouldBe 3 // ca 7 (NEW), 8 (ADDACCT), 9 (NEW); UPDCUST has null ca
    a.map(_.getAs[String]("account_id")) shouldBe Array("7", "8", "9")
    all(a.map(_.getAs[Boolean]("is_current"))) shouldBe true
    a(0).getAs[Double]("national_tax_rate") shouldBe 0.30
    a(0).getAs[Double]("local_tax_rate") shouldBe 0.10
    a(0).getAs[String]("status") shouldBe "Active"
  }

  test("silver customers: NEW/UPDCUST only, SCD2 chain closes v1") {
    val c42 = wh.customers.filter($"customer_id" === 42).orderBy("effective_timestamp").collect()
    c42.length shouldBe 2
    c42(0).getAs[java.sql.Timestamp]("end_timestamp") shouldBe ts("2020-03-01 08:59:59.999")
    c42(0).getAs[Boolean]("is_current") shouldBe false
    c42(1).getAs[Boolean]("is_current") shouldBe true
  }

  test("silver companies: 2 SCD2 versions from 2 CMP records") {
    val c = wh.companies.orderBy("effective_timestamp").collect()
    c.length shouldBe 2
    c(0).getAs[Long]("company_id") shouldBe 12345L
    c(0).getAs[String]("name") shouldBe "Acme Corporation" // trimmed
    c(0).getAs[String]("industry") shouldBe "Airlines"
    c(0).getAs[String]("status") shouldBe "Active"
    c(0).getAs[java.sql.Timestamp]("end_timestamp") shouldBe ts("2020-06-01 08:59:59.999")
    c(1).getAs[Boolean]("is_current") shouldBe true
  }

  test("silver securities + financials: dual-key temporal match by cik") {
    val s = wh.securities.collect()
    s.length shouldBe 1
    s(0).getAs[Long]("company_id") shouldBe 12345L
    s(0).getAs[String]("company_name") shouldBe "Acme Corporation"
    s(0).getAs[String]("name") shouldBe "ACME Common" // SEC's own name survives
    val f = wh.financials.orderBy("quarter").collect()
    f.length shouldBe 2
    f(0).getAs[Long]("company_id") shouldBe 12345L
    f(0).getAs[Double]("eps") shouldBe 1.25
    f(1).getAs[Boolean]("is_current") shouldBe true
  }

  test("silver trades_history/trades: 5-way join + W4 create/close") {
    wh.tradesHistory.count() shouldBe 4
    val t = wh.trades.orderBy("trade_id").collect()
    t.length shouldBe 2
    t(0).getAs[java.sql.Timestamp]("create_timestamp") shouldBe ts("2020-03-10 10:00:00")
    t(0).getAs[java.sql.Timestamp]("close_timestamp") shouldBe ts("2020-03-10 11:00:00")
    t(0).getAs[String]("trade_status") shouldBe "Completed"
    t(0).getAs[String]("transaction_type") shouldBe "Cash"
    t(1).getAs[String]("transaction_type") shouldBe "Margin"
  }

  test("silver cash_transactions resolves customer via temporal account") {
    val ct = wh.cashTransactions.orderBy("transaction_timestamp").collect()
    ct.length shouldBe 2
    all(ct.map(_.getAs[Long]("customer_id"))) shouldBe 42L
  }

  test("silver daily_market: 52wk extremes with dates, deduped") {
    val dm = wh.dailyMarket.orderBy("dm_date").collect()
    dm.length shouldBe 5
    dm(4).getAs[Double]("fifty_two_week_high") shouldBe 14.0
    dm(4).getAs[java.sql.Date]("fifty_two_week_high_date") shouldBe d("2020-03-06")
    dm(4).getAs[Double]("fifty_two_week_low") shouldBe 8.5
    dm(4).getAs[java.sql.Date]("fifty_two_week_low_date") shouldBe d("2020-03-04")
  }

  test("silver watches: one row per watch with placed/removed + status") {
    val w = wh.watches.orderBy("customer_id").collect()
    w.length shouldBe 2
    w(0).getAs[String]("watch_status") shouldBe "Inactive"  // c42 cancelled
    w(1).getAs[String]("watch_status") shouldBe "Active"    // c43 open
    w(0).getAs[java.sql.Timestamp]("placed_timestamp") shouldBe ts("2020-02-10 09:00:00")
    w(0).getAs[java.sql.Timestamp]("removed_timestamp") shouldBe ts("2020-05-01 09:00:00")
  }

  test("gold dim_customer: gap-fill carries city forward, prospect match") {
    val v = wh.dimCustomer.filter($"customer_id" === 42)
      .orderBy("effective_timestamp").collect()
    v.length shouldBe 2
    v(1).getAs[String]("city") shouldBe "Oakland"
    v(1).getAs[String]("last_name") shouldBe "Doe"   // filled from v1
    v(1).getAs[Long]("tier") shouldBe 2L             // filled from v1
    // prospect enrichment matched for customer 43 (5-col USING with nulls
    // on address_line2 fails equality — reference semantics; 43 has
    // non-null line1 but null line2 on both sides -> no match either)
    val p42 = wh.dimCustomer.filter($"customer_id" === 42).collect()
    all(p42.map(_.isNullAt(p42.head.fieldIndex("net_worth")))) shouldBe true
  }

  test("gold dims: surrogate keys unique") {
    Seq(wh.dimAccount -> "sk_account_id", wh.dimCustomer -> "sk_customer_id",
      wh.dimCompany -> "sk_company_id", wh.dimSecurity -> "sk_security_id",
      wh.dimTrade -> "sk_trade_id", wh.dimBroker -> "sk_broker_id")
      .foreach { case (df, k) =>
        df.groupBy(k).count().filter($"count" > 1).count() shouldBe 0L
      }
  }

  test("gold fact_trade: one row per trade, all SKs resolved; uniqueness test") {
    val ft = wh.factTrade.orderBy("sk_create_date").collect()
    ft.length shouldBe 2
    ft.foreach { r =>
      r.isNullAt(r.fieldIndex("sk_trade_id")) shouldBe false
      r.isNullAt(r.fieldIndex("sk_account_id")) shouldBe false
      r.isNullAt(r.fieldIndex("sk_customer_id")) shouldBe false
      r.isNullAt(r.fieldIndex("sk_security_id")) shouldBe false
      r.isNullAt(r.fieldIndex("sk_broker_id")) shouldBe false
    }
    wh.uniqueTradeViolations.count() shouldBe 0L
  }

  test("gold fact_cash_balances aggregates per day/account") {
    val b = wh.factCashBalances.collect()
    b.length shouldBe 2 // two descriptions
    b.map(_.getAs[Double]("amount")).sorted shouldBe Array(-40.0, 100.0)
  }

  test("gold fact_holdings: current+previous trade SKs resolve") {
    val fh = wh.factHoldings.orderBy("trade_timestamp").collect()
    fh.length should be >= 2 // 2 holding events (x dim_trade versions)
    fh.foreach { r =>
      r.isNullAt(r.fieldIndex("sk_current_trade_id")) shouldBe false
      r.isNullAt(r.fieldIndex("sk_trade_id")) shouldBe false
    }
  }

  test("gold fact_watches + fact_market_history resolve temporal lookups") {
    wh.factWatches.count() shouldBe 2
    val fmh = wh.factMarketHistory.orderBy("sk_date_id").collect()
    fmh.length shouldBe 5
    fmh(0).getAs[Double]("yield") shouldBe (0.42 / 10.0) / 100 +- 1e-12
    val wf = wh.wrkCompanyFinancials.orderBy("quarter_start_date").collect()
    wf.length shouldBe 2
    wf(0).getAs[Double]("sum_basic_eps") shouldBe 0.0  // first quarter: no priors
    wf(1).getAs[Double]("sum_basic_eps") shouldBe 1.25
  }

  test("applyBatch2: warehouse-level incremental refresh == full rebuild") {
    // Split the CRM action log and the trade stream at a cutoff that
    // leaves real work on both sides: batch2 carries the ADDACCT action
    // (a new account entity) and trade 101 with its full history, while
    // batch1 keeps customer NEW/UPDCUST versions and trade 100.
    val cutoff = ts("2020-03-11 00:00:00")
    val src = wh.sources
    val b1 = src ++ Map(
      "customer_mgmt" -> src("customer_mgmt").filter($"action_ts" < cutoff),
      "trade" -> src("trade").filter($"t_dts" < cutoff),
      "trade_history" -> src("trade_history").filter($"th_dts" < cutoff),
      "cash_transaction" -> src("cash_transaction").filter($"ct_dts" < cutoff))
    val b2 = Map(
      "customer_mgmt" -> src("customer_mgmt").filter($"action_ts" >= cutoff),
      "trade" -> src("trade").filter($"t_dts" >= cutoff),
      "trade_history" -> src("trade_history").filter($"th_dts" >= cutoff),
      "cash_transaction" -> src("cash_transaction").filter($"ct_dts" >= cutoff))
    val refreshed = Warehouse.applyBatch2(new Warehouse(b1), b2)
    val full = wh.all.toMap
    for (m <- allStreamModels) {
      withClue(s"model $m: ") {
        val f = full(m)
        val inc = refreshed(m).select(f.columns.map(col): _*)
        inc.exceptAll(f).count() shouldBe 0L
        f.exceptAll(inc).count() shouldBe 0L
        inc.count() shouldBe f.count()
      }
    }
  }

  private def slice3(cut1: java.sql.Timestamp, cut2: java.sql.Timestamp) = {
    val src = wh.sources
    def in(tsc: String, t: DataFrame, lo: Option[java.sql.Timestamp],
           hi: Option[java.sql.Timestamp]) = {
      val loF = lo.map(c => t.filter(col(tsc) >= c)).getOrElse(t)
      hi.map(c => loF.filter(col(tsc) < c)).getOrElse(loF)
    }
    val tsCols = Map("customer_mgmt" -> "action_ts", "trade" -> "t_dts",
      "trade_history" -> "th_dts", "cash_transaction" -> "ct_dts",
      "watch_history" -> "w_dts", "daily_market" -> "dm_date",
      "cmp" -> "pts", "sec" -> "pts", "fin" -> "pts")
    def slice(lo: Option[java.sql.Timestamp], hi: Option[java.sql.Timestamp]) = {
      val m = tsCols.map { case (k, c) => k -> in(c, src(k), lo, hi) }
      // holding events ride their trade's batch (no timestamp of their own)
      m + ("holding_history" -> src("holding_history").join(
        m("trade").select(col("t_id").as("hh_t_id")), Seq("hh_t_id"), "left_semi"))
    }
    val b1 = src ++ slice(None, Some(cut1))
    val b2 = slice(Some(cut1), Some(cut2))
    val b3 = slice(Some(cut2), None)
    (b1, b2, b3)
  }

  private val allStreamModels = Seq("accounts", "customers", "dim_customer",
    "dim_account", "trades_history", "trades", "dim_trade", "fact_trade",
    "cash_transactions", "fact_cash_transactions", "fact_cash_balances",
    "watches_history", "watches", "fact_watches", "daily_market",
    "fact_market_history", "holdings_history", "fact_holdings",
    "companies", "dim_company", "securities", "dim_security", "financials")

  test("applyBatch chaining: b2 then b3 == full rebuild over b1∪b2∪b3") {
    // Three-way split with real work in every step: b2 carries the
    // UPDCUST action (a new customer version closing v1) and both
    // trades with their histories; b3 carries the ADDACCT action (a new
    // account entity minted on an already-merged dim) and the cash
    // transactions. Batch3's SCD2 merge must read versions batch2's
    // merge minted, and its cash chain must join the twice-merged
    // account dim.
    val (b1, b2, b3) = slice3(ts("2020-03-01 00:00:00"), ts("2020-03-15 00:00:00"))
    // sanity: each batch is non-empty for the spine it claims to touch
    b2("customer_mgmt").count() shouldBe 1  // UPDCUST
    b2("trade").count() shouldBe 2
    b2("daily_market").count() shouldBe 5   // all market days
    b2("holding_history").count() shouldBe 2 // ride trades 100/101
    b3("customer_mgmt").count() shouldBe 1  // ADDACCT
    b3("cash_transaction").count() shouldBe 2
    b3("watch_history").count() shouldBe 1  // the CNCL action
    b3("cmp").count() shouldBe 1            // the June company version
    b3("fin").count() shouldBe 2            // both quarterly records
    val chained = Warehouse.applyBatch(
      Warehouse.applyBatch(new Warehouse(b1), b2), b3).all.toMap
    val full = wh.all.toMap
    for (m <- allStreamModels) {
      withClue(s"model $m: ") {
        val f = full(m)
        val inc = chained(m).select(f.columns.map(col): _*)
        inc.exceptAll(f).count() shouldBe 0L
        f.exceptAll(inc).count() shouldBe 0L
        inc.count() shouldBe f.count()
      }
    }
  }

  test("streaming merge-on-arrival == batch applyBatch2 == full rebuild") {
    // The composition gate: replaying batch2's CRM actions as TWO
    // micro-batch arrivals through StreamingScd2.mergeScd2OnArrival
    // must leave the accounts and customers dims equal to (a) the batch
    // applyBatch2 merge and (b) a clean full rebuild — the streaming
    // path and the batch path are the same merge kernel fed at
    // different granularity, and this pins it three ways.
    val cutoff = ts("2020-02-01 00:00:00")
    val src = wh.sources
    val crmB2 = src("customer_mgmt").filter($"action_ts" >= cutoff)
    val wh1 = new Warehouse(
      src + ("customer_mgmt" -> src("customer_mgmt").filter($"action_ts" < cutoff)))
    val refreshed = Warehouse.applyBatch2(wh1, Map("customer_mgmt" -> crmB2))
    val full = wh.all.toMap
    // arrival waves: UPDCUST (2020-03-01) then ADDACCT (2020-04-01)
    val wave1 = crmB2.filter($"action_ts" < ts("2020-03-15 00:00:00"))
    val wave2 = crmB2.filter($"action_ts" >= ts("2020-03-15 00:00:00"))
    wave1.count() shouldBe 1
    wave2.count() shouldBe 1
    val root = java.nio.file.Files.createTempDirectory("streamwh")
    val cases = Seq(
      ("accounts", Seq("account_id"), wh1.accounts,
        (crm: DataFrame) => Silver.accountsBase(crm, src("tax_rate"))),
      ("customers", Seq("customer_id"), wh1.customers,
        (crm: DataFrame) => Silver.customersBase(crm, src("tax_rate"))))
    for ((name, idCols, seed, baseOf) <- cases) {
      val dimDir = root.resolve(s"${name}_dim").toString
      val chDir = root.resolve(s"${name}_changes").toString
      val chk = root.resolve(s"${name}_chk").toString
      seed.write.parquet(dimDir)
      val base1 = baseOf(wave1)
      base1.write.mode("append").parquet(chDir)
      graft.streaming.StreamingScd2.mergeScd2OnArrival(spark, chDir,
        base1.schema, dimDir, idCols, "action_ts", chk)
      baseOf(wave2).write.mode("append").parquet(chDir)
      graft.streaming.StreamingScd2.mergeScd2OnArrival(spark, chDir,
        base1.schema, dimDir, idCols, "action_ts", chk)
      val got = spark.read.parquet(dimDir)
      for ((label, target) <- Seq("full rebuild" -> full(name),
          "applyBatch2" -> refreshed(name))) {
        withClue(s"$name vs $label: ") {
          val t = target.select(got.columns.map(col): _*)
          got.exceptAll(t).count() shouldBe 0L
          t.exceptAll(got).count() shouldBe 0L
          got.count() shouldBe t.count()
        }
      }
    }
  }

  test("applyBatch factPart: partition-scoped fact merge == whole-table merge") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-factpart").toString
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val cutoff = ts("2020-03-11 00:00:00")
      val src = wh.sources
      val b1 = src ++ Map(
        "customer_mgmt" -> src("customer_mgmt").filter($"action_ts" < cutoff),
        "trade" -> src("trade").filter($"t_dts" < cutoff),
        "trade_history" -> src("trade_history").filter($"th_dts" < cutoff),
        "cash_transaction" -> src("cash_transaction").filter($"ct_dts" < cutoff))
      val b2 = Map(
        "trade" -> src("trade").filter($"t_dts" >= cutoff),
        "trade_history" -> src("trade_history").filter($"th_dts" >= cutoff))
      val pExpr = date_format(col("create_timestamp"), "yyyy-MM")
      // partitioned storage layout: the stored fact carries its grain
      // key and the (immutable) event-month partition column
      val wh1 = new Warehouse(b1)
      val factDir = s"$tmp/fact_trade"
      wh1.factTrade
        .join(wh1.dimTrade.select($"sk_trade_id", $"trade_id"), Seq("sk_trade_id"))
        .withColumn("p_month", pExpr)
        .write.mode("overwrite").partitionBy("p_month").parquet(factDir)
      val existing = new Warehouse(b1,
        overrides = Map("fact_trade" -> spark.read.parquet(factDir)))
      var factWrites = 0
      val mat: (String, DataFrame) => DataFrame = (name, df) =>
        if (name == "fact_trade") {
          factWrites += 1
          df.write.mode("overwrite").partitionBy("p_month").parquet(factDir)
          spark.read.parquet(factDir)
        } else df
      val refreshed = Warehouse.applyBatch(existing, b2, mat,
        factPart = Some(Warehouse.FactPartition("p_month", pExpr)))
      factWrites shouldBe 1
      val f = wh.factTrade
      val got = refreshed.factTrade.drop("trade_id", "p_month")
        .select(f.columns.map(col): _*)
      got.exceptAll(f).count() shouldBe 0L
      f.exceptAll(got).count() shouldBe 0L
      got.count() shouldBe f.count()
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }
}
