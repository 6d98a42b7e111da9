package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.models.{Dag, Loader, Warehouse}

/** Incremental-refresh benchmark: measures `Warehouse.applyBatch2`
  * against a full rebuild for a late trades batch over an
  * already-materialized Batch1 warehouse — the number behind the
  * "touch a few million late trades, not every fact input" claim.
  *
  * Setup (untimed): generate a DIGen-format Batch1
  * ([[WarehouseBench.generate]]), materialize all 44 models to parquet.
  * Batch2 delta: `deltaPct`% new trades (+2 history rows each) with
  * timestamps after the Batch1 watermark.
  *
  * Timed, both writing parquet:
  *  - FULL: rebuild all 44 models over batch1 ∪ batch2;
  *  - INCR: applyBatch2 against the parquet-backed Batch1 warehouse,
  *    writing only the models the delta reaches (Dag.downstream) —
  *    pass-throughs are already on disk, which is the point.
  *
  * Ends with an equality check: incremental fact_trade must match the
  * full rebuild's row count and full-row hash.
  *
  * Usage: runMain graft.Batch2Bench [nCust] [nTrades] [deltaPct] [workDir]
  */
object Batch2Bench {
  def main(args: Array[String]): Unit = {
    val nCust = args.headOption.map(_.toInt).getOrElse(20000)
    val nTrades = args.lift(1).map(_.toInt).getOrElse(100000)
    val deltaPct = args.lift(2).map(_.toInt).getOrElse(2)
    val work = args.lift(3).getOrElse("/tmp/graft-b2bench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    WarehouseBench.generate(s"$work/batch1", nCust, nTrades)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Let AQE re-optimize cached plans (off by default only to keep
      // cached output partitioning stable for RDD-level consumers,
      // which this engine has none of): without it every .cache()
      // materializes at the full shuffle-partition count and AQE can
      // never coalesce it, so each later stage over the cached relation
      // pays one fixed-cost task per configured partition regardless of
      // data size - measured ~20-50% of the components/LSH family's
      // task CPU at sf0.1, and at production scale it lets cached
      // relations coalesce to data-sized partitions the same way
      // un-cached shuffles already do.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def writeMat(dir: String): (String, DataFrame) => DataFrame =
      (name, df) => {
        df.write.mode("overwrite").parquet(s"$dir/$name")
        spark.read.parquet(s"$dir/$name")
      }

    // setup: materialized Batch1 warehouse (what a real deployment has
    // on disk when the late batch arrives)
    val b1Sources = Loader.loadAll(spark, s"$work/batch1")
    val wh1 = Warehouse.build(spark, b1Sources, s"$work/wh1")
    val wh1Tables = wh1.all.toMap

    // batch2: new late trades (+ their 2-row histories), ids disjoint
    // from batch1, timestamps past the batch1 watermark (2020-01-28)
    val nDelta = math.max(1, nTrades * deltaPct / 100)
    val nSym = math.max(nCust / 100, 10)
    val delta = spark.range(nTrades, nTrades.toLong + nDelta).select(
      col("id").as("t_id"),
      (lit("2020-02-01 11:00:00").cast("timestamp") +
        expr("make_interval(0,0,0,0,0,0, id % 86400)")).as("t_dts"),
      when(col("id") % 7 === 0, "CNCL").otherwise("CMPT").as("t_st_id"),
      when(col("id") % 2 === 0, "TMB").otherwise("TMS").as("t_tt_id"),
      (col("id") % 2 === 0).as("t_is_cash"),
      concat(lit("SYM"), col("id") % nSym).as("t_s_symb"),
      lit(10.0).as("t_qty"), lit(9.5).as("t_bid_price"),
      (col("id") % nCust).as("t_ca_id"),
      concat(lit("Exec "), col("id")).as("t_exec_name"),
      lit(10.1).as("t_trade_price"), lit(1.0).as("t_chrg"),
      lit(0.5).as("t_comm"), lit(0.2).as("t_tax"))
    val deltaTh = delta.select(col("t_id").as("th_t_id"),
        (col("t_dts") - expr("interval 1 hour")).as("th_dts"),
        lit("SBMT").as("th_st_id"))
      .unionByName(delta.select(col("t_id").as("th_t_id"),
        col("t_dts").as("th_dts"), col("t_st_id").as("th_st_id")))
    val batch2 = Map("trade" -> delta.cache(), "trade_history" -> deltaTh.cache())
    batch2.values.foreach(_.count()) // pin the delta outside the timings

    // FULL rebuild over batch1 ∪ batch2 — all 44 models to parquet
    val unioned = b1Sources.map { case (k, v) =>
      k -> batch2.get(k).map(v.unionByName(_)).getOrElse(v)
    }
    val tFull0 = System.nanoTime()
    Warehouse.build(spark, unioned, s"$work/wh_full")
    val fullSec = (System.nanoTime() - tFull0) / 1e9

    // INCREMENTAL: merge against the parquet-backed warehouse, write
    // only the models the delta reaches
    val affected = Dag.downstream(batch2.keySet.map(Dag.sourceModel))
    val existing = new Warehouse(b1Sources, overrides = wh1Tables)
    // every model applyBatch2 may return as a merge OVERRIDE (overrides
    // bypass the mat hook, so the loops below must write them) — keep in
    // sync with Warehouse.applyBatch's merged map; affected() filters
    // the ones this delta doesn't reach
    val mergedNames = Set("accounts", "customers", "dim_customer",
      "dim_account", "trades_history", "trades", "dim_trade", "fact_trade",
      "cash_transactions", "fact_cash_transactions", "fact_cash_balances",
      "watches_history", "watches", "fact_watches", "daily_market",
      "fact_market_history", "holdings_history", "fact_holdings")
    val tIncr0 = System.nanoTime()
    // the write-mat materializes every recomputed affected model (and
    // the internal touched-chain frames) exactly once; the loop below
    // writes the merge-OVERRIDE models, which bypass the mat hook
    val refreshed = Warehouse.applyBatch2(existing, batch2,
      writeMat(s"$work/wh_incr"))
    var incrFactSec = 0.0
    refreshed.foreach { case (n, df) =>
      if (affected(n) && mergedNames(n)) {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").parquet(s"$work/wh_incr/$n")
        if (n == "fact_trade") incrFactSec = (System.nanoTime() - t0) / 1e9
      }
    }
    val incrSec = (System.nanoTime() - tIncr0) / 1e9

    // PARTITION-SCOPED warehouse refresh: the SAME applyBatch entry
    // point as INCR, but fact_trade is stored partitioned by event
    // month (carrying its grain key), so the merge flows through
    // mergeFactBatchPartitioned and the materializer dynamic-overwrites
    // ONLY the partitions containing merged rows (here: the late
    // batch's month). Write IO scales with the touched slice — the
    // whole-table INCR path's fact rewrite is what this path deletes.
    // Timed end-to-end like INCR: applyBatch + all model writes.
    val factPartDir = s"$work/wh_part_fact"
    val pMonth = date_format(col("create_timestamp"), "yyyy-MM")
    spark.read.parquet(s"$work/wh1/fact_trade")
      .join(wh1Tables("dim_trade").select(col("sk_trade_id"), col("trade_id")),
        Seq("sk_trade_id"))
      .withColumn("p_month", pMonth)
      .write.mode("overwrite").partitionBy("p_month").parquet(factPartDir)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val tPart0 = System.nanoTime()
    val existingPart = new Warehouse(b1Sources,
      overrides = wh1Tables + ("fact_trade" -> spark.read.parquet(factPartDir)))
    val innerMat = writeMat(s"$work/wh_part")
    var partFactSec = 0.0
    val partMat: (String, DataFrame) => DataFrame = (name, df) =>
      if (name == "fact_trade") {
        val t0 = System.nanoTime()
        df.write.mode("overwrite").partitionBy("p_month").parquet(factPartDir)
        partFactSec = (System.nanoTime() - t0) / 1e9
        spark.read.parquet(factPartDir)
      } else innerMat(name, df)
    val whPart = Warehouse.applyBatch(existingPart, batch2, partMat,
      factPart = Some(Warehouse.FactPartition("p_month", pMonth)))
    whPart.all.foreach { case (n, df) =>
      if (affected(n) && mergedNames(n) && n != "fact_trade")
        df.write.mode("overwrite").parquet(s"$work/wh_part/$n")
    }
    val partSec = (System.nanoTime() - tPart0) / 1e9

    // equality: every refresh path must equal the full rebuild
    def factHash(df: DataFrame, cols: Seq[String]): (Long, Long) = {
      val a = df.select(cols.map(col): _*)
      val r = a.agg(count(lit(1)),
        bit_xor(xxhash64(struct(cols.map(col): _*)))).first()
      (r.getLong(0), r.getLong(1))
    }
    val fullFact = spark.read.parquet(s"$work/wh_full/fact_trade")
    val factCols = fullFact.columns.toSeq
    val (fullRows, fullHash) = factHash(fullFact, factCols)
    val (incrRows, incrHash) =
      factHash(spark.read.parquet(s"$work/wh_incr/fact_trade"), factCols)
    val (partRows, partHash) =
      factHash(spark.read.parquet(factPartDir), factCols)
    require(fullRows == incrRows && fullHash == incrHash,
      s"incremental != full: $incrRows/$incrHash vs $fullRows/$fullHash")
    require(fullRows == partRows && fullHash == partHash,
      s"partitioned != full: $partRows/$partHash vs $fullRows/$fullHash")

    println(s"""{"metric":"batch2_refresh","full_sec":$fullSec,"incr_sec":$incrSec,"fact_partitioned_sec":$partSec,"incr_fact_write_sec":$incrFactSec,"part_fact_write_sec":$partFactSec,"speedup":${fullSec / incrSec},"n_trades":$nTrades,"delta_trades":$nDelta,"models_full":44,"models_incr":${affected.size},"fact_rows":$fullRows}""")
    spark.stop()
  }
}
