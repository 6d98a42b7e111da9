package graft

import graft.engine._
import org.apache.spark.sql.functions._

/** Plan-property regression tests: the physical-plan shapes PLANS.md
  * documents must survive refactors. String-level checks on
  * explain(formatted) — crude but catches the expensive regressions
  * (extra shuffles, lost pushdown, lost broadcast).
  */
class PlanRegressionSpec extends SparkSpec {
  import spark.implicits._

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("SCD2 kernel: both window functions share ONE exchange+window") {
    val log = (1 to 100).map(i => (i % 10L, ts(f"2020-01-${i % 28 + 1}%02d 00:00:00"), i))
      .toDF("id", "change_ts", "v")
    val plan = formatted(Scd2.scd2(log, Seq("id"), "change_ts"))
    plan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 1
    plan.split("\\(\\d+\\) Window").length - 1 shouldBe 1
  }

  test("temporal join keeps the equi key (no BNLJ) and broadcasts a hinted dim") {
    val fact = (1 to 100).map(i => (i.toLong, i % 5L, ts("2020-06-01 00:00:00")))
      .toDF("fid", "k", "fts")
    val dim = Seq((1L, ts("2020-01-01 00:00:00"), ts("9999-12-31 23:59:59.999")))
      .toDF("k", "effective_timestamp", "end_timestamp")
    val plan = formatted(TemporalJoin.temporalJoin(
      fact, broadcast(dim), fact("k"), dim("k"), fact("fts")))
    plan should include("BroadcastHashJoin")
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("parquet scan gets pushed filters and pruned columns") {
    val dir = java.nio.file.Files.createTempDirectory("pushdown").toString
    (1 to 100).map(i => (i.toLong, s"s$i", i * 1.5, s"x$i"))
      .toDF("id", "name", "amount", "unused").write.mode("overwrite").parquet(dir)
    val plan = formatted(spark.read.parquet(dir)
      .filter($"amount" > 10.0 && $"name".isNotNull)
      .select("id", "name", "amount"))
    plan should include("GreaterThan(amount,10.0)") // reached the scan
    plan should include("IsNotNull(name)")
    plan should not include "unused"
  }

  test("gap-fill over N columns uses one window exchange") {
    val df = (1 to 50).map(i => (i % 5L, i, s"a$i", s"b$i"))
      .toDF("id", "seq", "c1", "c2")
    val plan = formatted(Windows.gapFill(df, Seq($"id"), Seq($"seq"), Seq("c1", "c2")))
    plan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 1
  }

  test("trades chain (q29 shape): lookups broadcast, no cartesian/BNLJ") {
    val bt = (1 to 50).map(i => (i.toLong, ts("2020-01-01 00:00:00"), i % 5L,
        "O", "1", i % 2 == 0, s"S${i % 3}", "ex", 1L, 1.0, 1.0, 1L, 1L, 1L))
      .toDF("t_id", "t_dts", "t_ca_id", "t_st_id", "t_tt_id", "t_is_cash",
        "t_s_symb", "t_exec_name", "t_qty", "t_bid_price", "t_trade_price",
        "t_chrg", "t_comm", "t_tax")
    val bth = (1 to 100).map(i => ((i % 50 + 1).toLong,
        ts(f"2020-02-${i % 28 + 1}%02d 00:00:00"), "F"))
      .toDF("th_t_id", "th_dts", "th_st_id")
    val rtt = Seq(("1", "Market")).toDF("tt_id", "tt_name")
    val rst = Seq(("O", "Open"), ("F", "Filled")).toDF("st_id", "st_name")
    val th = graft.models.Silver.tradesHistory(bt, bth, rtt, rst)
    val accDim = (1 to 5).map(i => (i.toLong, s"ska$i", s"skc$i", s"skb$i",
        ts("2019-01-01 00:00:00"), ts("9999-12-31 23:59:59.999")))
      .toDF("account_id", "sk_account_id", "sk_customer_id", "sk_broker_id",
        "effective_timestamp", "end_timestamp")
    val secDim = (0 to 2).map(i => (s"S$i", s"sks$i",
        ts("2019-01-01 00:00:00"), ts("9999-12-31 23:59:59.999")))
      .toDF("symbol", "sk_security_id", "effective_timestamp", "end_timestamp")
    val fact = graft.models.Gold.factTrade(graft.models.Silver.trades(th),
      graft.models.Gold.dimTrade(th), accDim, secDim)
    val plan = formatted(fact)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("BroadcastHashJoin") // the type/status lookups
  }

  test("winnow fingerprints expression participates in codegen") {
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(graft.ops.TextOps.winnowFingerprints($"text").as("fps"))
    formatted(df) should include("Project [codegen id :")
  }

  test("whole-stage codegen covers the scalar-function pipeline") {
    // read from parquet: a literal LocalRelation would constant-fold to a
    // LocalTableScan and show no codegen at all
    val dir = java.nio.file.Files.createTempDirectory("wscg").toString
    Seq(("NEW", "2020-01-02")).toDF("a", "dstr")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(Dialect.decode($"a", Seq(lit("NEW") -> lit(1))).as("d"),
        Dialect.toDateSf($"dstr", "yyyy-mm-dd").as("dt"),
        Keys.surrogateKey($"a").as("sk"))
    // formatted mode marks whole-stage-codegen participation per node
    formatted(df) should include("Project [codegen id :")
  }

  test("sampleByHash is a shuffle-free pruned filter over the scan") {
    val dir = java.nio.file.Files.createTempDirectory("sample").toString
    (1 to 100).map(i => (i.toLong, s"t$i", s"x$i"))
      .toDF("doc_id", "text", "extra").write.mode("overwrite").parquet(dir)
    val plan = formatted(graft.ops.Curation
      .sampleByHash(spark.read.parquet(dir), $"doc_id", 0.2)
      .select("doc_id", "text"))
    plan should not include "Exchange"
    plan should include("ReadSchema: struct<doc_id:bigint,text:string>")
  }

  test("assignShards: bounded exchanges, broadcast offsets, no BNLJ") {
    val df = (1 to 300).map(i => (i.toLong, Seq("a", "b")(i % 2), i % 7 + 1))
      .toDF("doc_id", "grp", "tok")
    val plan = formatted(graft.ops.Curation.assignShards(
      df, $"grp", $"doc_id", $"tok", 50L))
    plan should include("BroadcastHashJoin") // offsets come back broadcast
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    // range partition + subtotal agg + final window hash — nothing else
    (plan.split("\\(\\d+\\) Exchange").length - 1) should be <= 4
  }

  private def windowCount(plan: String): Int =
    plan.split("\\(\\d+\\) Window").length - 1

  test("dedup candidate generation never regresses to a Window operator") {
    // The round-1 scale-killer: a Window over the raw gram/bucket/band
    // stream serializes the hottest Zipf key through one task. Every
    // bucket cap and df count in these ops is groupBy+join; pin it.
    val docs = (1 to 40).map(i =>
        (i.toLong, s"the quick brown fox ${i % 7} jumps over the lazy dog $i"))
      .toDF("doc_id", "text")
    val plans = Seq(
      formatted(graft.ops.Dedup.minhashLsh(docs, "text", "doc_id",
        k = 16, bands = 4)),
      formatted(graft.ops.Dedup.minhashLsh(docs, "text", "doc_id",
        k = 16, bands = 4, carrySignatures = false)),
      formatted(graft.ops.Dedup.ngramJaccard(docs, "text", "doc_id")),
      formatted(graft.ops.Dedup.simhashPairs(docs, "text", "doc_id")))
    plans.foreach { p => windowCount(p) shouldBe 0 }
  }

  test("sampleMixture: rate join broadcasts, probe side never shuffles") {
    val df = (1 to 100).map(i =>
        (if (i % 2 == 0) "a" else "b", i.toLong, i % 50L + 10L))
      .toDF("src", "id", "toks")
    val plan = formatted(graft.ops.Curation.sampleMixture(
      df, $"src", $"id", $"toks", Map("a" -> 0.5, "b" -> 0.5), 1000L))
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    windowCount(plan) shouldBe 0
  }

  test("media decode tiers stay pipelined with the scan (no shuffle)") {
    // the decode operators are mapPartitions over the scan: any
    // Exchange in these plans means per-row media work started paying
    // a shuffle it never needs
    val dir = java.nio.file.Files.createTempDirectory("mediaplan").toString
    (0L until 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val feats = graft.ops.Multimodal.extractFeatures(spark,
      graft.ops.Multimodal.attachSyntheticVideos(spark, docs)).toDF()
    formatted(feats) should not include "Exchange"
    val frames = graft.ops.Multimodal.extractContainerFrames(spark,
      graft.ops.Multimodal.attachSyntheticVideos(spark, docs)).toDF()
    formatted(frames) should not include "Exchange"
  }

  test("cleanLines is a pure projection over the scan (no exchange)") {
    val dir = java.nio.file.Files.createTempDirectory("cleanlines").toString
    (1 to 30).map(i => (i.toLong, s"line one here\nshort\nline $i three words"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val plan = formatted(graft.ops.TextOps.cleanLines(
      spark.read.parquet(dir), "text", "doc_id"))
    plan should not include "Exchange"
    windowCount(plan) shouldBe 0
  }

  test("dedupSpans: windows confine to marked grams, no cartesian/BNLJ") {
    val docs = (1 to 30).map(i =>
        (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta tail$i"))
      .toDF("doc_id", "text")
    val plan = formatted(graft.ops.Dedup.dedupSpans(docs, "text", "doc_id"))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // exactly the two island windows (running max-end, running island
    // sum), both AFTER the repeated-gram join — never over the raw
    // gram stream
    windowCount(plan) should be <= 2
  }

  test("epochShuffle: broadcast offsets, bounded exchanges, no BNLJ") {
    val df = (1 to 200).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    val plan = formatted(graft.ops.Curation.epochShuffle(
      df, $"doc_id", epochs = 2, batchSize = 32))
    plan should include("BroadcastHashJoin")
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    (plan.split("\\(\\d+\\) Exchange").length - 1) should be <= 4
  }

  test("warehouse equality diff never regresses to cartesian/BNLJ") {
    // the q47/q49 signed multiset diff is hash-digest projections +
    // unions + one aggregate per model; a cartesian or nested-loop
    // join appearing here means a recovery join lost its equi key
    val a = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val b = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val diff = a.select(xxhash64(struct($"k", $"v")).as("__h"))
      .withColumn("__side", lit(1L))
      .unionByName(b.select(xxhash64(struct($"k", $"v")).as("__h"))
        .withColumn("__side", lit(-1L)))
      .groupBy("__h").agg(sum("__side").as("__d"))
      .filter($"__d" =!= 0)
      .agg(coalesce(sum(abs($"__d")), lit(0L)).as("n_mismatch"))
    val plan = formatted(diff)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // one aggregate pass per side of the union feeding one final agg
    plan.split("\\(\\d+\\) HashAggregate").length - 1 should be <= 4
  }

  test("gopherRules is a zero-exchange projection over its input") {
    val df = (1 to 30).map(i => (i.toLong, s"- the line $i\nbody ..."))
      .toDF("doc_id", "text")
    val plan = formatted(df.select($"doc_id" +:
      graft.ops.TextOps.gopherRules($"text").map { case (n, c) => c.as(n) }: _*))
    plan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 0
    plan should not include "Window"
  }

  test("bigramScore: LM tables never explode the plan, no cartesian scoring") {
    val df = (1 to 60).map(i => (i.toLong, s"a b c token$i end"))
      .toDF("doc_id", "text")
    val plan = formatted(graft.ops.TextOps.bigramScore(
      df, "doc_id", "text", $"doc_id" % 2 === 0))
    plan should not include "CartesianProduct"
    plan should not include "Window"
    // the only nested-loop join is the documented one-row broadcast
    // total (the unigramScore pattern); the LM lookups stay hash joins
    (plan.split("BroadcastNestedLoopJoin").length - 1) should be <= 2 // 1 node: tree + detail lines
  }

  test("dsirWeights: weight table broadcasts, gram stream never windows") {
    val df = (1 to 60).map(i => (i.toLong, s"a b c token$i end"))
      .toDF("doc_id", "text")
    val plan = formatted(graft.ops.Curation.dsirWeights(
      df, "text", "doc_id", $"doc_id" % 3 === 0))
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    plan should not include "Window"
    // one-row broadcast totals join only; the bucket-weight scoring
    // join must stay a BroadcastHashJoin
    (plan.split("BroadcastNestedLoopJoin").length - 1) should be <= 2 // 1 node: tree + detail lines
  }

  test("bpeTokenCount is a zero-exchange projection; pair counts never window") {
    val df = (1 to 30).map(i => (i.toLong, s"lowest newest token$i"))
      .toDF("doc_id", "text")
    val enc = formatted(df.select($"doc_id", graft.ops.TextOps
      .bpeTokenCount($"text", Seq("e" -> "s", "es" -> "t")).as("n")))
    enc.split("\\(\\d+\\) Exchange").length - 1 shouldBe 0
    val pairs = formatted(graft.ops.TextOps.bpePairCounts(
      graft.ops.TextOps.bpeWordTable(df, "text")))
    pairs should not include "Window"
    pairs should not include "CartesianProduct"
  }

  test("corpusOverlap: one gram aggregate + one reduce per n, no joins") {
    val df = (1 to 30).map(i => (i.toLong, s"a b c token$i"))
      .toDF("doc_id", "text")
    val plan = formatted(graft.ops.Curation.corpusOverlap(
      df, "text", $"doc_id" % 2 === 0, ns = Seq(1, 2)))
    plan should not include "Join"
    plan should not include "Window"
    // per n: gram-keyed exchange + single-row reduce exchange
    (plan.split("\\(\\d+\\) Exchange").length - 1) should be <= 4
  }

  test("pcaProject is a zero-exchange single-node projection") {
    val df = (1 to 30).map(i => (i.toLong, Array.fill(8)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val model = graft.ops.Embeddings.PcaModel(
      new Array[Double](8), Array.fill(8)(1.0),
      Array.tabulate(8)(j => Array.tabulate(8)(i => if (i == j) 1.0 else 0.0)))
    val plan = formatted(graft.ops.Embeddings.pcaProject(df, "embedding", model))
    plan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 0
    // ONE pca_project node regardless of k — never a per-component tree
    (plan.split("pca_project").length - 1) should be <= 2 // tree + detail line
  }

  test("temperatureSample: rates broadcast back, corpus never shuffles") {
    val df = (1 to 100).map(i => (i.toLong, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val plan = formatted(graft.ops.Curation.temperatureSample(
      df, $"source", $"doc_id", alpha = 0.5, targetRows = 50L))
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin"
  }

  test("keepBestPerCluster: max_by aggregate, no global window over docs") {
    val docs = (1 to 100).map(i => (i.toLong, i % 7L)).toDF("doc_id", "q")
    val comps = (1 to 40).map(i => (i.toLong, (i % 5).toLong))
      .toDF("doc_id", "component")
    val plan = formatted(graft.ops.Dedup.keepBestPerCluster(
      docs, "doc_id", comps, "q"))
    plan should not include "Window"
    plan should not include "CartesianProduct"
  }

  test("residual IVFPQ: same join/rank skeleton as n08, no extra exchange") {
    val vecs = (1 to 60).map(i => (i.toLong, Array.fill(16)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val plan = formatted(graft.ops.Similarity.ivfPqResidualTopK(
      vecs.filter($"vec_id" < 4), vecs, k = 3, nlist = 8, nprobe = 2,
      m = 4, ks = 4, dim = 16))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // assignment/residual/encode all ride the scan projection: one
    // exchange for the cell join side(s) + one for the rank window
    (plan.split("\\(\\d+\\) Exchange").length - 1) should be <= 3
    plan should include("WindowGroupLimit")
  }

  test("pcaState: one distributed moments aggregate, no collect-shaped plan") {
    val df = (1 to 50).map(i => (i.toLong, Array.fill(8)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val plan = formatted(graft.ops.Embeddings.pcaState(df, "embedding", 8))
    // partial + final ObjectHashAggregate pair over ONE exchange
    plan should include("ObjectHashAggregate")
    plan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 1
    plan should not include "Window"
  }

  test("trained quality scoring is a zero-exchange projection; one gradient aggregate per GD step") {
    val df = (1 to 40).map(i => (i.toLong, s"the doc and of is number $i"))
      .toDF("doc_id", "text")
    val model = graft.ops.TextOps.LogisticModel(
      Array(-1.0, 0.3, 5.0, -0.3, -0.01))
    val plan = formatted(df.select($"doc_id",
      graft.ops.TextOps.qualityScoreTrained($"text", model).as("s")))
    plan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 0
    plan should not include "Window"
    // the training iteration's gradient: ONE partial+final aggregate
    // pair over one exchange (map-side combined partial sums)
    val feats = df.select(graft.ops.TextOps.qualityFeatures($"text")
      .zipWithIndex.map { case (c, i) => c.as(s"f${i + 1}") } :+
      lit(1.0).as("y"): _*)
    val gplan = formatted(feats.agg(avg($"f1"), avg($"f2"), avg($"f3"),
      avg($"f4")))
    gplan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 1
  }

  test("fuzzyContamination: eval bands broadcast, train side never shuffles pre-join") {
    // doc_id is an ARITHMETIC derivation of the range id, not an alias:
    // an aliased id keeps RangePartitioning alignment through the plan
    // and Spark (correctly) elides the dedup Exchange entirely — the
    // parquet-scan shape this pin guards has UnknownPartitioning
    val train = spark.range(1, 60).select(($"id" * 2 + 1).as("doc_id"),
      concat(lit("training words one two three four five six seven "), $"id")
        .as("text"))
    val eval = spark.range(100, 104).select(($"id" * 2).as("doc_id"),
      concat(lit("benchmark words eight nine ten eleven twelve "), $"id")
        .as("text"))
    val plan = formatted(graft.ops.Curation.fuzzyContamination(
      train, eval, "text", "doc_id"))
    // the band join is broadcast (eval side) — the train stream meets
    // it map-side; no sort-merge join, no cartesian anywhere
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // the only exchange is the candidate dedup (candidate-sized), never
    // a corpus-keyed shuffle
    plan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 1
  }

  test("bm25: query terms broadcast; corpus shuffles only on doc-keyed combines") {
    val docs = spark.range(1, 60).select($"id".as("doc_id"),
      concat(lit("apple banana cherry date egg "), $"id").as("text"))
    val qt = Seq("q1" -> "apple", "q1" -> "banana").toDF("query_id", "term")
    val plan = formatted(graft.ops.TextOps.bm25(docs, "text", "doc_id", qt))
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin"
    // one-row N/avgdl statistics ride BroadcastNestedLoopJoin (the
    // broadcast one-row-aggregate idiom); exactly the two stats joins,
    // counted as plan NODES (the tree summary repeats the name)
    (plan.split("\\(\\d+\\) BroadcastNestedLoopJoin").length - 1) should be <= 2
  }

  test("sq8 retrieval: dequant rides the corpus scan; one rank-window exchange") {
    val vecs = (1 to 50).map(i => (i.toLong, Array.fill(8)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val model = graft.ops.Embeddings.Sq8Model(
      Array.fill(8)(0.0), Array.fill(8)(50.0))
    val plan = formatted(graft.ops.Similarity.sq8TopK(
      vecs.filter($"vec_id" < 4), vecs, k = 3, model))
    // codec is a pure projection: the only exchange is the per-query
    // rank window; the query side broadcasts (n01's gate-shape BNLJ on
    // the non-equi q_id <> n_id condition)
    plan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 1
    plan should include("WindowGroupLimit")
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin"
  }

  test("heavyHitters recount pass: candidates broadcast, no full-width shuffle join") {
    val items = (1 to 500).map(i => Tuple1(s"it${i % 40}")).toDF("item")
    val plan = formatted(graft.ops.Curation.heavyHitters(items, "item", 5L,
      capacity = 256))
    // the second pass semi-joins the broadcast candidate list, then one
    // ordinary agg exchange over the surviving rows only
    plan should include("BroadcastHashJoin")
    plan should include("LeftSemi")
    plan should not include "SortMergeJoin"
  }

  test("ppsSample: one subtotal broadcast, no global single-partition row window") {
    val df = (1 to 300).map(i => (i.toLong, (i % 17) + 1L)).toDF("id", "wt")
    val plan = formatted(graft.ops.Curation.ppsSample(df, "id", $"wt", 40L))
    // the row-level window partitions by __pid (bounded per partition);
    // the only single-partition window is over the ≤#partitions
    // subtotal relation, which broadcasts back
    plan should include("BroadcastExchange")
    plan should not include "SortMergeJoin"
  }

  test("agg-form index serving: heap aggregate, no per-query rank sort") {
    val vecs = (0 until 60).map(i => (i.toLong,
      Array.tabulate(16)(j => math.sin(i * 31 + j * 7).abs)))
      .toDF("vec_id", "embedding")
    val idx = graft.ops.Similarity.buildIvfPqIndex(vecs, nlist = 4, m = 4,
      ks = 8, dim = 16)
    val plan = formatted(graft.ops.Similarity.queryIvfPqIndexAgg(
      vecs.filter($"vec_id" < 3), idx, k = 3, nprobe = 2))
    // the candidate set reaches a partial+final top_k aggregate; no
    // Window/Sort ever ranks the full candidate mass
    plan should include("top_k")
    plan should not include "(Window"
    plan should not include "WindowGroupLimit"
  }

  test("semanticContamination: eval buckets broadcast, zero shuffles end-to-end") {
    val train = (1 to 50).map(i => (i.toLong, Array.fill(16)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val eval = (100 to 103).map(i => (i.toLong, Array.fill(16)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val plan = formatted(graft.ops.Similarity.semanticContamination(
      train, eval, threshold = 0.9, dim = 16))
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // pure filter output — unlike the lexical pass there is no pair
    // dedup, so the train stream never shuffles at all
    plan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 0
  }

  test("unigram encode/segment ride the scan: zero exchanges, one codegen node") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold
    // the whole projection into a LocalTableScan at optimization time
    val df = spark.range(1, 41).select($"id".as("doc_id"),
      concat(lit("ab ba token"), $"id").as("text"))
    val model = graft.ops.TextOps.UnigramModel(
      Array("a", "b", "t", "o", "k", "e", "n", "0", "1", "2", "3", "4"),
      Array.fill(12)(10L), Array.fill(12)(1000L), 2)
    val enc = formatted(df.select($"doc_id",
      graft.ops.TextOps.unigramEncode($"text", model).as("p")))
    enc.split("\\(\\d+\\) Exchange").length - 1 shouldBe 0
    enc should not include "Window"
    val seg = formatted(graft.ops.TextOps.unigramSegmentWords(
      df.withColumnRenamed("text", "word"), model))
    seg.split("\\(\\d+\\) Exchange").length - 1 shouldBe 0
    seg should include("unigram_segment")
  }

  test("hashed-classifier scoring is a zero-exchange projection over the scan") {
    val df = spark.range(1, 41).select($"id".as("doc_id"),
      concat(lit("some text tokens here "), $"id").as("text"))
    val model = graft.ops.TextOps.HashedLogisticModel(16,
      Array.tabulate(17)(i => 0.01 * i))
    val plan = formatted(df.select($"doc_id",
      graft.ops.TextOps.scoreHashedClassifier($"text", model).as("s")))
    plan.split("\\(\\d+\\) Exchange").length - 1 shouldBe 0
    plan should not include "Window"
    plan should not include "Join"
  }

  test("substr index widen is one per-doc window, never a position self-join") {
    // The round-15 constant cut: the dense (index-path) widen must
    // stay a lead() over a per-doc window — ONE exchange on the doc
    // key — and never regress to the one-shot path's self-join on
    // __pos, which shuffles the corpus-char relation twice per
    // doubling round.
    val rel = spark.range(0, 60).select(
      (($"id" / 10).cast("long") * 100L + $"id" % 10).as("__pos"),
      ($"id" % 7).as("__cls"))
    val p = formatted(graft.ops.SuffixArray.widenSeq(rel, 3, 100L))
    windowCount(p) shouldBe 1
    p should not include "Join"
    p.split("\\(\\d+\\) Exchange").length - 1 shouldBe 1
    // the sparse (pruned one-shot) widen is the same shape: one
    // per-doc RANGE-frame window, one exchange on the doc key, never
    // the position self-join (two corpus shuffles) it replaced
    val ps = formatted(graft.ops.SuffixArray.widenSparse(rel, 3, 100L))
    windowCount(ps) shouldBe 1
    ps should not include "Join"
    ps.split("\\(\\d+\\) Exchange").length - 1 shouldBe 1
  }

  test("signWords packing is a zero-exchange projection; rrfFuse and p20 use bounded exchanges") {
    val vecs = spark.range(0, 40).select($"id".as("vec_id"),
      array((0 until 64).map(i => ($"id" * i).cast("float")): _*).as("embedding"))
    val packed = formatted(vecs.select($"vec_id",
      graft.ops.Similarity.signWords($"embedding").as("code")))
    packed.split("\\(\\d+\\) Exchange").length - 1 shouldBe 0
    // rrfFuse: one exchange keys (query,doc) for the sum, one keys
    // query for the rank — never more, no join of any kind
    val ch1 = spark.range(0, 30).select(lit("q1").as("query_id"),
      $"id".as("doc_id"), ($"id" % 10 + 1).cast("int").as("rank"))
    val ch2 = spark.range(0, 30).select(lit("q1").as("query_id"),
      ($"id" + 5).as("doc_id"), ($"id" % 10 + 1).cast("int").as("rank"))
    val fused = formatted(graft.ops.Similarity.rrfFuse(Seq(ch1, ch2), k = 10))
    (fused.split("\\(\\d+\\) Exchange").length - 1) should be <= 2
    fused should not include "Join"
    // p20: both windows (rank, group count) share the group-key
    // partitioning — exactly one exchange
    val docs = spark.range(0, 40).select($"id".as("doc_id"),
      ($"id" % 4).cast("string").as("source"), ($"id" * 1.5).as("score"))
    val cut = formatted(graft.ops.Curation.topFractionPerGroup(
      docs, "source", $"score", "doc_id", frac = 0.3))
    cut.split("\\(\\d+\\) Exchange").length - 1 shouldBe 1
  }
}
