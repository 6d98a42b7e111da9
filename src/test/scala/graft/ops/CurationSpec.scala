package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation ops: the distributed shard prefix-sum must be bit-identical
  * to the global-window definition under hostile layouts (groups
  * spanning partitions, partitions holding several groups), sampling
  * must be layout-independent, and the profile must count exactly.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map { i =>
      (i.toLong, Seq("en", "fr", "de")(i % 3), "w " * (i % 40 + 1))
    }.toDF("doc_id", "lang", "text")
      .withColumn("tok", graft.ops.TextOps.tokenCountWs(col("text")))

  test("assignShards equals the global-window definition across layouts") {
    val docs = corpus(500)
    val reference = docs
      .withColumn("__cum",
        expr("sum(tok) over (partition by lang order by doc_id) - tok"))
      .select(col("doc_id"), expr("__cum div 100").as("shard"),
        (col("__cum") % 100).as("offset"))
    // 4 shuffle partitions for 3 groups x 500 rows: groups both share
    // partitions and span several — the layouts the offsets must survive.
    for (layout <- Seq(docs, docs.repartition(7), docs.coalesce(1))) {
      val got = Curation.assignShards(layout, col("lang"), col("doc_id"),
        col("tok"), 100L).select("doc_id", "shard", "offset")
      got.except(reference).count() shouldBe 0
      reference.except(got).count() shouldBe 0
    }
  }

  test("temperatureSample: alpha flattens toward rare sources, deterministic, layout-free") {
    // skewed sources: 'big' 900 rows, 'small' 100 rows
    val docs = (1 to 1000).map { i =>
      (i.toLong, if (i <= 900) "big" else "small")
    }.toDF("doc_id", "source")
    def rateOf(out: org.apache.spark.sql.DataFrame, src: String, n: Double) =
      out.filter($"source" === src).count() / n
    // alpha=1: natural distribution — keep rates equal across sources
    val nat = Curation.temperatureSample(docs, $"source", $"doc_id",
      alpha = 1.0, targetRows = 500L)
    math.abs(rateOf(nat, "big", 900.0) - rateOf(nat, "small", 100.0)) should be < 0.1
    // alpha=0.25: strongly flattened — the rare source keeps a much
    // larger fraction of itself than the common one
    val flat = Curation.temperatureSample(docs, $"source", $"doc_id",
      alpha = 0.25, targetRows = 500L)
    rateOf(flat, "small", 100.0) should be > rateOf(flat, "big", 900.0) * 2
    // deterministic + layout-independent: same kept key set
    val again = Curation.temperatureSample(docs.repartition(7), $"source",
      $"doc_id", alpha = 0.25, targetRows = 500L)
    flat.select("doc_id").except(again.select("doc_id")).count() shouldBe 0
    again.select("doc_id").except(flat.select("doc_id")).count() shouldBe 0
    // sample is a subset of the input
    flat.join(docs, Seq("doc_id"), "left_anti").count() shouldBe 0
  }

  test("assignShards: no document exceeds its shard boundary start") {
    val docs = corpus(200)
    val shards = Curation.assignShards(docs, col("lang"), col("doc_id"),
      col("tok"), 100L)
    // exclusive prefix sum => every shard's first doc starts under budget*(shard+1)
    val starts = shards.groupBy("lang", "shard").agg(count(lit(1)).as("n"))
    starts.filter($"n" === 0).count() shouldBe 0
    // shards are contiguous per group: max(shard)+1 == distinct shard count
    val byLang = shards.groupBy("lang")
      .agg(max("shard").as("mx"), countDistinct("shard").as("nd"))
    byLang.filter($"mx" + 1 =!= $"nd").count() shouldBe 0
  }

  test("sampleByHash is layout-independent and close to pct") {
    val docs = corpus(1000)
    val a = Curation.sampleByHash(docs, col("doc_id"), 0.2).select("doc_id")
    val b = Curation.sampleByHash(docs.repartition(13), col("doc_id"), 0.2)
      .select("doc_id")
    a.except(b).count() shouldBe 0
    b.except(a).count() shouldBe 0
    val n = a.count()
    assert(n > 120 && n < 280, s"sample of 1000 at 20% was $n")
  }

  test("sampleByHashStrata: per-stratum thresholds, default drops") {
    val docs = corpus(300) // langs en/fr/de round-robin
    val out = Curation.sampleByHashStrata(docs, col("lang"), col("doc_id"),
      Map("en" -> 1.0, "fr" -> 0.3))
    out.filter($"lang" === "en").count() shouldBe
      docs.filter($"lang" === "en").count() // full fraction keeps all
    out.filter($"lang" === "de").count() shouldBe 0 // default 0 drops
    // fr subset == the plain hash sample at the same threshold
    val fr = Curation.sampleByHash(docs.filter($"lang" === "fr"),
      col("doc_id"), 0.3).select("doc_id")
    out.filter($"lang" === "fr").select("doc_id")
      .except(fr).count() shouldBe 0
    fr.except(out.filter($"lang" === "fr").select("doc_id"))
      .count() shouldBe 0
  }

  test("sampleStratified returns at most k per stratum, deterministically") {
    val docs = corpus(300)
    val s1 = Curation.sampleStratified(docs, Seq("lang"), col("doc_id"), 7)
    s1.groupBy("lang").count().filter($"count" > 7).count() shouldBe 0
    val s2 = Curation.sampleStratified(docs.repartition(5), Seq("lang"),
      col("doc_id"), 7)
    s1.select("doc_id").except(s2.select("doc_id")).count() shouldBe 0
  }

  test("groupAwareSplit: no near-dup group spans splits; exact md5 draw") {
    val docs = corpus(400)
    // planted near-dup graph: a 3-chain, a pair, and 395 singletons
    val pairs = Seq((1L, 4L), (4L, 7L), (10L, 13L)).toDF("doc_a", "doc_b")
    val out = Curation.groupAwareSplit(docs, pairs, "doc_id",
      Seq("train" -> 0.8, "eval" -> 0.2))
      .select("doc_id", "split_group", "split")
    out.count() shouldBe 400L // every doc exactly once
    // the leak-freedom invariant: a group never spans splits
    out.groupBy("split_group").agg(countDistinct("split").as("ns"))
      .filter(col("ns") > 1).count() shouldBe 0L
    // linked docs share group AND split
    val byId = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    byId(1L) shouldBe byId(4L)
    byId(4L) shouldBe byId(7L)
    byId(10L) shouldBe byId(13L)
    byId(1L)._1 shouldBe 1L // component id = min member
    // singleton: group = own id, split = the sampleByHash md5 rule
    byId(20L)._1 shouldBe 20L
    val b = java.lang.Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5").digest(
        "20".getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString, 16)
    byId(20L)._2 shouldBe (if (b < math.round(0.8 * 65536)) "train" else "eval")
    // deterministic across runs and close to the asked ratio
    val again = Curation.groupAwareSplit(docs, pairs, "doc_id",
      Seq("train" -> 0.8, "eval" -> 0.2)).select("doc_id", "split")
    out.select("doc_id", "split").except(again).count() shouldBe 0L
    val trainFrac = out.filter(col("split") === "train").count() / 400.0
    trainFrac should (be >= 0.7 and be <= 0.9)
    // top bucket never drops: every row has a split
    out.filter(col("split").isNull).count() shouldBe 0L
  }

  test("profileColumns counts exactly and approves the approx check") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a"))
    ).toDF("id", "s")
    val p = Curation.profileColumns(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    p("id").getLong(1) shouldBe 4    // n_rows
    p("id").getLong(2) shouldBe 0    // n_nulls
    p("id").getLong(3) shouldBe 4    // n_distinct
    p("s").getLong(2) shouldBe 1
    p("s").getLong(3) shouldBe 2
    p("s").getBoolean(4) shouldBe true
    p("s").getString(5) shouldBe "a" // min_value
    p("s").getString(6) shouldBe "b" // max_value
  }

  test("chunkTokens: overlap, tail retention, short-doc single chunk") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      (2L, "short doc")).toDF("doc_id", "text")
    val chunks = Curation.chunkTokens(df, "text", "doc_id", 4, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // ceil((10-4)/3)+1 = 3 chunks at starts 0,3,6 — w10 covered by the last
    d1.map(_._3) shouldBe Array(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10")
    d1.map(_._4) shouldBe Array(4, 4, 4)
    val d2 = chunks.filter(_._1 == 2L)
    d2.length shouldBe 1
    d2(0)._3 shouldBe "short doc"
    d2(0)._4 shouldBe 2
  }

  test("chunkTokens keeps a short tail chunk") {
    val df = Seq((1L, (1 to 9).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Curation.chunkTokens(df, "text", "doc_id", 4, 4)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3))).sortBy(_._1)
    chunks shouldBe Array(
      (0, "w1 w2 w3 w4", 4), (1, "w5 w6 w7 w8", 4), (2, "w9", 1))
  }

  test("decontaminate drops normalization-equal matches only") {
    val train = Seq(
      (1L, "The  Quick Brown Fox"), (2L, "unique content"),
      (3L, "another one")).toDF("doc_id", "text")
    val eval = Seq((9L, "the quick brown fox")).toDF("doc_id", "text")
    val kept = Curation.decontaminate(train, eval, "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(2L, 3L)
  }

  test("decontaminateBloom equals exact decontaminate, in ONE train scan") {
    val train = (1L to 200L).map(i => (i, s"document body number ${i % 60}"))
      .toDF("doc_id", "text")
    val eval = (0L until 15L).map(i => (900L + i, s"document body number $i"))
      .toDF("doc_id", "text")
    val exact = Curation.decontaminate(train, eval, "text")
      .select("doc_id").as[Long].collect().sorted
    val bloomQ = Curation.decontaminateBloom(train, eval, "text",
      expectedEvalItems = 100L, fpp = 0.01)
    bloomQ.select("doc_id").as[Long].collect().sorted shouldBe exact
    // the one-pass rewrite: a single anti-join, no union of two filtered
    // branches re-scanning train
    val plan = bloomQ.queryExecution.executedPlan.toString
    plan should not include "Union"
  }

  test("capPerGroup keeps exactly n best rows per group, deterministically") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 50L), ("a", 2L, 50L), ("a", 3L, 10L), ("a", 4L, 90L),
      ("b", 5L, 5L), ("b", 6L, 7L),
      ("c", 7L, 1L)).toDF("src", "id", "len")
    val out = Curation.capPerGroup(df, Seq(col("src")),
      Seq(col("len").desc, col("id")), n = 2)
    out.count() shouldBe 5 // 2 + 2 + 1
    // group a: 90 wins, then the len-50 tie breaks by id (2? no — id 1)
    out.filter($"src" === "a").select("id").as[Long].collect().sorted shouldBe
      Array(1L, 4L)
    // cap larger than the group passes the whole group through
    out.filter($"src" === "c").count() shouldBe 1
    // helper column must not leak
    out.columns should not contain "__rn"
    an[IllegalArgumentException] should be thrownBy
      Curation.capPerGroup(df, Seq(col("src")), Seq(col("id")), n = 0)
  }

  test("sampleMixture: under-budget sources keep all, over-budget downsample, unlisted drop") {
    val df = ((1 to 200).map(i => (i.toLong, "big", 100L)) ++
      (201 to 205).map(i => (i.toLong, "small", 10L)) ++
      (206 to 210).map(i => (i.toLong, "unlisted", 10L)))
      .toDF("doc_id", "src", "tok")
    val out = Curation.sampleMixture(df, col("src"), col("doc_id"), col("tok"),
      Map("big" -> 0.5, "small" -> 0.5), tokenBudget = 1000L)
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // small: target 500 tokens > 50 available -> rate 1, all 5 kept
    bySrc("small") shouldBe 5L
    // big: target 500 of 20000 tokens -> rate 0.025; ~5 of 200 kept
    bySrc("big") should be < 30L
    bySrc("big") should be > 0L
    // unlisted source dropped entirely
    bySrc.get("unlisted") shouldBe None
    // deterministic: same call returns the identical sample
    val again = Curation.sampleMixture(df, col("src"), col("doc_id"), col("tok"),
      Map("big" -> 0.5, "small" -> 0.5), tokenBudget = 1000L)
    again.select("doc_id").as[Long].collect().sorted shouldBe
      out.select("doc_id").as[Long].collect().sorted
    an[IllegalArgumentException] should be thrownBy
      Curation.sampleMixture(df, col("src"), col("doc_id"), col("tok"),
        Map("big" -> 0.5), tokenBudget = 0L)
  }

  test("writeShards lays out one directory per shard with ordered rows") {
    val docs = corpus(200)
    val shards = Curation.assignShards(docs, col("lang"), col("doc_id"),
      col("tok"), 100L)
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Curation.writeShards(shards, out, Seq("doc_id"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard="))
    dirs.length shouldBe shards.select("shard").distinct().count()
    val back = spark.read.parquet(out)
    back.count() shouldBe 200
    back.select("doc_id").except(docs.select("doc_id")).count() shouldBe 0
  }

  test("epochShuffle: exact md5 permutation per epoch, layout-independent") {
    val docs = corpus(300)
    val out = Curation.epochShuffle(docs, col("doc_id"), epochs = 2,
      batchSize = 32).select("doc_id", "epoch", "step", "pos_in_batch")
    out.count() shouldBe 600L
    // each epoch is a complete permutation: 300 distinct global ranks
    out.select(col("epoch"), col("step") * 32 + col("pos_in_batch"))
      .distinct().count() shouldBe 600L
    out.agg(max("pos_in_batch")).first().getLong(0) should be < 32L
    out.agg(max("step")).first().getLong(0) shouldBe (299L / 32L)
    // the rank IS the md5 order: recompute epoch 0 locally
    def hash(id: Long, e: Int): String = java.security.MessageDigest
      .getInstance("MD5").digest(s"$id#$e".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = (1L to 300L).sortBy(id => (hash(id, 0), id.toString))
      .zipWithIndex.map { case (id, r) => id -> (r / 32L, r % 32L) }.toMap
    out.filter(col("epoch") === 0).collect().foreach { r =>
      (r.getAs[Long]("step"), r.getAs[Long]("pos_in_batch")) shouldBe
        expected(r.getAs[Long]("doc_id"))
    }
    // epochs really reshuffle: epoch 1 order differs from epoch 0
    val byEpoch = out.collect().groupBy(_.getAs[Int]("epoch")).map {
      case (e, rows) => e -> rows.sortBy(r => (r.getAs[Long]("step"),
        r.getAs[Long]("pos_in_batch"))).map(_.getAs[Long]("doc_id")).toSeq
    }
    byEpoch(0) should not be byEpoch(1)
    // layout independence: a hostile repartition yields the same ranks
    val re = Curation.epochShuffle(docs.repartition(7), col("doc_id"),
      epochs = 2, batchSize = 32)
      .select("doc_id", "epoch", "step", "pos_in_batch")
    out.except(re).count() shouldBe 0L
  }

  test("dsirWeights: exact hashed-model recompute, target-like docs rank higher") {
    val docs = Seq((3L, "the cat"), (6L, "the dog"), (1L, "the cat"),
      (2L, "rare token"), (5L, "   ")).toDF("doc_id", "text")
    val out = Curation.dsirWeights(docs, "text", "doc_id",
        col("doc_id") % 3 === 0, buckets = 1024)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // replicate the feature hash + both smoothed models locally
    def bucket(g: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(md.substring(0, 4), 16) % 1024
    }
    def grams(t: String): Seq[String] = {
      val w = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      w ++ w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val corpus = Map(3L -> "the cat", 6L -> "the dog", 1L -> "the cat",
      2L -> "rare token")
    val tgt = corpus.filter(_._1 % 3 == 0).values.flatMap(grams).toSeq
    val raw = corpus.filterNot(_._1 % 3 == 0).values.flatMap(grams).toSeq
    val ct = tgt.groupBy(bucket).view.mapValues(_.size).toMap
    val cr = raw.groupBy(bucket).view.mapValues(_.size).toMap
    def lw(b: Int): Double =
      math.log((ct.getOrElse(b, 0) + 1).toDouble / (tgt.size + 1024)) -
        math.log((cr.getOrElse(b, 0) + 1).toDouble / (raw.size + 1024))
    corpus.foreach { case (id, t) =>
      out(id).getAs[Long]("n_grams") shouldBe grams(t).size.toLong
      out(id).getAs[Double]("log_weight") shouldBe
        (grams(t).map(g => lw(bucket(g))).sum +- 1e-9)
    }
    // whitespace-only doc pinned with zeros and a null weight
    out(5L).getAs[Long]("n_grams") shouldBe 0L
    out(5L).isNullAt(out(5L).fieldIndex("log_weight")) shouldBe true
    // the raw-only doc scores below the verbatim-target doc
    out(2L).getAs[Double]("log_weight") should be <
      out(1L).getAs[Double]("log_weight")
  }

  test("dsirState merges exactly and incremental scoring equals refit") {
    val corpus = Seq((3L, "the cat"), (6L, "the dog"), (1L, "the cat"),
      (2L, "rare token"), (10L, "the cat runs"), (11L, "dog token here"))
      .toDF("doc_id", "text")
    val tgt = col("doc_id") % 3 === 0
    val b1 = corpus.filter(col("doc_id") < 10)
    val b2 = corpus.filter(col("doc_id") >= 10)
    // merged state == from-scratch state over the union, exactly
    val merged = Curation.mergeDsirState(
      Curation.dsirState(b1, "text", "doc_id", tgt),
      Curation.dsirState(b2, "text", "doc_id", tgt))
    val direct = Curation.dsirState(corpus, "text", "doc_id", tgt)
    merged.except(direct).count() shouldBe 0L
    direct.except(merged).count() shouldBe 0L
    // scoring the new batch against merged state == the full-refit
    // weights restricted to that batch
    val inc = Curation.dsirScoreWithState(merged, b2, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("log_weight"))).toMap
    val full = Curation.dsirWeights(corpus, "text", "doc_id", tgt)
      .filter(col("doc_id") >= 10)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("log_weight"))).toMap
    inc.keySet shouldBe full.keySet
    inc.foreach { case (id, (ng, lw)) =>
      ng shouldBe full(id)._1
      lw shouldBe full(id)._2 +- 1e-9
    }
  }

  test("gumbelTopK: seeded exact draw, null exclusion, layout-independent") {
    val base = (1L to 100L).map(i => (i, (i % 10).toDouble))
      .toDF("doc_id", "w")
      .withColumn("w",
        when(col("doc_id") === 100L, lit(null)).otherwise(col("w")))
    val got = Curation.gumbelTopK(base, "doc_id", "w", k = 10, seed = 7L)
      .collect().map(_.getLong(0)).toSeq
    // recompute the seeded Gumbel keys locally
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def key(id: Long): Double = {
      val u = (Integer.parseInt(md5hex(s"$id#7").substring(0, 4), 16)
        + 0.5) / 65536.0
      (id % 10).toDouble - math.log(-math.log(u))
    }
    val expected = (1L until 100L)
      .sortBy(id => (-key(id), id)).take(10).toSeq
    got shouldBe expected
    // the excluded null-weight doc can never be drawn
    got should not contain 100L
    // layout independence: hostile repartition, same selection
    val re = Curation.gumbelTopK(base.repartition(7), "doc_id", "w",
      k = 10, seed = 7L).collect().map(_.getLong(0)).toSeq
    re shouldBe expected
    // a different seed draws a different set (whp)
    val other = Curation.gumbelTopK(base, "doc_id", "w", k = 10,
      seed = 8L).collect().map(_.getLong(0)).toSeq
    other should not be expected
  }

  test("corpusOverlap: closed-form distinct-gram sets and Jaccard") {
    // side A (even ids): "a b c", "a b"; side B: "b c d"
    val docs = Seq((2L, "a b c"), (4L, "a b"), (1L, "b c d"))
      .toDF("doc_id", "text")
    val out = Curation.corpusOverlap(docs, "text",
        col("doc_id") % 2 === 0, ns = Seq(1, 2))
      .orderBy("n").collect()
    // 1-grams: A={a,b,c}, B={b,c,d}, both={b,c}
    out(0).getAs[Long]("grams_a") shouldBe 3L
    out(0).getAs[Long]("grams_b") shouldBe 3L
    out(0).getAs[Long]("grams_both") shouldBe 2L
    out(0).getAs[Double]("jaccard") shouldBe 0.5
    // 2-grams: A={"a b","b c"}, B={"b c","c d"}, both={"b c"}
    out(1).getAs[Long]("grams_a") shouldBe 2L
    out(1).getAs[Long]("grams_b") shouldBe 2L
    out(1).getAs[Long]("grams_both") shouldBe 1L
    out(1).getAs[Double]("jaccard") shouldBe 1.0 / 3
    // WordNGrams short-text fallback: a 1-word doc contributes its
    // whole string as the (only) 2-gram
    val short = Seq((2L, "solo"), (1L, "solo"))
      .toDF("doc_id", "text")
    val s2 = Curation.corpusOverlap(short, "text",
        col("doc_id") % 2 === 0, ns = Seq(2)).collect()(0)
    s2.getAs[Long]("grams_both") shouldBe 1L
    s2.getAs[Double]("jaccard") shouldBe 1.0
  }

  test("fuzzyContamination/fuzzyDecontaminate: near-dup benchmark leaks flagged, clean rows kept") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the wide river bank " +
      "while the tall grey heron watches every small silver fish swim slowly " +
      "past the old wooden bridge under the warm afternoon sun today"
    val train = Seq(
      1L -> base, // exact copy of eval doc 100
      2L -> base.replace("today", "tonight"), // near-dup (1-word edit)
      3L -> "completely unrelated text about distributed query engines and shuffles",
      4L -> "another clean training document with its own words entirely")
      .toDF("doc_id", "text")
    val eval = Seq(
      100L -> base,
      101L -> "benchmark question with no training twin anywhere at all")
      .toDF("doc_id", "text")
    val flagged = Curation.fuzzyContamination(train, eval, "text", "doc_id")
      .select("train_id", "eval_id")
      .as[(Long, Long)].collect().toSet
    flagged should contain(1L -> 100L)
    flagged should contain(2L -> 100L)
    flagged.map(_._1) should not contain 3L
    flagged.map(_._1) should not contain 4L
    flagged.map(_._2) should not contain 101L
    val kept = Curation.fuzzyDecontaminate(train, eval, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(3L, 4L)
    // threshold respected: at 1.01 nothing can flag
    Curation.fuzzyContamination(train, eval, "text", "doc_id",
      threshold = 1.01).count() shouldBe 0L
  }

  test("topFractionPerGroup: ceil(frac*n) best rows kept per group, ties by id") {
    import org.apache.spark.sql.functions.col
    // group a: 10 rows scores 0..9 → keep ceil(3) = 3 best (ids 9,8,7)
    // group b: 4 rows, all tied → keep ceil(1.2) = 2, tie-break smallest id
    val df = ((0L until 10L).map(i => (i, "a", i.toDouble)) ++
        (20L until 24L).map(i => (i, "b", 1.0)))
      .toDF("doc_id", "source", "score")
    val kept = Curation.topFractionPerGroup(df, "source", col("score"),
        "doc_id", frac = 0.3)
      .select("doc_id", "source", "rank", "n_group")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    kept.filter(_._2 == "a").map(_._1).sorted shouldBe Array(7L, 8L, 9L)
    kept.filter(_._2 == "b").map(_._1).sorted shouldBe Array(20L, 21L)
    kept.filter(_._2 == "a").foreach(_._4 shouldBe 10L)
    // frac = 1 keeps everything
    Curation.topFractionPerGroup(df, "source", col("score"), "doc_id",
      frac = 1.0).count() shouldBe 14L
  }

  test("groupThresholdSketch: exact at bin granularity, over-keeps whole boundary bins") {
    import org.apache.spark.sql.functions.col
    // scores 0..9 in one group; 10 bins on [0,10) make the sketch cut
    // exact: target ceil(0.3*10)=3 -> threshold bin 7 -> scores 7,8,9
    val df = (0L until 10L).map(i => (i, "a", i.toDouble))
      .toDF("doc_id", "source", "score")
    val fine = Curation.groupThresholdSketch(df, "source", col("score"),
        frac = 0.3, bins = 10, lo = 0.0, hi = 10.0)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    fine shouldBe Array(7L, 8L, 9L)
    // 2 coarse bins: top bin holds scores 5..9 -> the whole boundary
    // bin is kept (5 rows for a target of 3) — the documented trade
    val coarse = Curation.groupThresholdSketch(df, "source", col("score"),
        frac = 0.3, bins = 2, lo = 0.0, hi = 10.0)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    coarse shouldBe Array(5L, 6L, 7L, 8L, 9L)
    // per-group independence: a second group with inverted scores gets
    // its own threshold
    val two = df.unionByName((10L until 20L).map(i =>
      (i, "b", (19 - i).toDouble)).toDF("doc_id", "source", "score"))
    val kept = Curation.groupThresholdSketch(two, "source", col("score"),
        frac = 0.3, bins = 10, lo = 0.0, hi = 10.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(7L, 8L, 9L, 10L, 11L, 12L)
  }
}
