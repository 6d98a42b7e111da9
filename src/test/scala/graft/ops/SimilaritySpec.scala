package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("clusterPurity and recallAtK evaluation utilities") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = new scala.util.Random(67)
    val anchors = Array.fill(2)(Array.fill(8)(r.nextGaussian()))
    // 20 vectors around 2 anchors; labels mostly match the anchor with
    // one planted impurity in cluster 0
    val vecs = (0L until 20L).map { i =>
      val c = (i % 2).toInt
      val lbl = if (i == 6L) 1 else c // i=6 is anchor-0 but label 1
      (i, anchors(c).map(x => (x + 0.01 * r.nextGaussian()).toFloat), lbl)
    }.toDF("vec_id", "embedding", "label")
    val purity = Similarity.clusterPurity(vecs, anchors)
      .collect().map(p => p.getInt(0) ->
        (p.getLong(1), p.getInt(2), p.getDouble(3))).toMap
    purity(1) shouldBe ((10L, 0, 0.9)) // anchor-0 cell: 9/10 label 0
    purity(2) shouldBe ((10L, 1, 1.0)) // anchor-1 cell: pure
    // recall@k: approximation missing one neighbor for q 1
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("q_id", "n_id")
    val approx = Seq((1L, 10L), (2L, 12L), (2L, 99L)).toDF("q_id", "n_id")
    val rec = Similarity.recallAtK(approx, exact)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    rec shouldBe Map(1L -> 0.5, 2L -> 1.0)
  }

  test("knnClassify: planted clusters recover their label; ANN neighbors plug in") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = new scala.util.Random(61)
    val anchors = Array.fill(3)(Array.fill(16)(r.nextGaussian().toFloat))
    // 30 labeled corpus vectors tightly around 3 anchors + 3 queries
    val corpus = (0L until 30L).map { i =>
      val a = anchors((i % 3).toInt)
      (i, a.map(x => x + 0.01f * r.nextGaussian().toFloat), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val queries = (100L until 103L).map { i =>
      val a = anchors((i % 3).toInt)
      (i, a.map(x => x + 0.01f * r.nextGaussian().toFloat), -1)
    }.toDF("vec_id", "embedding", "label")
    val pred = Similarity.knnClassify(queries, corpus, k = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    pred shouldBe Map(100L -> 1, 101L -> 2, 102L -> 0)
    // pluggable neighbors: exact brute-force candidates give the same
    val nn = Similarity.bruteForceTopK(queries, corpus, 5)
    val pred2 = Similarity.knnClassify(queries, corpus, k = 5,
        neighbors = Some(nn))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    pred2 shouldBe pred
  }
  import spark.implicits._

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f), Array(1f, 2f)),
      (Array(1f, 0f), Array(-1f, 0f))).toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b").as("c")).as[Double].collect()
    out(0) shouldBe 0.0 +- 1e-9
    out(1) shouldBe 1.0 +- 1e-9
    out(2) shouldBe -1.0 +- 1e-9
  }

  test("bruteForceTopK returns k ranked true neighbors per query") {
    // 1-d directions on a circle: neighbor order is angular distance
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val vecs = Seq((0L, v(0)), (1L, v(10)), (2L, v(20)), (3L, v(90)), (4L, v(180)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 3)
      .orderBy("rank").select("n_id").as[Long].collect()
    out shouldBe Array(1L, 2L, 3L)
  }

  test("lshTopK finds same-bucket neighbors (subset of brute-force)") {
    val r = new scala.util.Random(3)
    val base = Array.fill(64)(r.nextGaussian().toFloat)
    def jitter(eps: Double) =
      base.map(x => (x + eps * r.nextGaussian()).toFloat)
    val vecs = (0L to 20L).map(i =>
      (i, if (i < 10) jitter(0.05) else Array.fill(64)(r.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(vecs.filter($"vec_id" === 0), vecs, k = 5)
      .select("n_id").as[Long].collect()
    // tight cluster members hash to the same bucket; at least some found
    out.length should be > 0
    all(out) should be < 10L
  }

  test("ivfTopK: high recall vs brute force with generous nprobe") {
    val r = new scala.util.Random(11)
    val vecs = (0L until 200L).map(i =>
      (i, Array.fill(32)(r.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(q, vecs, k = 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, vecs, k = 3, nlist = 8, nprobe = 8)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // nprobe == nlist probes every cell -> identical to brute force
    ivf shouldBe exact
    // fewer probes: approximate — non-empty, at most k per query
    val partial = Similarity.ivfTopK(q, vecs, k = 3, nlist = 8, nprobe = 2)
    partial.count() should be > 0L
    partial.groupBy("q_id").count().collect()
      .foreach(_.getLong(1) should be <= 3L)
  }

  test("lshTopK multi-table amplification raises recall, tables=1 unchanged") {
    val r = new scala.util.Random(23)
    val vecs = (0L until 300L).map(i =>
      (i, Array.fill(64)(r.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, vecs, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(tables: Int): Double = {
      val got = Similarity.lshTopK(q, vecs, k = 5, tables = tables)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    r4 should be >= r1
    r4 should be > 0.0
    // explicit tables=1 must be the same plan family as the default
    Similarity.lshTopK(q, vecs, k = 5, tables = 1)
      .select("q_id", "n_id", "rank").collect().toSet shouldBe
      Similarity.lshTopK(q, vecs, k = 5)
        .select("q_id", "n_id", "rank").collect().toSet
  }

  test("cosineNearDups returns symmetric-free high-sim pairs") {
    val a = Array.fill(64)(1f)
    val vecs = Seq((0L, a), (1L, a.map(_ * 2f)),
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDups(vecs, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    out shouldBe Array((0L, 1L)) // scaled copy is cosine-identical; id_a < id_b once
  }

  test("semDedup keeps the smallest-id exemplar of each in-cell near-dup group") {
    val r = new scala.util.Random(5)
    def noisy(base: Array[Float], eps: Float) =
      base.map(x => x + eps * r.nextGaussian().toFloat)
    val b1 = Array.fill(32)(r.nextGaussian().toFloat)
    val b2 = Array.fill(32)(r.nextGaussian().toFloat)
    // ids 0-13 random (ids < nlist seed the centroids, so near-dup
    // groups must sit ABOVE nlist or each member becomes its own cell),
    // ids 14-17 ~ b1 (near-dups), ids 18-19 ~ b2 (near-dups)
    val vecs = ((0L until 14L).map(i =>
      (i, Array.fill(32)(r.nextGaussian().toFloat))) ++
      Seq((14L, b1), (15L, noisy(b1, 0.01f)), (16L, noisy(b1, 0.01f)),
        (17L, noisy(b1, 0.01f)), (18L, b2), (19L, noisy(b2, 0.01f))))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(vecs, threshold = 0.95, nlist = 8)
      .select("vec_id").as[Long].collect().toSet
    // exemplars survive, their near-copies do not
    kept should contain(14L)
    kept should contain(18L)
    Set(15L, 16L, 17L, 19L).intersect(kept) shouldBe empty
    // unrelated vectors all survive
    (0L until 14L).toSet.subsetOf(kept) shouldBe true
    // output carries the cell id for every kept row
    Similarity.semDedup(vecs, threshold = 0.95, nlist = 8).columns shouldBe
      Array("vec_id", "cell")
  }

  test("sq8: codes bounded, grid exact at extrema, top-k matches dequantized brute force") {
    import spark.implicits._
    val r = new scala.util.Random(73)
    val dim = 16
    val vecs = (0L until 40L).map { i =>
      // dim 3 planted constant: the degenerate-range path must decode
      // to the constant, not divide by zero
      (i, Array.tabulate(dim)(j =>
        if (j == 3) 2.5f else (r.nextGaussian() * (j + 1)).toFloat))
    }.toDF("vec_id", "embedding")
    val model = Embeddings.sq8Fit(vecs, "embedding", dim)
    model.dim shouldBe dim
    model.mins(3) shouldBe 2.5.toFloat.toDouble
    model.maxs(3) shouldBe model.mins(3)
    val enc = vecs.select(col("vec_id"),
        Embeddings.sq8Codes(col("embedding"), model).as("codes"),
        Embeddings.sq8Roundtrip(col("embedding"), model).as("dq"),
        col("embedding"))
      .collect()
    enc.foreach { row =>
      val codes = row.getSeq[Int](1)
      val dq = row.getSeq[Double](2)
      val orig = row.getSeq[Float](3)
      all(codes) should (be >= 0 and be <= 255)
      dq(3) shouldBe model.mins(3) // degenerate dim decodes to the constant
      // max abs error is half a grid cell per dim
      (0 until dim).foreach { j =>
        val cell = (model.maxs(j) - model.mins(j)) / 255.0
        math.abs(dq(j) - orig(j).toDouble) should be <= (cell / 2 + 1e-12)
      }
    }
    // in-corpus extrema land exactly on the grid ends
    val byId = enc.map(r => r.getLong(0) ->
      (r.getSeq[Int](1), r.getSeq[Float](3))).toMap
    val hi = byId.values.find(_._2(0).toDouble == model.maxs(0)).get
    val lo = byId.values.find(_._2(0).toDouble == model.mins(0)).get
    hi._1(0) shouldBe 255
    lo._1(0) shouldBe 0
    // retrieval == brute force over the explicitly dequantized corpus
    val queries = vecs.filter(col("vec_id") < 5)
    val viaSq8 = Similarity.sq8TopK(queries, vecs, k = 3, model)
      .select("q_id", "n_id", "rank").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaBrute = Similarity.bruteForceTopK(queries,
        vecs.select(col("vec_id"),
          Embeddings.sq8Roundtrip(col("embedding"), model).as("embedding")),
        k = 3)
      .select("q_id", "n_id", "rank").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    viaSq8 shouldBe viaBrute
    viaSq8.size shouldBe 15
  }

  test("semanticContamination flags cross-corpus embedding near-dups only") {
    import spark.implicits._
    val r = new scala.util.Random(83)
    val dim = 32
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val evalVec = unit()
    val nearEval = evalVec.map(x => x + 0.01f * r.nextGaussian().toFloat)
    // train: one planted near-copy of the eval vector + unrelated noise
    val train = ((0L until 20L).map(i => (i, unit())) :+ (50L, nearEval))
      .toDF("vec_id", "embedding")
    val eval = Seq((100L, evalVec)).toDF("vec_id", "embedding")
    val hits = Similarity.semanticContamination(train, eval,
        threshold = 0.9, dim = dim)
      .select("train_id", "eval_id").as[(Long, Long)].collect().toSet
    hits shouldBe Set(50L -> 100L)
    // high threshold: nothing flags
    Similarity.semanticContamination(train, eval, threshold = 1.0001,
      dim = dim).count() shouldBe 0L
  }

  test("rrfFuse: cross-channel docs outrank single-channel; missing channels contribute nothing") {
    val lex = Seq(("q1", 10L, 1), ("q1", 20L, 2), ("q1", 30L, 3))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq(("q1", 20L, 1), ("q1", 40L, 2))
      .toDF("query_id", "doc_id", "rank")
    val out = Similarity.rrfFuse(Seq(lex, sem), k = 10)
      .orderBy("fused_rank")
      .select("doc_id", "rrf", "n_channels")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // doc 20: rank 2 lexical + rank 1 semantic → 1/62 + 1/61, 2 channels
    out(0)._1 shouldBe 20L
    out(0)._2 shouldBe (1.0 / 62 + 1.0 / 61) +- 1e-12
    out(0)._3 shouldBe 2L
    // singles follow, ordered by their one reciprocal then doc_id
    out.map(_._1) shouldBe Array(20L, 10L, 40L, 30L)
    out.tail.foreach(_._3 shouldBe 1L)
    // k cut applies
    Similarity.rrfFuse(Seq(lex, sem), k = 2).count() shouldBe 2L
  }

  test("signWords/hammingDistance: packed sign codes give exact bit distances") {
    val a = Array.fill(64)(1f) // all bits set
    val b = Array.tabulate(64)(i => if (i < 3) -1f else 1f) // 3 low bits off
    val c = Array.tabulate(64)(i => if (i >= 61) -1f else 1f) // 3 high bits off
    val df = Seq((a, b), (a, c), (a, a)).toDF("x", "y")
    val dists = df.select(Similarity.hammingDistance(
        Similarity.signWords($"x"), Similarity.signWords($"y")).as("d"))
      .as[Long].collect()
    dists shouldBe Array(3L, 3L, 0L)
    // word packing: zeros pack to 0; exactly-0 entries do NOT set bits
    val z = Array.fill(64)(0f)
    Seq(Tuple1(z)).toDF("x")
      .select(Similarity.signWords($"x").as("w"))
      .as[Array[Long]].collect().head shouldBe Array(0L, 0L)
  }

  test("hammingNearDupPairs: banded candidates, exact distances, bucket cap, null codes ignored") {
    val c0 = Array(0L, 0L)
    val c3 = Array(7L, 0L)            // 3 flips, all in chunk 0
    val c4 = Array(15L, 0L)           // 4 flips from c0 — candidate, then filtered
    val cf = Array(0x10001L, 0x10001L) // one flip per 16-bit chunk: no band matches c0
    val codes = Seq((0L, Some(c0)), (1L, Some(c3)), (2L, Some(c4)),
      (3L, Some(cf)), (4L, None)).toDF("doc_id", "dhash")
    val pairs = Similarity.hammingNearDupPairs(codes, "doc_id", "dhash")
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    // (0,1): dist 3 via shared zero bands; (1,2): dist 1; (0,2): dist 4
    // is generated as a candidate but filtered; cf shares no band with
    // c0 — banding recall bound — and its distances to c3/c4 exceed 3
    pairs shouldBe Set((0L, 1L, 3L), (1L, 2L, 1L))
    // degenerate hot bucket: five identical codes, cap 4 drops the
    // bucket entirely; cap 10 keeps all C(5,2) zero-distance pairs
    val blank = (0L until 5L).map(i => (i, Array(0L, 0L))).toDF("doc_id", "dhash")
    Similarity.hammingNearDupPairs(blank, "doc_id", "dhash",
      maxBucket = 4).count() shouldBe 0L
    Similarity.hammingNearDupPairs(blank, "doc_id", "dhash",
      maxBucket = 10).count() shouldBe 10L
  }

  test("hammingNearDupPairsIncremental: new-vs-all only, equals full-run pairs touching the batch") {
    val codes = Seq(
      (0L, Array(0L, 0L)), (1L, Array(1L, 0L)), (2L, Array(3L, 0L)),
      (3L, Array(0L, 0L)), (4L, Array(0xFF00FFL, 0xF0L)))
      .toDF("doc_id", "dhash")
    val newer = codes.filter($"doc_id" >= 3)
    val older = codes.filter($"doc_id" < 3)
    val inc = Similarity.hammingNearDupPairsIncremental(newer, older,
        "doc_id", "dhash")
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val full = Similarity.hammingNearDupPairs(codes, "doc_id", "dhash")
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    inc shouldBe full.filter(p => p._1 >= 3 || p._2 >= 3)
    // the corpus-corpus pair (0,1) exists in the full run but must NOT
    // be re-emitted by the incremental pass
    full should contain((0L, 1L, 1L))
    inc.foreach { p => (p._1 >= 3 || p._2 >= 3) shouldBe true }
  }

  test("mmrTopK diversifies away from a near-duplicate; lambda=1 is plain top-k") {
    // query along x; candidates: A (rel .99-ish), A' (near-copy of A),
    // B (lower rel, dissimilar to A). Plain top-3 = A, A', B; MMR at
    // lambda=0.5 must pick B second because A' is redundant.
    val q = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.99f, 0.14f)),
      (2L, Array(0.991f, 0.138f)), // near-duplicate of 1
      (3L, Array(0.8f, -0.6f))).toDF("vec_id", "embedding")
    val picks = Similarity.mmrTopK(q, corpus, k = 3, candidateK = 3,
        lambda = 0.5)
      .orderBy("pick_rank").select("n_id").as[Long].collect()
    picks(0) should (be(1L) or be(2L)) // highest-rel of the twins first
    picks(1) shouldBe 3L               // diversity beats the twin
    // lambda=1: pure relevance, equals brute-force order
    val pure = Similarity.mmrTopK(q, corpus, k = 3, candidateK = 3,
        lambda = 1.0)
      .orderBy("pick_rank").select("n_id").as[Long].collect()
    val bf = Similarity.bruteForceTopK(q, corpus, k = 3)
      .orderBy("rank").select("n_id").as[Long].collect()
    pure shouldBe bf
  }

  test("hammingTopK: with full rerank equals brute force; candidate cut respected") {
    val r = new scala.util.Random(97)
    val vecs = (0L until 30L).map(i => (i, Array.fill(64)(r.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 3)
    // rerankK covering the whole corpus makes stage 2 the exact scan
    val full = Similarity.hammingTopK(q, vecs, k = 5, rerankK = 29)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    val exact = Similarity.bruteForceTopK(q, vecs, k = 5)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect().toSet
    full shouldBe exact
    // narrow rerank still returns k ranked rows per query
    val narrow = Similarity.hammingTopK(q, vecs, k = 5, rerankK = 8)
    narrow.groupBy("q_id").count().select("count").as[Long]
      .collect().toSet shouldBe Set(5L)
  }

  test("mergeIvfPqIndexes: union-by-construction; append and merge fail fast on dup/drift") {
    val r = new scala.util.Random(131)
    val corpus = (0 until 120).map { i =>
      (i.toLong, Array.fill(64)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val union = Similarity.buildIvfPqIndex(corpus, nlist = 8, m = 8,
      ks = 16)
    def shard(c: org.apache.spark.sql.DataFrame) =
      Similarity.buildIvfPqIndex(c, nlist = 8, m = 8, ks = 16,
        centroids = Some(union.cells), codebook = Some(union.codebook))
    val merged = Similarity.mergeIvfPqIndexes(
      shard(corpus.filter(col("vec_id") < 60)),
      shard(corpus.filter(col("vec_id") >= 60)))
    def codeMap(i: Similarity.IvfPqIndex) = i.codes
      .select("n_id", "cell", "codes").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Byte](2))).toMap
    codeMap(merged) shouldBe codeMap(union)
    // overlapping shards fail fast
    intercept[IllegalArgumentException] {
      Similarity.mergeIvfPqIndexes(shard(corpus),
        shard(corpus.filter(col("vec_id") >= 60)))
    }.getMessage should include("BOTH shard")
    // artifact drift fails fast
    intercept[IllegalArgumentException] {
      Similarity.mergeIvfPqIndexes(
        shard(corpus.filter(col("vec_id") < 60)),
        Similarity.buildIvfPqIndex(corpus.filter(col("vec_id") >= 60),
          nlist = 8, m = 8, ks = 16))
    }
    // append fail-fasts: already-indexed and in-batch duplicate ids
    intercept[IllegalArgumentException] {
      Similarity.appendToIvfPqIndex(union,
        corpus.filter(col("vec_id") < 3))
    }.getMessage should include("already indexed")
    val batch = corpus.filter(col("vec_id") < 2)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    intercept[IllegalArgumentException] {
      Similarity.appendToIvfPqIndex(union, batch.unionByName(batch))
    }.getMessage should include("repeats")
    Similarity.appendToIvfPqIndex(union, batch)
      .codes.count() shouldBe 122L
  }

  test("shardByCells: contiguous occupancy-balanced cell ranges, deterministic under skew") {
    // 1-D geodesic geometry (quarter arc in a 2-D plane): cosine
    // argmax assignment is exactly nearest-in-arc, so cell membership
    // is controlled. Cells sit at regular arc positions; the corpus
    // SKEWS into cell 1 (60 of 100 members), so an unweighted cut
    // would split 4/4 cells and leave shard 0 with ~75% of the corpus.
    val nlist = 8
    val arc = math.Pi / 2
    val cells = Array.tabulate(nlist) { k =>
      val th = (k + 0.5) / nlist * arc
      Array(math.cos(th), math.sin(th), 0.0, 0.0)
    }
    def at(theta: Double, id: Long) = (id,
      Array(math.cos(theta).toFloat, math.sin(theta).toFloat, 0f, 0f))
    val pts = (0 until 60).map(i => at(0.3 / nlist * arc, i.toLong)) ++
      (0 until 40).map { i =>
        val cell = 1 + i % (nlist - 1) // cells 2..8, ~6 each
        at((cell + 0.5) / nlist * arc, (100 + i).toLong)
      }
    val corpus = pts.toDF("vec_id", "embedding")
    val map1 = Similarity.shardCellMap(corpus, cells, 2)
    val map2 = Similarity.shardCellMap(corpus, cells, 2)
    map1.toSeq shouldBe map2.toSeq // deterministic
    // contiguous non-decreasing ranges, both shards present
    map1.sliding(2).forall(p => p(1) == p(0) || p(1) == p(0) + 1) shouldBe true
    map1.head shouldBe 0
    map1.last shouldBe 1
    // occupancy-weighted: the skewed cell 1 alone meets shard 0's
    // pro-rata share, so the cut lands right after it
    map1.count(_ == 0) shouldBe 1
    // the projection agrees with the map and loses no rows
    val sharded = Similarity.shardByCells(corpus, cells, 2)
    sharded.count() shouldBe 100L
    sharded.filter(col("shard") === 0).count() shouldBe 60L
    sharded.filter(col("shard") === 1).count() shouldBe 40L
    // nShards must not exceed nlist, and every shard gets >= 1 cell
    val mapMax = Similarity.shardCellMap(corpus, cells, nlist)
    mapMax.toSeq shouldBe (0 until nlist)
    an[IllegalArgumentException] should be thrownBy
      Similarity.shardCellMap(corpus, cells, nlist + 1)
    // the state-derived cut replays the corpus-derived one exactly:
    // the shards' stored cell columns carry the same histogram the
    // corpus scan would produce (here via the IVF-PQ code tables)
    val full = Similarity.buildIvfPqIndex(corpus, nlist = nlist,
      m = 4, ks = 16, centroids = Some(cells))
    val shards = (0 until 2).map(i =>
      Similarity.buildIvfPqIndex(
        Similarity.routeByCellMap(corpus, cells, map1, 2)
          .filter(col("shard") === i).drop("shard"),
        nlist = nlist, m = 4, ks = 16, centroids = Some(cells),
        codebook = Some(full.codebook)))
    Similarity.shardCellMapFromState(shards.map(_.codes), nlist,
      2).toSeq shouldBe map1.toSeq
    // a state row naming a cell outside the codebook fails fast
    intercept[IllegalArgumentException] {
      Similarity.shardCellMapFromState(
        Seq(corpus.select((col("vec_id") + 100).cast("int")
          .as("cell"))), nlist, 2)
    }.getMessage should include("outside")
  }

  test("scatter-gather IVF-PQ serve: exact vs merged index, routing skips untouched shards") {
    val r = new scala.util.Random(131)
    val corpus = (0 until 120).map { i =>
      (i.toLong, Array.fill(64)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val full = Similarity.buildIvfPqIndex(corpus, nlist = 8, m = 8,
      ks = 16)
    val map = Similarity.shardCellMap(corpus, full.cells, 3)
    val sharded = Similarity.shardByCells(corpus, full.cells, 3)
      .localCheckpoint()
    val shards = (0 until 3).map(i => Similarity.buildIvfPqIndex(
      sharded.filter(col("shard") === i).drop("shard"), nlist = 8,
      m = 8, ks = 16, centroids = Some(full.cells),
      codebook = Some(full.codebook)))
    val q = corpus.filter(col("vec_id") < 10)
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id", "rank").collect()
      .map(x => (x.getLong(0), x.getInt(2)) -> x.getLong(1)).toMap
    val merged = keyed(Similarity.queryIvfPqIndex(q, full, 4, nprobe = 3))
    // unrouted scatter == the merged-index serve, rank for rank
    keyed(Similarity.queryIvfPqIndexScatter(q, shards, 4,
      nprobe = 3)) shouldBe merged
    // routed scatter == unrouted (same rows), and at nprobe=1 a
    // single-shard home batch provably touches ONE shard
    val qHome = sharded.filter(col("shard") === 1).drop("shard")
      .orderBy("vec_id").limit(5).localCheckpoint()
    val un = keyed(Similarity.queryIvfPqIndexScatter(qHome, shards, 4,
      nprobe = 1))
    keyed(Similarity.queryIvfPqIndexScatter(qHome, shards, 4,
      nprobe = 1, cellShardMap = Some(map))) shouldBe un
    // artifact drift across shards fails fast (the merge discipline)
    intercept[IllegalArgumentException] {
      Similarity.queryIvfPqIndexScatter(q, Seq(shards(0),
        Similarity.buildIvfPqIndex(
          sharded.filter(col("shard") === 1).drop("shard"),
          nlist = 8, m = 8, ks = 16)), 4)
    }.getMessage should include("frozen codebook")
    // a malformed routing map fails fast
    intercept[IllegalArgumentException] {
      Similarity.queryIvfPqIndexScatter(q, shards, 4,
        cellShardMap = Some(Array(0, 1)))
    }.getMessage should include("nlist")
  }

  test("rebalanceIvfPqShards: moved rows only, equals fresh builds over the new cut") {
    val r = new scala.util.Random(139)
    val corpus = (0 until 120).map { i =>
      (i.toLong, Array.fill(64)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val full = Similarity.buildIvfPqIndex(corpus, nlist = 8, m = 8,
      ks = 16)
    val assign = graft.functions.Centroids.centroidAssign(
      col("embedding"), full.cells)
    val map1 = Similarity.shardCellMap(corpus, full.cells, 2)
    val b = map1.indexOf(1)
    val map2 = map1.clone(); map2(b) = 0
    def slice(map: Array[Int], i: Int) = corpus.filter(
      element_at(lit(map), assign) === i)
    def build(c: org.apache.spark.sql.DataFrame) =
      Similarity.buildIvfPqIndex(c, nlist = 8, m = 8, ks = 16,
        centroids = Some(full.cells), codebook = Some(full.codebook))
    def codeMap(i: Similarity.IvfPqIndex) = i.codes
      .select("n_id", "cell", "codes").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Byte](2))).toMap
    val oldShards = (0 until 2).map(i => build(slice(map1, i)))
    val rebalanced = Similarity.rebalanceIvfPqShards(oldShards, map1,
      map2)
    (0 until 2).foreach { i =>
      codeMap(rebalanced(i)) shouldBe codeMap(build(slice(map2, i)))
    }
    // no-op re-cut: nothing moves, nothing changes
    val noop = Similarity.rebalanceIvfPqShards(oldShards, map1, map1)
    (0 until 2).foreach(i => codeMap(noop(i)) shouldBe codeMap(oldShards(i)))
    // malformed maps fail fast
    an[IllegalArgumentException] should be thrownBy
      Similarity.rebalanceIvfPqShards(oldShards, map1, Array(0, 1))
  }

  test("gatherTopK/bruteForceTopKSharded: sharded exhaustive equals global brute force") {
    val r = new scala.util.Random(47)
    val corpus = (0 until 90).map { i =>
      (i.toLong, Array.fill(16)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") < 6)
    val parts = (0 until 3).map(i => corpus.filter(col("vec_id") % 3 === i))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id", "rank", "sim").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getDouble(3)))
      .toSet
    rows(Similarity.bruteForceTopKSharded(q, parts, 5)) shouldBe
      rows(Similarity.bruteForceTopK(q, corpus, 5))
    // the fold re-derives rank globally: per-shard rank columns are
    // discarded, ties break on (score, id) exactly like a single serve
    an[IllegalArgumentException] should be thrownBy
      Similarity.gatherTopK(Seq.empty, 5, "sim", ascending = false)
  }
}
