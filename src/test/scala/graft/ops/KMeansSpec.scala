package graft.ops

import graft.SparkSpec
import graft.functions.Centroids
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Int) = {
    val r = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, Array.fill(dim)(r.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("CentroidAssign agrees with the array-of-cosines formulation") {
    val vecs = randVecs(200, 16, 5)
    val cb = KMeans.sampleVectors(vecs, "vec_id", "embedding", 32)
    // the round-3 formulation, kept here as the independent reference
    val sims = array(cb.toSeq.map(c => graft.functions.CosineSimilarity
      .cosineSimilarity($"embedding", typedLit(c.toSeq))): _*)
    val legacy = array_position(sims, array_max(sims)).cast("int")
    val out = vecs.select(
      Centroids.centroidAssign($"embedding", cb).as("expr"),
      legacy.as("legacy"))
    out.filter($"expr" =!= $"legacy").count() shouldBe 0L
  }

  test("CentroidProbes agrees with the struct-sort formulation") {
    val vecs = randVecs(100, 8, 7)
    val cb = KMeans.sampleVectors(vecs, "vec_id", "embedding", 16)
    val simCols = cb.toSeq.map(c => graft.functions.CosineSimilarity
      .cosineSimilarity($"embedding", typedLit(c.toSeq)))
    val pairs = array(simCols.zipWithIndex.map { case (s, i) =>
      struct(s.as("sim"), lit(i + 1).as("cell")) }: _*)
    val legacy = slice(array_sort(pairs,
      (a, b) => when(a("sim") > b("sim"), -1).when(a("sim") < b("sim"), 1)
        .otherwise(0)), 1, 4)
    val out = vecs.select(
      Centroids.centroidProbes($"embedding", cb, 4).as("expr"),
      transform(legacy, p => p("cell")).as("legacy"))
    out.filter(to_json($"expr") =!= to_json($"legacy")).count() shouldBe 0L
  }

  test("fitSpherical: deterministic, unit-norm, separates planted clusters") {
    val r = new scala.util.Random(42)
    val anchors = Array.fill(4)(Array.fill(16)(r.nextGaussian()))
    val sample = Array.tabulate(200) { i =>
      val a = anchors(i % 4)
      a.map(x => x + 0.05 * r.nextGaussian())
    }
    val cb1 = KMeans.fitSpherical(sample, 4, iters = 10, seed = 1L)
    val cb2 = KMeans.fitSpherical(sample, 4, iters = 10, seed = 1L)
    cb1.map(_.toSeq) shouldBe cb2.map(_.toSeq)
    all(cb1.map(c => math.sqrt(c.map(x => x * x).sum))) shouldBe 1.0 +- 1e-9
    // every planted anchor direction is captured by some centroid
    anchors.foreach { a =>
      val an = math.sqrt(a.map(x => x * x).sum)
      val best = cb1.map(c => c.zip(a).map { case (x, y) => x * y }.sum / an).max
      best should be > 0.95
    }
  }

  test("fitSpherical handles k > n and empty clusters without crashing") {
    val sample = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val cb = KMeans.fitSpherical(sample, 8, iters = 3, seed = 2L)
    cb.length shouldBe 3 // capped at sample size
  }

  test("fitSphericalDistributed == fitSpherical at small k (same seeds)") {
    // initCap >= sample size makes the k-means++ seeds identical, so the
    // two trainers may differ only in floating-point summation order of
    // the mean update — pinned here to 1e-9 per element
    val vecs = randVecs(300, 16, 61)
    val sample = KMeans.sampleVectors(vecs, "vec_id", "embedding", 300)
    val driver = KMeans.fitSpherical(sample, 8, iters = 5, seed = 9L)
    val dist = KMeans.fitSphericalDistributed(vecs, "vec_id", "embedding",
      k = 8, sampleCap = 300, iters = 5, seed = 9L, initCap = 300)
    dist.length shouldBe driver.length
    driver.zip(dist).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => y shouldBe x +- 1e-9 }
    }
  }

  test("fitSphericalDistributed: empty-cluster reseed is deterministic") {
    // 5 distinct directions duplicated 4x with k=8 guarantees empty
    // cells every sweep (at most 5 can be non-empty)
    val pts = (0L until 20L).map { i =>
      val d = (i % 5).toInt
      val v = Array.tabulate(8)(j => if (j == d) 1.0f else 0.01f * d)
      (i, v)
    }.toDF("vec_id", "embedding")
    def run() = KMeans.fitSphericalDistributed(pts, "vec_id", "embedding",
      k = 8, sampleCap = 20, iters = 3, seed = 3L, initCap = 20)
    val a = run(); val b = run()
    a.map(_.toSeq) shouldBe b.map(_.toSeq)
    all(a.map(c => math.sqrt(c.map(x => x * x).sum))) shouldBe 1.0 +- 1e-9
  }

  test("k-means|| init: deterministic, recovers planted clusters, quality parity") {
    val r = new scala.util.Random(17)
    val anchors = Array.fill(6)(Array.fill(16)(r.nextGaussian()))
    val vecs = (0L until 360L).map { i =>
      val a = anchors((i % 6).toInt)
      (i, a.map(x => (x + 0.05 * r.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    def run() = KMeans.trainCentroidsScalable(vecs, "vec_id", "embedding",
      nlist = 6, sampleCap = 360, iters = 5, seed = 4L)
    val cb1 = run(); val cb2 = run()
    // deterministic across runs (hash-based Bernoulli draws, not RNG state)
    cb1.map(_.toSeq) shouldBe cb2.map(_.toSeq)
    all(cb1.map(c => math.sqrt(c.map(x => x * x).sum))) shouldBe 1.0 +- 1e-9
    // every planted anchor direction is captured by some centroid
    anchors.foreach { a =>
      val an = math.sqrt(a.map(x => x * x).sum)
      val best = cb1.map(c => c.zip(a).map { case (x, y) => x * y }.sum / an).max
      best should be > 0.95
    }
    // objective parity with the prefix-init distributed trainer
    val sample = KMeans.sampleVectors(vecs, "vec_id", "embedding", 360)
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
      }
    def objective(cb: Array[Array[Double]]): Double = sample.map { p =>
      cb.map(c => c.zip(p).map { case (x, y) => x * y }.sum).max
    }.sum / sample.length
    val prefix = KMeans.trainCentroidsDistributed(vecs, "vec_id", "embedding",
      nlist = 6, sampleCap = 360, iters = 5, seed = 4L)
    objective(cb1) should be >= objective(prefix) * 0.98
  }

  test("k-means|| init handles k > candidates and tiny samples") {
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val cb = KMeans.trainCentroidsScalable(pts, "vec_id", "embedding",
      nlist = 8, sampleCap = 3, iters = 2, seed = 5L)
    cb.length shouldBe 3 // capped at sample size
    all(cb.map(c => math.sqrt(c.map(x => x * x).sum))) shouldBe 1.0 +- 1e-9
  }

  test("ivfTopK with a k-means codebook at nlist=256: probe-all == brute force") {
    val vecs = randVecs(300, 32, 13)
    val cb = KMeans.trainCentroids(vecs, "vec_id", "embedding",
      nlist = 256, iters = 3)
    val q = vecs.filter($"vec_id" < 5)
    val ivf = Similarity.ivfTopK(q, vecs, k = 3, nlist = 256, nprobe = 256,
        centroids = Some(cb))
      .select("q_id", "n_id", "rank")
    val exact = Similarity.bruteForceTopK(q, vecs, k = 3)
      .select("q_id", "n_id", "rank")
    ivf.exceptAll(exact).count() shouldBe 0L
    exact.exceptAll(ivf).count() shouldBe 0L
  }

  test("nlist=256 assignment plans as ONE expression (no per-centroid tree)") {
    // parquet-backed: a local Seq would fold the projection into a
    // LocalRelation and evaluate the expression at plan time
    val dir = java.nio.file.Files.createTempDirectory("centroids").toString
    randVecs(50, 16, 3).write.mode("overwrite").parquet(dir)
    val vecs = spark.read.parquet(dir)
    val cb = KMeans.trainCentroids(vecs, "vec_id", "embedding",
      nlist = 256, iters = 1)
    val df = Similarity.ivfTopK(vecs.filter($"vec_id" < 2), vecs, k = 2,
      nlist = 256, nprobe = 8, centroids = Some(cb))
    val plan = df.queryExecution.optimizedPlan.toString
    // one assignment node per plan leg (a pushed-down copy may double
    // it) — NOT one subtree per centroid, the round-3 failure mode
    (plan.split("centroid_assign").length - 1) should (be >= 1 and be <= 3)
    (plan.split("centroid_probes").length - 1) should (be >= 1 and be <= 3)
    (plan.split("cosine_similarity").length - 1) should be <= 1
  }

  test("hierarchical IVF: probe-all == brute force; cells partition") {
    val vecs = randVecs(300, 32, 17)
    val cb = KMeans.trainHierarchical(vecs, "vec_id", "embedding",
      nCoarse = 8, nFine = 8, iters = 3)
    val (coarse, fine) = cb
    coarse.length shouldBe 8
    fine.length shouldBe 8
    // assignment is total and in-range: ids in [1, totalFine], all rows
    val totalFine = fine.map(_.length).sum
    val cells = vecs.select(Centroids
      .hierarchicalAssign($"embedding", coarse, fine).as("cell"))
    cells.filter($"cell" < 1 || $"cell" > totalFine).count() shouldBe 0L
    cells.count() shouldBe 300L
    // probe-all equality with exact brute force (the machinery gate:
    // a lost/duplicated/mis-offset vector breaks it)
    val q = vecs.filter($"vec_id" < 5)
    val hier = Similarity.ivfTopKHier(q, vecs, k = 3, codebook = cb,
        nprobeCoarse = 8, nprobe = totalFine)
      .select("q_id", "n_id", "rank")
    val exact = Similarity.bruteForceTopK(q, vecs, k = 3)
      .select("q_id", "n_id", "rank")
    hier.exceptAll(exact).count() shouldBe 0L
    exact.exceptAll(hier).count() shouldBe 0L
  }

  test("hierarchical assignment at 64x64 virtual cells plans as ONE node") {
    val dir = java.nio.file.Files.createTempDirectory("hiercells").toString
    randVecs(80, 16, 23).write.mode("overwrite").parquet(dir)
    val vecs = spark.read.parquet(dir)
    // 64×64 = 4096 virtual cells — far past the round-3 Janino ceiling
    // for the flat array-of-cosines formulation
    val cb = KMeans.trainHierarchical(vecs, "vec_id", "embedding",
      nCoarse = 64, nFine = 64, iters = 1)
    val df = Similarity.ivfTopKHier(vecs.filter($"vec_id" < 2), vecs,
      k = 2, codebook = cb, nprobeCoarse = 4, nprobe = 16)
    val plan = df.queryExecution.optimizedPlan.toString
    (plan.split("centroid_hier_assign").length - 1) should (be >= 1 and be <= 3)
    (plan.split("centroid_hier_probes").length - 1) should (be >= 1 and be <= 3)
    df.count() should be >= 0L // and it executes (codegen compiles)
  }

  test("semDedup with trained centroids keeps a valid exemplar set") {
    val r = new scala.util.Random(31)
    val base = Array.fill(16)(r.nextGaussian().toFloat)
    val vecs = (0L until 60L).map { i =>
      val v = if (i % 3 == 0) base.map(x => (x + 0.001f * r.nextGaussian().toFloat))
              else Array.fill(16)(r.nextGaussian().toFloat)
      (i, v)
    }.toDF("vec_id", "embedding")
    val cb = KMeans.trainCentroids(vecs, "vec_id", "embedding",
      nlist = 8, iters = 5)
    val kept = Similarity.semDedup(vecs, threshold = 0.95, nlist = 8,
      centroids = Some(cb))
    // the smallest id always survives, and near-clones in its cell drop
    kept.filter($"vec_id" === 0).count() shouldBe 1L
    kept.count() should be < 60L
    // kept rows form an antichain within each cell at the threshold
    val v = vecs.select($"vec_id", $"embedding",
      Centroids.centroidAssign($"embedding", cb).as("cell"))
    val k = kept.join(v.select("vec_id", "embedding"), "vec_id")
    val pairs = k.as("a").join(k.as("b"),
        $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
      .filter(Similarity.cosine($"a.embedding", $"b.embedding") >= 0.95)
    pairs.count() shouldBe 0L
  }

  test("semDedupHier: same drop semantics through two-level cells") {
    val r = new scala.util.Random(37)
    val base = Array.fill(16)(r.nextGaussian().toFloat)
    val vecs = (0L until 60L).map { i =>
      val v = if (i % 3 == 0) base.map(x => x + 0.001f * r.nextGaussian().toFloat)
              else Array.fill(16)(r.nextGaussian().toFloat)
      (i, v)
    }.toDF("vec_id", "embedding")
    val cb = KMeans.trainHierarchical(vecs, "vec_id", "embedding",
      nCoarse = 4, nFine = 4, iters = 5)
    val kept = Similarity.semDedupHier(vecs, threshold = 0.95, codebook = cb)
    kept.filter($"vec_id" === 0).count() shouldBe 1L
    kept.count() should be < 60L
    // survivors form an antichain within each global cell
    val v = vecs.select($"vec_id", $"embedding",
      Centroids.hierarchicalAssign($"embedding", cb._1, cb._2).as("cell"))
    val k = kept.join(v.select("vec_id", "embedding"), "vec_id")
    val pairs = k.as("a").join(k.as("b"),
        $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
      .filter(Similarity.cosine($"a.embedding", $"b.embedding") >= 0.95)
    pairs.count() shouldBe 0L
  }

  test("ivfPqTopK: probe-all == exhaustive pqTopK; trained codebooks work") {
    val vecs = randVecs(200, 32, 41)
    val q = vecs.filter($"vec_id" < 4)
    val pq = Similarity.pqTopK(q, vecs, k = 3, m = 8, ks = 16, dim = 32)
      .select("q_id", "n_id", "rank")
    val ivfpq = Similarity.ivfPqTopK(q, vecs, k = 3, nlist = 16, nprobe = 16,
        m = 8, ks = 16, dim = 32)
      .select("q_id", "n_id", "rank")
    ivfpq.exceptAll(pq).count() shouldBe 0L
    pq.exceptAll(ivfpq).count() shouldBe 0L
    // trained cells + trained codes execute and keep the row contract
    val cells = KMeans.trainCentroids(vecs, "vec_id", "embedding", 16, iters = 2)
    val codes = KMeans.trainPqCodebook(vecs, "vec_id", "embedding",
      m = 8, ks = 16, dim = 32, iters = 2)
    val partial = Similarity.ivfPqTopK(q, vecs, k = 3, nlist = 16, nprobe = 4,
      m = 8, ks = 16, dim = 32, centroids = Some(cells), codebook = Some(codes))
    partial.groupBy("q_id").count().collect().foreach(_.getLong(1) should be <= 3L)
  }

  test("residual IVFPQ: probe-all == exhaustive residual scan; residual quantizes tighter") {
    val vecs = randVecs(200, 32, 61)
    val q = vecs.filter($"vec_id" < 4)
    // probe-all equality under the deterministic default codebooks
    val base = Similarity.pqResidualTopK(q, vecs, k = 3, nlist = 16,
        m = 8, ks = 16, dim = 32)
      .select("q_id", "n_id", "rank")
    val ivf = Similarity.ivfPqResidualTopK(q, vecs, k = 3, nlist = 16,
        nprobe = 16, m = 8, ks = 16, dim = 32)
      .select("q_id", "n_id", "rank")
    ivf.exceptAll(base).count() shouldBe 0L
    base.exceptAll(ivf).count() shouldBe 0L
    // ...and under TRAINED cells + trained residual codebooks
    val cells = KMeans.trainCentroids(vecs, "vec_id", "embedding", 16, iters = 2)
    val rcb = KMeans.trainResidualPqCodebook(vecs, "vec_id", "embedding",
      cells, m = 8, ks = 16, dim = 32, iters = 2)
    val baseT = Similarity.pqResidualTopK(q, vecs, k = 3, nlist = 16,
        m = 8, ks = 16, dim = 32,
        centroids = Some(cells), codebook = Some(rcb))
      .select("q_id", "n_id", "rank")
    val ivfT = Similarity.ivfPqResidualTopK(q, vecs, k = 3, nlist = 16,
        nprobe = 16, m = 8, ks = 16, dim = 32,
        centroids = Some(cells), codebook = Some(rcb))
      .select("q_id", "n_id", "rank")
    ivfT.exceptAll(baseT).count() shouldBe 0L
    baseT.exceptAll(ivfT).count() shouldBe 0L
  }

  test("residual PQ halves quantization error on clustered data") {
    // planted clusters on the unit sphere, MORE clusters than ks: raw
    // PQ's ks sub-centroids cannot cover every cluster's position per
    // subspace; residual PQ only has to span the within-cluster noise —
    // the FAISS IVFPQ motivation, asserted as self-ADC (the exact
    // squared quantization error of each vector). Unit-norm data is
    // the cosine-ANN convention this tier assumes: the spherical cell
    // centroids are unit vectors, so residuals against them are small
    // exactly when the inputs are normalized too.
    val r = new scala.util.Random(23)
    val dim = 32
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(32)(unit(Array.fill(dim)(r.nextGaussian())))
    val vecs = (0L until 320L).map { i =>
      val c = centers((i % 32).toInt)
      val raw = unit(Array.tabulate(dim)(d => c(d) + 0.05 * r.nextGaussian()))
      (i, raw.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val cells = KMeans.trainCentroids(vecs, "vec_id", "embedding", 32, iters = 5)
    val rawCb = KMeans.trainPqCodebook(vecs, "vec_id", "embedding",
      m = 8, ks = 8, dim = dim, iters = 5)
    val resCb = KMeans.trainResidualPqCodebook(vecs, "vec_id", "embedding",
      cells, m = 8, ks = 8, dim = dim, iters = 5)
    import graft.functions.{Centroids, PqColumns}
    val sub = dim / 8
    val rawErr = vecs.select(PqColumns.pqAdc($"embedding",
        PqColumns.pqEncode($"embedding", rawCb, sub), rawCb, sub).as("e"))
      .agg(avg($"e")).head.getDouble(0)
    val resErr = vecs
      .withColumn("cell", Centroids.centroidAssign($"embedding", cells))
      .withColumn("res", Centroids.centroidResidual($"embedding", $"cell", cells))
      .select(PqColumns.pqAdc($"res",
        PqColumns.pqEncode($"res", resCb, sub), resCb, sub).as("e"))
      .agg(avg($"e")).head.getDouble(0)
    resErr should be < rawErr * 0.5
  }

  test("twoStageTopK: exhaustive candidates == brute force; narrow stays bounded") {
    val vecs = randVecs(200, 32, 53)
    val q = vecs.filter($"vec_id" < 4)
    val exact = Similarity.bruteForceTopK(q, vecs, k = 3)
      .select("q_id", "n_id", "rank")
    val wide = Similarity.twoStageTopK(q, vecs, k = 3, candidateK = 500,
        nlist = 16, nprobe = 16, m = 8, ks = 16, dim = 32)
      .select("q_id", "n_id", "rank")
    wide.exceptAll(exact).count() shouldBe 0L
    exact.exceptAll(wide).count() shouldBe 0L
    // narrow candidate budget: contract holds (<= k rows, ranks 1..k,
    // sims are TRUE cosines because the re-rank is exact)
    val narrow = Similarity.twoStageTopK(q, vecs, k = 3, candidateK = 10,
      nlist = 16, nprobe = 2, m = 8, ks = 16, dim = 32)
    narrow.groupBy("q_id").count().collect().foreach(_.getLong(1) should be <= 3L)
    narrow.select("rank").as[Int].collect().foreach(_ should be <= 3)
  }

  test("trainPqCodebook: layout + trained codes beat-or-match seeds on recall") {
    val r = new scala.util.Random(17)
    val vecs = (0L until 200L).map(i =>
      (i, Array.fill(64)(r.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val cb = KMeans.trainPqCodebook(vecs, "vec_id", "embedding",
      m = 8, ks = 16, dim = 64, iters = 5)
    cb.length shouldBe 8
    all(cb.map(_.length)) shouldBe 16 * 8
    val q = vecs.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(q, vecs, 5).select("q_id", "n_id")
    def hits(pq: org.apache.spark.sql.DataFrame): Long =
      exact.join(pq.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    val trained = hits(Similarity.pqTopK(q, vecs, 5, codebook = Some(cb)))
    trained should be > 0L
  }
}
