package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines: L2
  * normalization and symmetric int8 quantization (the standard 4×
  * storage/bandwidth cut before ANN indexing or shipping vectors to
  * trainers).
  *
  * All pure projections — no shuffle. Per-element math uses HOF lambdas
  * (cheap element-local arithmetic only — any heavy subexpression under
  * a lambda re-evaluates per element, interpreted); whole-vector
  * reductions are computed ONCE into a column and only referenced from
  * inside lambdas.
  */
object Embeddings {

  /** Left-to-right float→double sum of squares — deterministic and
    * engine-reproducible (same IEEE sequence as a sequential loop).
    */
  def l2Norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0d), (acc, x) =>
      acc + x.cast("double") * x.cast("double")))

  /** Unit-normalize: vec / ||vec|| (zero vectors pass through as zero —
    * guarded by the 1e-30 floor).
    */
  def l2Normalize(df: DataFrame, vecCol: String,
                  outCol: String = "unit_vec"): DataFrame =
    df.withColumn("__norm", greatest(l2Norm(col(vecCol)), lit(1e-30)))
      .withColumn(outCol,
        transform(col(vecCol), x => x.cast("double") / col("__norm")))
      .drop("__norm")

  /** Symmetric int8 quantization: scale = 127 / max|x|, q_i =
    * round(x_i · scale) ∈ [-127, 127]. The scale is computed once per
    * row (NOT under the lambda — that would re-run the max per
    * element), and kept in the output for dequantization
    * (x ≈ q / scale). Max quantization error per element is
    * 0.5 / scale = max|x| / 254.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("q_scale", lit(127.0) /
        greatest(aggregate(col(vecCol), lit(0.0d),
          (acc, x) => greatest(acc, abs(x.cast("double")))), lit(1e-30)))
      .withColumn("q_vec", transform(col(vecCol),
        x => round(x.cast("double") * col("q_scale")).cast("int")))

  /** Deterministic ±1 sign projection matrix (Achlioptas 2001, the
    * database-friendly Johnson–Lindenstrauss construction: entries
    * drawn uniformly from {+1, −1} give the same ε-isometry guarantee
    * as Gaussian projections at a fraction of the cost). Seeded Scala
    * PRNG so the matrix is a frozen, shippable artifact — the same
    * discipline as the d05 LSH hyperplanes — and every engine that
    * inlines the constants reproduces the projection bit-for-bit.
    *
    * @return k rows of dIn entries, each +1 or −1
    */
  def signProjectionMatrix(dIn: Int, k: Int,
                           seed: Long = 42L): Array[Array[Int]] = {
    require(dIn >= 1, s"dIn must be >= 1, got $dIn")
    require(k >= 1, s"k must be >= 1, got $k")
    val r = new scala.util.Random(seed)
    Array.fill(k, dIn)(if (r.nextBoolean()) 1 else -1)
  }

  /** Project an embedding column to k dimensions: y_j = (r_j · x)/√k
    * with r_j the matrix's ±1 rows. E‖y−y'‖² = ‖x−x'‖², so pairwise
    * distances survive within the JL ε bound (gate e06 measures the
    * distortion envelope on the fixture; spec pins exact linearity and
    * determinism). A pure per-row projection — no shuffle, k fused
    * left-to-right double dot products per row (same IEEE sequence on
    * any engine that loops the list in order) — this is the cheap
    * pre-cut that turns a 64-dim corpus into a 16-dim one before ANN
    * indexing or near-dup hashing at 1/4 the bandwidth.
    */
  def signProject(emb: Column, matrix: Array[Array[Int]]): Column = {
    val k = matrix.length
    val scale = math.sqrt(k.toDouble)
    array(matrix.map { row =>
      aggregate(zip_with(emb, typedLit(row.toSeq),
          (x, s) => x.cast("double") * s.cast("double")),
        lit(0.0d), (acc, v) => acc + v) / scale
    }: _*)
  }

  /** Per-dimension trained scalar quantizer (the FAISS `SQ8` shape —
    * 8 bits per dimension against a trained per-dim [min, max] range),
    * vs [[quantizeInt8]]'s per-ROW symmetric scale. Per-dim training
    * is what makes the codec usable for asymmetric distance: every
    * corpus vector decodes against the SAME affine grid, so a query
    * stays float and compares against dequantized corpus vectors
    * without any per-row rescaling, and the corpus itself stores 1
    * byte/dim (4× under float32, 8× under float64).
    */
  final case class Sq8Model(mins: Array[Double], maxs: Array[Double]) {
    require(mins.length == maxs.length, "mins/maxs length mismatch")
    def dim: Int = mins.length
    private[ops] def pairs: Seq[(Double, Double)] = mins.zip(maxs).toSeq
  }

  /** Train the SQ8 grid: exact per-dim extrema over the FULL corpus in
    * ONE map-side-combined [[graft.functions.VectorMinMax]] aggregate
    * (fixed O(d) buffer per task, elementwise min/max merge — the
    * shuffle carries one buffer per task, never (row, dim) pairs).
    * Exact extrema mean no in-corpus value ever clamps; driver state
    * is the 2·d-double model — the codebook discipline. (FAISS also
    * offers quantile-trained ranges for outlier robustness; extrema
    * are the deterministic, oracle-replayable choice.)
    */
  def sq8Fit(df: DataFrame, embCol: String, dim: Int): Sq8Model = {
    val row = df.agg(graft.functions.VectorMinMax
        .vectorMinMax(col(embCol), dim).as("mm"))
      .head().getSeq[Double](0)
    require(row.head > 0, "sq8Fit needs a non-empty corpus")
    Sq8Model(row.slice(1, 1 + dim).toArray,
      row.slice(1 + dim, 1 + 2 * dim).toArray)
  }

  /** 8-bit codes: q_d = clamp(floor((x_d − min_d) / range_d · 255 +
    * 0.5), 0, 255) — explicit floor(·+0.5), NOT round(), because the
    * JVM and other engines disagree on half-even vs half-away rounding
    * and this formula replays bit-exactly anywhere. Degenerate dims
    * (range ≤ 0) code to 0.
    */
  def sq8Codes(emb: Column, model: Sq8Model): Column =
    zip_with(emb, typedLit(model.pairs), (x, p) => {
      val lo = p.getField("_1")
      val hi = p.getField("_2")
      val rng = hi - lo
      when(rng <= 0, lit(0)).otherwise(
        greatest(lit(0.0), least(lit(255.0),
          floor((x.cast("double") - lo) / rng * lit(255.0) + lit(0.5))))
          .cast("int"))
    })

  /** Decode codes back to the grid point: min_d + q_d · range_d / 255. */
  def sq8Dequantize(codes: Column, model: Sq8Model): Column =
    zip_with(codes, typedLit(model.pairs), (q, p) => {
      val lo = p.getField("_1")
      val hi = p.getField("_2")
      val rng = hi - lo
      when(rng <= 0, lo).otherwise(
        lo + q.cast("double") * rng / lit(255.0))
    })

  /** Encode-then-decode in one expression — the corpus side of
    * asymmetric SQ distance (the codes never materialize when the
    * pipeline only needs distances).
    */
  def sq8Roundtrip(emb: Column, model: Sq8Model): Column =
    sq8Dequantize(sq8Codes(emb, model), model)

  /** Fitted PCA transform: `basis` rows are the top-k eigenvectors of
    * the sample covariance (eigenvalue-descending, sign-normalized),
    * `eigenvalues` their variances.
    */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                            basis: Array[Array[Double]])

  /** Fit a PCA basis on a bounded deterministic sample (the
    * [[KMeans.sampleVectors]] md5-ranked scheme — the FAISS PCA-matrix
    * recipe: train the rotation on a sample, apply it distributed).
    * Driver cost: O(cap·dim²) for the covariance + O(dim³) per Jacobi
    * sweep — dim is an embedding width (≤ a few thousand), so the
    * dense eigensolve is driver-trivial; nothing here scales with the
    * corpus. Deterministic: cyclic Jacobi with fixed sweep order, sign
    * normalized so each eigenvector's largest-|component| entry is
    * positive (first index on ties), ties in eigenvalue order broken
    * by original column index (stable sort).
    */
  def pcaFit(vecs: DataFrame, idCol: String, embCol: String, k: Int,
             sampleCap: Int = 65536): PcaModel = {
    val sample = KMeans.sampleVectors(vecs, idCol, embCol, sampleCap)
    require(sample.nonEmpty, "pcaFit needs a non-empty sample")
    val dim = sample.head.length
    require(k >= 1 && k <= dim, s"k ($k) must be in [1, $dim]")
    val n = sample.length
    val mean = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0; while (i < dim) { mean(i) += v(i); i += 1 }
    }
    var i = 0
    while (i < dim) { mean(i) /= n; i += 1 }
    val cov = Array.ofDim[Double](dim, dim)
    sample.foreach { v =>
      var a = 0
      while (a < dim) {
        val ca = v(a) - mean(a)
        var b = a
        while (b < dim) { cov(a)(b) += ca * (v(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < dim) {
      var b = a
      while (b < dim) {
        cov(a)(b) /= n
        cov(b)(a) = cov(a)(b)
        b += 1
      }
      a += 1
    }
    modelFromCov(mean, cov, k)
  }

  /** Shared eigensolve + normalization tail of [[pcaFit]] /
    * [[pcaFitFromState]]: Jacobi, order components by eigenvalue desc
    * (stable on ties), take k, sign-normalize for replayability.
    */
  private def modelFromCov(mean: Array[Double], cov: Array[Array[Double]],
                           k: Int): PcaModel = {
    val dim = mean.length
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(j => (-evals(j), j))
    val top = order.take(k).toArray
    val basis = top.map { j =>
      val v = Array.tabulate(dim)(r => evecs(r)(j))
      var best = 0
      var bestA = -1.0
      var t = 0
      while (t < dim) {
        val av = math.abs(v(t))
        if (av > bestA) { bestA = av; best = t }
        t += 1
      }
      if (v(best) < 0) v.map(-_) else v
    }
    PcaModel(mean, top.map(evals), basis)
  }

  /** INCREMENTAL PCA state: one array<double> row of exact sufficient
    * statistics `[n, Σx, Σxxᵀ (upper triangle)]` over the WHOLE input
    * (not a sample — states must merge exactly), computed as a true
    * distributed aggregate ([[graft.functions.Moments]]: fixed-size
    * partial buffers, elementwise merge, the Bloom-sketch pattern; the
    * driver never sees a row). At 100 TB this is one scan emitting a
    * 17 KB row per batch.
    */
  def pcaState(df: DataFrame, embCol: String, dim: Int): DataFrame =
    df.agg(graft.functions.Moments.vectorMoments(col(embCol), dim).as("stats"))

  /** Merge PCA states by adding the sufficient statistics — EXACT for
    * a pair (double addition is commutative); chain pairwise for a
    * deterministic multi-batch fold. The corpus-growth shape: keep one
    * state row per shard/batch, fold new batches in, refit from the
    * merged state without revisiting old rows (d13/t17 discipline).
    */
  def mergePcaState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .select(posexplode(col("stats")).as(Seq("pos", "v")))
      .groupBy("pos").agg(sum("v").as("v"))
      .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("ps"))
      .select(transform(col("ps"), p => p("v")).as("stats"))

  /** Fit from a (possibly merged) state row: mean = Σx/n,
    * cov = Σxxᵀ/n − μμᵀ (the moment form — algebraically identical to
    * the centered two-pass; adequate for embedding-scale means), then
    * the same eigensolve/normalization as [[pcaFit]]. The state is one
    * tiny row — this is a driver-side finish, like every codebook fit.
    */
  def pcaFitFromState(state: DataFrame, dim: Int, k: Int): PcaModel = {
    val stats = state.select("stats").head.getSeq[Double](0).toArray
    require(stats.length == graft.functions.Moments.statsLength(dim),
      s"state length ${stats.length} does not match dim $dim")
    val n = stats(0)
    require(n > 0, "pcaFitFromState needs a non-empty state")
    val mean = Array.tabulate(dim)(i => stats(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val m2 = stats(graft.functions.Moments.triIndex(dim, i, j)) / n
      val c = m2 - mean(i) * mean(j)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    modelFromCov(mean, cov, k)
  }

  /** y = B·(x − μ): one codegen node ([[graft.functions.PcaProject]]),
    * basis as a reference object — a pure projection, free rider on
    * any scan; plan size independent of k.
    */
  def pcaProject(df: DataFrame, embCol: String, model: PcaModel,
                 outCol: String = "pca_vec"): DataFrame =
    df.withColumn(outCol,
      graft.functions.Projections.pcaProject(col(embCol), model.mean, model.basis))

  /** PCA + EIGENVALUE ALLOCATION (the OPQ non-parametric
    * initialization, Ge et al. 2013 §4.1 — FAISS's OPQ pre-rotation):
    * fit the top-k PCA basis, then PERMUTE the components so the
    * spectrum spreads across the m product-quantizer subspace blocks
    * with balanced log-determinants. PQ's high-rate distortion is
    * Σ_j (det Σ_j)^(1/sub) over its blocks; among block-diagonal
    * arrangements the block products multiply to the fixed det Σ, so
    * by AM-GM the sum is minimized when the dets are EQUAL — and
    * PCA's native eigenvalue ordering (whole spectrum into the
    * leading block) is the worst arrangement. A random rotation does
    * NOT work here: mixing destroys block-diagonality and Fischer's
    * inequality only raises Π det_j. The greedy allocation (sort
    * eigenvalues desc, place each into the non-full block with the
    * smallest running log-det) is deterministic, orthonormal (a row
    * permutation of B), and distance-preserving at full rank exactly
    * like the unpermuted basis. OpqSpec pins the quantization-error
    * cut on anisotropic data.
    *
    * `eigenvalues` is permuted alongside the rows, so
    * eigenvalues(j) still describes basis row j.
    */
  def pcaFitBalanced(vecs: DataFrame, idCol: String, embCol: String, k: Int,
                     m: Int, sampleCap: Int = 65536): PcaModel = {
    require(k % m == 0, s"m ($m) must divide k ($k)")
    balanceBlocks(pcaFit(vecs, idCol, embCol, k, sampleCap), m)
  }

  /** FULL parametric OPQ (Ge et al. 2013 §4.2): alternate codebook
    * training and the orthogonal-Procrustes rotation update until the
    * rotation is jointly optimized WITH the quantizer —
    * [[pcaFitBalanced]] is this loop's standard initialization (§4.1),
    * and FAISS's `OPQ{m}` runs exactly this refinement on top of it.
    *
    * Per iteration, on the md5-ranked driver sample (the pcaFit /
    * codebook-fit precedent — every trainer here finishes on a bounded
    * sample while ENCODING and RETRIEVAL stay distributed):
    *  1. rotate the centered sample by R, fit ks Euclidean centroids
    *     per subspace block (the PQ codebook for this R);
    *  2. reconstruct each rotated point from its nearest per-block
    *     codewords;
    *  3. update R = U Vᵀ from the SVD of M = Σ y·xᵀ (reconstruction ⊗
    *     centered input) — the orthogonal matrix minimizing
    *     ‖R·X − Y‖_F (orthogonal Procrustes), computed from
    *     [[jacobiEigen]] of MᵀM (V, σ²) with U = M·v/σ.
    * Both sub-steps are exact or monotone-approximate minimizers, so
    * the quantization objective is non-increasing across iterations
    * (spec-pinned: the iterated rotation cuts live-index distortion
    * below the balanced init on anisotropic data).
    *
    * Returns the rotation as a [[PcaModel]] (mean = sample mean from
    * the init fit; eigenvalues carried from the init — after iteration
    * the rows are no longer eigenvectors, the field documents the init
    * spectrum) plus the final flattened per-subspace codebook in
    * [[graft.functions.Pq]] layout, ready for
    * [[Similarity.rotateToBasis]] + rotated PQ / IVF+PQ retrieval.
    */
  def opqTrain(vecs: DataFrame, idCol: String, embCol: String,
               m: Int, ks: Int, iters: Int = 8, kmeansIters: Int = 8,
               sampleCap: Int = 65536, seed: Long = 42L)
      : (PcaModel, Array[Array[Double]]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val init = pcaFitBalanced(vecs, idCol, embCol,
      k = firstDim(vecs, embCol), m = m, sampleCap = sampleCap)
    val dim = init.mean.length
    require(dim % m == 0,
      s"embedding dim ($dim) must be divisible by m ($m) subspaces")
    val sub = dim / m
    val sample = KMeans.sampleVectors(vecs, idCol, embCol, sampleCap)
    val centered = sample.map { v =>
      Array.tabulate(dim)(i => v(i) - init.mean(i))
    }
    var r = init.basis
    var cb: Array[Array[Double]] = null
    var it = 0
    while (it < iters) {
      val rotated = centered.map(matVec(r, _))
      cb = Array.tabulate(m) { j =>
        KMeans.fitEuclidean(
          rotated.map(_.slice(j * sub, (j + 1) * sub)),
          ks, kmeansIters, seed + j).flatten
      }
      val recon = rotated.map { y =>
        val out = new Array[Double](dim)
        var j = 0
        while (j < m) {
          var best = 0; var bestD = Double.MaxValue
          var cIdx = 0
          while (cIdx * sub < cb(j).length) {
            var d = 0.0; var t = 0
            while (t < sub) {
              val diff = y(j * sub + t) - cb(j)(cIdx * sub + t)
              d += diff * diff; t += 1
            }
            if (d < bestD) { bestD = d; best = cIdx }
            cIdx += 1
          }
          var t = 0
          while (t < sub) {
            out(j * sub + t) = cb(j)(best * sub + t); t += 1
          }
          j += 1
        }
        out
      }
      // M = Σ y xᵀ; R = U Vᵀ from its SVD (orthogonal Procrustes)
      val mm = Array.ofDim[Double](dim, dim)
      var i = 0
      while (i < centered.length) {
        val x = centered(i); val y = recon(i)
        var a = 0
        while (a < dim) {
          val ya = y(a)
          if (ya != 0.0) {
            var b = 0
            while (b < dim) { mm(a)(b) += ya * x(b); b += 1 }
          }
          a += 1
        }
        i += 1
      }
      r = procrustesRotation(mm)
      it += 1
    }
    (PcaModel(init.mean, init.eigenvalues, r), cb)
  }

  private def firstDim(vecs: DataFrame, embCol: String): Int =
    vecs.select(size(col(embCol))).head.getInt(0)

  private def matVec(m: Array[Array[Double]], x: Array[Double]): Array[Double] =
    Array.tabulate(m.length) { a =>
      var s = 0.0; var i = 0
      while (i < x.length) { s += m(a)(i) * x(i); i += 1 }
      s
    }

  /** The orthogonal matrix U·Vᵀ nearest to having M = U·Σ·Vᵀ — SVD via
    * [[jacobiEigen]] of MᵀM (eigencols = V, σ = √λ), U columns from
    * M·v/σ; near-null singular directions (σ ≤ 1e-12·σmax) complete by
    * Gram-Schmidt against the accepted columns so U stays orthonormal
    * even on degenerate M.
    */
  private[ops] def procrustesRotation(mm: Array[Array[Double]]): Array[Array[Double]] = {
    val dim = mm.length
    val ata = Array.ofDim[Double](dim, dim)
    for (a <- 0 until dim; b <- a until dim) {
      var s = 0.0; var t = 0
      while (t < dim) { s += mm(t)(a) * mm(t)(b); t += 1 }
      ata(a)(b) = s; ata(b)(a) = s
    }
    val (evals, v) = jacobiEigen(ata)
    val order = evals.indices.sortBy(j => (-evals(j), j)).toArray
    val sigMax = math.sqrt(math.max(evals(order(0)), 0.0))
    val u = Array.ofDim[Double](dim, dim) // columns
    val vCols = Array.ofDim[Double](dim, dim)
    var filled = 0
    order.foreach { j =>
      val sig = math.sqrt(math.max(evals(j), 0.0))
      val vj = Array.tabulate(dim)(t => v(t)(j))
      vCols.indices.foreach(t => vCols(t)(filled) = vj(t))
      if (sig > 1e-12 * math.max(sigMax, 1e-300)) {
        val uj = matVec(mm, vj).map(_ / sig)
        u.indices.foreach(t => u(t)(filled) = uj(t))
      } else {
        // complete with a unit vector orthogonal to accepted columns
        var e = 0
        var done = false
        while (e < dim && !done) {
          val cand = Array.tabulate(dim)(t => if (t == e) 1.0 else 0.0)
          var c = 0
          while (c < filled) {
            var d = 0.0; var t = 0
            while (t < dim) { d += cand(t) * u(t)(c); t += 1 }
            t = 0
            while (t < dim) { cand(t) -= d * u(t)(c); t += 1 }
            c += 1
          }
          val nrm = math.sqrt(cand.map(x => x * x).sum)
          if (nrm > 1e-6) {
            u.indices.foreach(t => u(t)(filled) = cand(t) / nrm)
            done = true
          }
          e += 1
        }
        require(done, "could not complete an orthonormal basis for U")
      }
      filled += 1
    }
    // R = U Vᵀ, as basis ROWS (y = R x convention)
    Array.tabulate(dim, dim) { (a, b) =>
      var s = 0.0; var j = 0
      while (j < dim) { s += u(a)(j) * vCols(b)(j); j += 1 }
      s
    }
  }

  /** The OPQ eigenvalue-allocation greedy, shared by the exact and
    * truncated balanced fits: permute an eigenvalue-descending model's
    * components so the spectrum spreads across the m PQ blocks.
    */
  private def balanceBlocks(m0: PcaModel, m: Int): PcaModel = {
    val k = m0.eigenvalues.length
    val sub = k / m
    val logSum = new Array[Double](m)
    val counts = new Array[Int](m)
    val blockOf = new Array[Int](k)
    // Balanced log-dets = LPT scheduling on item costs −log λ: process
    // components by DESCENDING cost (ascending λ — pcaFit delivers
    // them descending, so iterate in reverse) and place each into the
    // non-full block with the LARGEST running log-product (= smallest
    // accumulated cost). The naive "min product gets the next largest
    // eigenvalue" reading degenerates for spectra entirely below 1:
    // every log is negative, the current minimum only ever attracts
    // more mass, and the allocation collapses back to PCA's native
    // order (observed, not hypothesized). Ties break to the emptier
    // block so the first m items seed m distinct blocks.
    // Costs are normalized by λmax (log λ − log λmax ≤ 0): the
    // balanced-log-det objective is scale-invariant but this greedy is
    // not — with any eigenvalue above 1 the first block's positive
    // logSum would stay maximal and absorb components until full,
    // the exact contiguous-spectrum arrangement the permutation exists
    // to avoid.
    val logMax = math.log(math.max(m0.eigenvalues.max, 1e-300))
    for (j <- (k - 1) to 0 by -1) {
      var best = -1
      for (b <- 0 until m) {
        if (counts(b) < sub && (best < 0 ||
            logSum(b) > logSum(best) ||
            (logSum(b) == logSum(best) && counts(b) < counts(best)))) {
          best = b
        }
      }
      blockOf(j) = best
      counts(best) += 1
      logSum(best) += math.log(math.max(m0.eigenvalues(j), 1e-300)) - logMax
    }
    // block-major order: block 0's components (in arrival order), then 1…
    val order = (0 until m).flatMap(b => (0 until k).filter(blockOf(_) == b))
    PcaModel(m0.mean, order.map(m0.eigenvalues).toArray,
      order.map(m0.basis).toArray)
  }

  /** TRUNCATED randomized PCA for k ≪ dim (Halko–Martinsson–Tropp
    * randomized subspace iteration): the production-embedding-width
    * path (dim 768–4096) where the exact pipeline is unusable — the
    * dense covariance is O(dim²) memory and the Jacobi eigensolve
    * O(dim³) time (≈8.6e9 flops PER SWEEP at dim 2048). This path
    * never materializes the covariance: it applies it as mat-vec
    * products against the bounded sample,
    * A·q = (1/n) Σᵢ (xᵢ−μ)((xᵢ−μ)·q), so the fit is
    * O(n·dim·l·iters) time and O(dim·l) extra memory for the block of
    * l = k + oversample probe vectors.
    *
    * Fully deterministic (gate-friendly): the Gaussian test block
    * comes from a splitmix64-hashed Box–Muller stream (no
    * java.util.Random state), orthonormalization is modified
    * Gram-Schmidt in fixed column order, the subspace iteration count
    * is fixed, and the final small l×l Rayleigh–Ritz matrix goes
    * through the same cyclic [[jacobiEigen]] + sign/tie normalization
    * as the exact path — so on a spectrum with healthy top-k gaps the
    * result matches [[pcaFit]] on the same sample to solver precision
    * (gated: e04 at dim 512 / k 32; TruncatedPcaSpec pins dim 2048).
    *
    * Default sampleCap is 16384 (vs pcaFit's 65536): the rotation
    * trains on a sample either way (FAISS PCA-matrix recipe), and at
    * dim 2048 a 16k sample already costs 0.27 GB on the driver —
    * the cap, not the corpus, bounds driver memory exactly like every
    * codebook fit in this library.
    */
  def pcaFitTruncated(vecs: DataFrame, idCol: String, embCol: String, k: Int,
                      sampleCap: Int = 16384, oversample: Int = 8,
                      powerIters: Int = 8, seed: Long = 42L): PcaModel = {
    val sample = KMeans.sampleVectors(vecs, idCol, embCol, sampleCap)
    require(sample.nonEmpty, "pcaFitTruncated needs a non-empty sample")
    fitTruncatedFromSample(sample, k, oversample, powerIters, seed)
  }

  /** [[pcaFitTruncated]] with the OPQ eigenvalue-allocation permutation
    * of [[pcaFitBalanced]] — the production-width OPQ init
    * (OPQ{m} on 768–4096-dim embeddings), same greedy, same
    * block-major output order.
    */
  def pcaFitBalancedTruncated(vecs: DataFrame, idCol: String, embCol: String,
                              k: Int, m: Int, sampleCap: Int = 16384,
                              oversample: Int = 8, powerIters: Int = 8,
                              seed: Long = 42L): PcaModel = {
    require(k % m == 0, s"m ($m) must divide k ($k)")
    balanceBlocks(
      pcaFitTruncated(vecs, idCol, embCol, k, sampleCap, oversample,
        powerIters, seed), m)
  }

  /** INCREMENTAL state for every sample-trained codec at production
    * widths — the md5-ranked bounded sample ITSELF, as a mergeable
    * state table. [[pcaState]]'s exact moments are the right
    * incremental state at d ≤ ~512, but the O(d²) buffer is
    * unclaimable at d = 2048–4096 (the round-6/7 ceiling); every
    * trainer in this library (PCA, OPQ, k-means, PQ, SQ quantile
    * variants) instead fits on the md5-ranked deterministic sample —
    * so for a GROWING corpus the sufficient state is just that
    * sample, and top-cap-by-(md5(id), id) is exactly mergeable:
    * with per-batch caps ≥ the merge cap,
    * merge(topC(A), topC(B)) == topC(A ∪ B), deterministic,
    * layout-free, and DuckDB-replayable (the p02 hash-sampling rule).
    * Per-batch cost: one TakeOrdered of O(cap) rows — old batches are
    * never rescanned; state size is O(cap·d) rows on disk, never a
    * d×d buffer.
    */
  def sampleState(df: DataFrame, idCol: String, embCol: String,
                  cap: Int): DataFrame = {
    require(cap > 0, s"sample cap must be positive, got $cap")
    df.select(md5(col(idCol).cast("string")).as("__rk"),
        col(idCol).as("id"), col(embCol).as("emb"))
      .orderBy(col("__rk"), col("id")).limit(cap)
  }

  /** Merge two sample states at `cap`. Exact equality with the
    * one-shot state requires both inputs to have been built (or
    * previously merged) with caps ≥ `cap`.
    */
  def mergeSampleStates(a: DataFrame, b: DataFrame, cap: Int): DataFrame = {
    require(cap > 0, s"sample cap must be positive, got $cap")
    a.unionByName(b).orderBy(col("__rk"), col("id")).limit(cap)
  }

  /** Truncated randomized fit from a sample state — the
    * production-width incremental composition: maintain the mergeable
    * sample across batches, refit in O(cap·dim·l·iters) whenever the
    * model is needed. With equal caps this returns BIT-IDENTICAL
    * models to [[pcaFitTruncated]] on the full corpus (the state IS
    * the sample the one-shot fit would draw — spec-pinned).
    */
  def pcaFitTruncatedFromState(state: DataFrame, k: Int,
                               oversample: Int = 8, powerIters: Int = 8,
                               seed: Long = 42L): PcaModel = {
    val sample = state.orderBy(col("__rk"), col("id")).select(col("emb"))
      .collect()
      .map { case org.apache.spark.sql.Row(e: scala.collection.Seq[_]) =>
        e.map {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d.doubleValue()
          case other => other.asInstanceOf[Number].doubleValue()
        }.toArray
      }
    require(sample.nonEmpty, "pcaFitTruncatedFromState needs a non-empty state")
    fitTruncatedFromSample(sample, k, oversample, powerIters, seed)
  }

  /** Driver-side core of [[pcaFitTruncated]], exposed to specs so a
    * planted sample can bypass the Spark sampling.
    */
  private[ops] def fitTruncatedFromSample(sample: Array[Array[Double]], k: Int,
                                          oversample: Int, powerIters: Int,
                                          seed: Long): PcaModel = {
    val dim = sample.head.length
    require(k >= 1 && k <= dim, s"k ($k) must be in [1, $dim]")
    val n = sample.length
    val mean = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0; while (i < dim) { mean(i) += v(i); i += 1 }
    }
    var i = 0
    while (i < dim) { mean(i) /= n; i += 1 }

    val l = math.min(dim, k + math.max(0, oversample))

    // One subspace-iteration step: G = A·Q with centering on the fly
    // (the sample is never copied or centered in place). Row-major
    // dim×l blocks; w = (x−μ)ᵀQ then G += (x−μ)wᵀ keeps the inner
    // loops contiguous.
    def applyCov(q: Array[Array[Double]]): Array[Array[Double]] = {
      val g = Array.ofDim[Double](dim, l)
      val w = new Array[Double](l)
      sample.foreach { x =>
        java.util.Arrays.fill(w, 0.0)
        var r = 0
        while (r < dim) {
          val c = x(r) - mean(r)
          if (c != 0.0) {
            val qr = q(r)
            var j = 0
            while (j < l) { w(j) += c * qr(j); j += 1 }
          }
          r += 1
        }
        r = 0
        while (r < dim) {
          val c = x(r) - mean(r)
          if (c != 0.0) {
            val gr = g(r)
            var j = 0
            while (j < l) { gr(j) += c * w(j); j += 1 }
          }
          r += 1
        }
      }
      val inv = 1.0 / n
      g.foreach { row =>
        var j = 0; while (j < l) { row(j) *= inv; j += 1 }
      }
      g
    }

    // Modified Gram-Schmidt over columns, fixed order. A column that
    // collapses (numerically dependent block — e.g. dim barely above
    // k on near-low-rank data) is refreshed from a shifted hash
    // stream and re-orthogonalized, keeping the run deterministic.
    def orthonormalize(mcols: Array[Array[Double]]): Unit = {
      var j = 0
      var refresh = 0
      while (j < l) {
        var jj = 0
        while (jj < j) {
          var dot = 0.0
          var r = 0
          while (r < dim) { dot += mcols(r)(jj) * mcols(r)(j); r += 1 }
          r = 0
          while (r < dim) { mcols(r)(j) -= dot * mcols(r)(jj); r += 1 }
          jj += 1
        }
        var nrm = 0.0
        var r = 0
        while (r < dim) { nrm += mcols(r)(j) * mcols(r)(j); r += 1 }
        nrm = math.sqrt(nrm)
        if (nrm > 1e-10) {
          r = 0
          while (r < dim) { mcols(r)(j) /= nrm; r += 1 }
          j += 1
        } else {
          refresh += 1
          require(refresh <= 3 * l, "orthonormalization failed to recover")
          r = 0
          while (r < dim) {
            mcols(r)(j) = hashGauss(seed + 7919L * refresh, r.toLong * l + j)
            r += 1
          }
        }
      }
    }

    val q = Array.tabulate(dim, l)((r, j) => hashGauss(seed, r.toLong * l + j))
    orthonormalize(q)
    var it = 0
    var cur = q
    while (it < powerIters) {
      cur = applyCov(cur)
      orthonormalize(cur)
      it += 1
    }
    // Rayleigh–Ritz: B = Qᵀ(AQ) is l×l — the only eigensolve, on a
    // matrix whose size is set by k, not dim.
    val z = applyCov(cur)
    val b = Array.ofDim[Double](l, l)
    for (a <- 0 until l; c <- a until l) {
      var s = 0.0
      var r = 0
      while (r < dim) { s += cur(r)(a) * z(r)(c); r += 1 }
      b(a)(c) = s
      b(c)(a) = s
    }
    val (evals, w) = jacobiEigen(b)
    val order = evals.indices.sortBy(j => (-evals(j), j))
    val top = order.take(k).toArray
    val basis = top.map { j =>
      val v = new Array[Double](dim)
      var r = 0
      while (r < dim) {
        var s = 0.0
        var a = 0
        while (a < l) { s += cur(r)(a) * w(a)(j); a += 1 }
        v(r) = s
        r += 1
      }
      var best = 0
      var bestA = -1.0
      var t = 0
      while (t < dim) {
        val av = math.abs(v(t))
        if (av > bestA) { bestA = av; best = t }
        t += 1
      }
      if (v(best) < 0) v.map(-_) else v
    }
    PcaModel(mean, top.map(evals), basis)
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic standard Gaussian from (seed, idx): two splitmix64
    * uniforms through Box–Muller. No shared PRNG state — any (seed,
    * idx) cell is reproducible in isolation.
    */
  private[ops] def hashGauss(seed: Long, idx: Long): Double = {
    val u1 = (mix64(seed ^ mix64(idx)) >>> 11).toDouble / (1L << 53).toDouble
    val u2 = (mix64(seed ^ mix64(idx + 0x5851F42D4C957F2DL)) >>> 11).toDouble /
      (1L << 53).toDouble
    math.sqrt(-2.0 * math.log(math.max(u1, 1e-300))) *
      math.cos(2.0 * math.Pi * u2)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector MATRIX with eigenvectors as columns).
    * Deterministic fixed sweep order; converges quadratically — 30
    * sweeps is far past machine precision for embedding-width
    * matrices.
    */
  private[ops] def jacobiEigen(mIn: Array[Array[Double]],
                               maxSweeps: Int = 30,
                               tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val dim = mIn.length
    val m = mIn.map(_.clone())
    val v = Array.tabulate(dim, dim)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(m)
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          val apq = m(p)(q)
          if (math.abs(apq) > tol / (dim * dim)) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < dim) {
              val mrp = m(r)(p); val mrq = m(r)(q)
              m(r)(p) = c * mrp - s * mrq
              m(r)(q) = s * mrp + c * mrq
              r += 1
            }
            r = 0
            while (r < dim) {
              val mpr = m(p)(r); val mqr = m(q)(r)
              m(p)(r) = c * mpr - s * mqr
              m(q)(r) = s * mpr + c * mqr
              r += 1
            }
            r = 0
            while (r < dim) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(m)
      sweep += 1
    }
    (Array.tabulate(dim)(j => m(j)(j)), v)
  }

  private def offDiagNorm(m: Array[Array[Double]]): Double = {
    var s = 0.0
    var a = 0
    while (a < m.length) {
      var b = 0
      while (b < m.length) {
        if (a != b) s += m(a)(b) * m(a)(b)
        b += 1
      }
      a += 1
    }
    math.sqrt(s)
  }
}
