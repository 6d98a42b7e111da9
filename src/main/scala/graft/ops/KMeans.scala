package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sampled k-means training for the centroid-based operators
  * (SemDeDup cells, IVF lists, PQ sub-codebooks).
  *
  * Scale shape: only TRAINING runs on a bounded sample — assignment of
  * the full corpus stays a distributed codegen expression
  * ([[graft.functions.CentroidAssign]]). The sample is drawn with
  * `orderBy(md5(id)).limit(cap)`, which plans as TakeOrderedAndProject
  * (each task keeps its own top-`cap`, the driver merges `cap` rows per
  * partition-batch) — deterministic, layout-independent, and never a
  * full collect. This is the FAISS recipe: k-means on ≤ ~256·k sampled
  * vectors, then one pass of distributed assignment.
  *
  * Driver memory = sample (cap·dim·8 B) + codebook (k·dim·8 B):
  * cap=65536 at dim=64 is 34 MB; nlist=10⁵ centroids at dim=64 is
  * 51 MB. Both bounded and independent of corpus size.
  *
  * Deterministic: seeded k-means++ init, Lloyd sweeps with
  * first-min/first-max tie-breaks, empty clusters reseeded to the
  * worst-assigned sample point — same inputs give the same codebook on
  * any cluster layout.
  */
object KMeans {

  /** Deterministic bounded sample of an embedding column, as driver-side
    * double vectors (md5-ranked so the sample is layout-independent).
    */
  def sampleVectors(vecs: DataFrame, idCol: String, embCol: String,
                    cap: Int): Array[Array[Double]] = {
    require(cap > 0, s"sample cap must be positive, got $cap")
    vecs.orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(cap)
      .select(col(embCol)).collect()
      .map { case Row(e: scala.collection.Seq[_]) =>
        e.map {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d.doubleValue()
          case other => other.asInstanceOf[Number].doubleValue()
        }.toArray
      }
  }

  private def l2normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v.clone() else v.map(_ / n)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
    s
  }

  /** k-means++ seeding on unit vectors with d = 1 - cos (shared by the
    * driver-side and distributed spherical trainers — identical seeds
    * given identical points and rng state).
    */
  private def ppInitSpherical(pts: Array[Array[Double]], kk: Int,
                              rng: scala.util.Random): Array[Array[Double]] = {
    val n = pts.length
    val centroids = Array.ofDim[Array[Double]](kk)
    centroids(0) = pts(rng.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var i = 0
      while (i < n) {
        val d = 1.0 - dot(pts(i), centroids(c - 1))
        if (d < minD(i)) minD(i) = d
        i += 1
      }
      val total = minD.sum
      val next =
        if (total <= 0) rng.nextInt(n)
        else {
          val target = rng.nextDouble() * total
          var acc = 0.0; var idx = 0
          while (idx < n - 1 && acc + minD(idx) < target) { acc += minD(idx); idx += 1 }
          idx
        }
      centroids(c) = pts(next).clone()
      c += 1
    }
    centroids
  }

  /** Weighted k-means++ seeding on unit vectors (d = 1 - cos): the
    * recluster step of k-means|| — candidates carry the number of
    * sample points they attract, so seeding the small candidate set
    * reproduces seeding the full sample in expectation (Bahmani et
    * al., "Scalable K-Means++", VLDB 2012).
    */
  private def ppInitWeightedSpherical(pts: Array[Array[Double]],
                                      weights: Array[Double], kk: Int,
                                      rng: scala.util.Random): Array[Array[Double]] = {
    val n = pts.length
    val centroids = Array.ofDim[Array[Double]](kk)
    // first seed ∝ weight
    val wTotal = weights.sum
    centroids(0) = {
      if (wTotal <= 0) pts(rng.nextInt(n)).clone()
      else {
        val target = rng.nextDouble() * wTotal
        var acc = 0.0; var idx = 0
        while (idx < n - 1 && acc + weights(idx) < target) { acc += weights(idx); idx += 1 }
        pts(idx).clone()
      }
    }
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var i = 0
      while (i < n) {
        val d = 1.0 - dot(pts(i), centroids(c - 1))
        if (d < minD(i)) minD(i) = d
        i += 1
      }
      var total = 0.0
      i = 0
      while (i < n) { total += weights(i) * minD(i); i += 1 }
      val next =
        if (total <= 0) rng.nextInt(n)
        else {
          val target = rng.nextDouble() * total
          var acc = 0.0; var idx = 0
          while (idx < n - 1 && acc + weights(idx) * minD(idx) < target) {
            acc += weights(idx) * minD(idx); idx += 1
          }
          idx
        }
      centroids(c) = pts(next).clone()
      c += 1
    }
    centroids
  }

  /** DISTRIBUTED k-means|| init (Bahmani et al., VLDB 2012) over the
    * persisted sample frame (`__sid`/`__unit`/`__ord` layout of
    * [[fitSphericalDistributed]]): the sequential O(n·k) D²-sampling
    * loop of k-means++ becomes `rounds` cluster passes, each scoring
    * every sample point against the current candidate set with one
    * [[graft.functions.CentroidBestSim]] codegen projection and
    * Bernoulli-selecting each point INDEPENDENTLY with probability
    * min(1, ℓ·d²/Σd²). Selection draws are md5(sid, round) uniforms —
    * deterministic and layout-independent, like every other sampling
    * step in this file. The driver then weights the ~ℓ·rounds
    * candidates by attraction counts (one CentroidAssign pass) and
    * reclusters them with weighted k-means++ — O(|C|·k) on |C| ≈ ℓ·r
    * candidates instead of O(n·k) on the full sample. With ℓ = 2k,
    * r = 4 this lifts init to the same nlist 10⁴-10⁵ ceiling as the
    * distributed Lloyd sweeps (VERDICT r4's last k-means scale nit).
    */
  private[ops] def ppInitParallelSpherical(sampleDf: DataFrame, kk: Int,
                                           rounds: Int, ell: Int,
                                           rng: scala.util.Random): Array[Array[Double]] = {
    import graft.functions.Centroids
    val cand = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val seen = scala.collection.mutable.HashSet.empty[String]
    def asVec(r: Row): Array[Double] = r.getAs[scala.collection.Seq[Any]]("__unit")
      .map(_.asInstanceOf[Number].doubleValue()).toArray
    // c0: the md5-first sample point (deterministic)
    val first = sampleDf.orderBy(col("__ord")).limit(1)
      .select(col("__sid").cast("string").as("__sid"), col("__unit"))
      .collect()(0)
    cand += asVec(first); seen += first.getString(0)
    var round = 0
    while (round < rounds) {
      val cost = greatest(lit(0.0d),
        lit(2.0d) * (lit(1.0d) -
          Centroids.centroidBestSim(col("__unit"), cand.toArray)))
      val scored = sampleDf.select(col("__sid").cast("string").as("__sid"),
        col("__unit"), col("__ord"), cost.as("__cost"))
      val total = scored.agg(sum(col("__cost"))).collect()(0).getDouble(0)
      if (total > 0) {
        // u(sid, round) < ℓ·cost/Σcost, u = md5-uniform in [0,1)
        val frac = conv(substring(
          md5(concat(col("__sid"), lit(s"#$round"))), 1, 8), 16, 10)
          .cast("double") / 4294967296.0d
        // the limit is a DEFENSIVE bound (expected selection is ℓ);
        // orderBy keeps the truncation deterministic if it ever binds
        val picked = scored
          .filter(frac * lit(total) < lit(ell.toDouble) * col("__cost"))
          .orderBy(col("__ord")).limit(8 * ell)
          .select(col("__sid"), col("__unit")).collect()
        picked.foreach { r =>
          if (seen.add(r.getString(0))) cand += asVec(r)
        }
      }
      round += 1
    }
    // top up degenerate candidate sets (tiny or collapsed samples) from
    // the deterministic sample prefix
    if (cand.length < kk) {
      sampleDf.orderBy(col("__ord")).limit(kk + cand.length)
        .select(col("__sid").cast("string").as("__sid"), col("__unit"))
        .collect().foreach { r =>
          if (cand.length < kk && seen.add(r.getString(0))) cand += asVec(r)
        }
    }
    val candidates = cand.toArray
    // weight candidates by attraction (one distributed assignment pass)
    val weights = new Array[Double](candidates.length)
    sampleDf.select(Centroids.centroidAssign(col("__unit"), candidates)
        .as("__cell"))
      .groupBy("__cell").count().collect()
      .foreach(r => weights(r.getInt(0) - 1) = r.getLong(1).toDouble)
    ppInitWeightedSpherical(candidates, weights, math.min(kk, candidates.length), rng)
  }

  /** Spherical k-means (cosine metric) on pre-collected sample vectors:
    * k-means++ init seeded by `seed`, `iters` Lloyd sweeps where the
    * centroid update is mean-then-renormalize. Cosine ties go to the
    * lower centroid id (matching [[graft.functions.CentroidAssign]]);
    * empty clusters reseed to the sample point with the worst best-sim.
    */
  def fitSpherical(sample: Array[Array[Double]], k: Int, iters: Int = 10,
                   seed: Long = 42L): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means needs a non-empty sample")
    require(k > 0, s"k must be positive, got $k")
    val pts = sample.map(l2normalize) // unit vectors: cosine == dot
    val n = pts.length
    val kk = math.min(k, n)
    val dim = pts(0).length
    val rng = new scala.util.Random(seed)
    val centroids = ppInitSpherical(pts, kk, rng)

    val assignment = new Array[Int](n)
    var it = 0
    while (it < iters) {
      // assign: argmax dot, first max wins
      var i = 0
      while (i < n) {
        var best = 0; var bestS = Double.NegativeInfinity
        var j = 0
        while (j < kk) {
          val s = dot(pts(i), centroids(j))
          if (s > bestS) { bestS = s; best = j }
          j += 1
        }
        assignment(i) = best
        i += 1
      }
      // update: mean then renormalize
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val a = assignment(i)
        val s = sums(a); val p = pts(i)
        var t = 0
        while (t < dim) { s(t) += p(t); t += 1 }
        counts(a) += 1
        i += 1
      }
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) centroids(j) = l2normalize(sums(j))
        else {
          // reseed an empty cluster to the point farthest from its own
          // centroid (lowest best-sim, first on ties) — deterministic.
          // Claim the point (assignment(worst) = j) so a SECOND empty
          // cluster in the same sweep sees it at sim 1.0 and reseeds to
          // a different point — otherwise every empty cluster this
          // sweep duplicates the same centroid.
          var worst = 0; var worstS = Double.MaxValue
          i = 0
          while (i < n) {
            val s = dot(pts(i), centroids(assignment(i)))
            if (s < worstS) { worstS = s; worst = i }
            i += 1
          }
          centroids(j) = pts(worst).clone()
          assignment(worst) = j
        }
        j += 1
      }
      it += 1
    }
    centroids
  }

  /** Train `nlist` spherical centroids from a deterministic sample of an
    * embedding DataFrame — the production path for
    * [[Similarity.ivfTopK]] / [[Similarity.semDedup]] at real nlist.
    */
  def trainCentroids(vecs: DataFrame, idCol: String, embCol: String,
                     nlist: Int, sampleCap: Int = 65536, iters: Int = 10,
                     seed: Long = 42L): Array[Array[Double]] =
    fitSpherical(sampleVectors(vecs, idCol, embCol, sampleCap), nlist,
      iters, seed)

  /** DISTRIBUTED-assignment spherical k-means: same Lloyd semantics as
    * [[fitSpherical]], but the O(n·k·dim) assignment step of every
    * sweep runs on the cluster as one [[graft.functions.CentroidAssign]]
    * codegen projection + one (cell, dim)-keyed partial-sum aggregate —
    * the driver sees only the k×dim sums and counts, never the points.
    * This lifts flat training to nlist 10⁴-10⁵, where the driver-side
    * trainer's per-sweep cost (65536·nlist·dim flops on one thread) is
    * minutes.
    *
    * k-means++ seeding stays sequential by construction (each seed
    * conditions on the last), so it runs driver-side over the first
    * `initCap` sample vectors (md5 order — a prefix of the training
    * sample, read from the SAME persisted frame the sweeps use). With
    * `initCap >= sampleCap` the seeds are IDENTICAL to
    * [[fitSpherical]]'s, and on sweeps with no empty cluster the two
    * trainers are equivalent up to floating-point summation order in
    * the mean update (pinned by KMeansSpec at small k).
    *
    * Empty clusters reseed to the globally worst-assigned points
    * (lowest best-sim against the PRE-SWEEP codebook, sample-order
    * tie-break, ascending), computed with
    * [[graft.functions.CentroidBestSim]] only on sweeps that have empty
    * cells. This is deterministic (pinned by KMeansSpec) but NOT
    * point-for-point identical to [[fitSpherical]]'s sequential claim
    * rule, which scores against partially-updated centroids — on
    * degenerate data (more cells than distinct directions) the two
    * trainers may reseed different points and converge to different,
    * equally valid codebooks.
    */
  def fitSphericalDistributed(vecs: DataFrame, idCol: String, embCol: String,
                              k: Int, sampleCap: Int = 65536,
                              iters: Int = 10, seed: Long = 42L,
                              initCap: Int = 16384,
                              initMode: String = "prefix"): Array[Array[Double]] = {
    require(k > 0, s"k must be positive, got $k")
    require(initMode == "prefix" || initMode == "parallel",
      s"initMode must be prefix|parallel, got $initMode")
    import graft.functions.Centroids
    // the same deterministic md5-ranked sample as sampleVectors, kept
    // DISTRIBUTED as unit-normalized doubles; __ord preserves sample
    // order for deterministic reseed tie-breaks. The limit plans as
    // TakeOrderedAndProject into one partition — repartition spreads
    // the sweeps back over the cluster.
    val unitExpr = {
      val d = transform(col(embCol), x => x.cast("double"))
      val nrm = sqrt(aggregate(d, lit(0.0d), (acc, x) => acc + x * x))
      when(nrm === 0.0d, d).otherwise(transform(d, x => x / nrm))
    }
    val shufflePartitions = vecs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val sampleDf = vecs
      .orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(sampleCap)
      .select(col(idCol).as("__sid"), unitExpr.as("__unit"))
      .withColumn("__ord", monotonically_increasing_id())
      .repartition(shufflePartitions)
      .persist()
    try {
      val n = sampleDf.count().toInt
      require(n > 0, "k-means needs a non-empty sample")
      val kk = math.min(k, n)
      val rng = new scala.util.Random(seed)
      var codebook =
        if (initMode == "parallel")
          // k-means|| — the init itself is distributed; driver work is
          // O(|C|·k) on ~2k·rounds candidates, viable at nlist 10⁴-10⁵
          ppInitParallelSpherical(sampleDf, kk, rounds = 4,
            ell = math.max(2 * kk, 8), rng = rng)
        else {
          // init prefix comes from the PERSISTED sample (__ord preserves
          // the md5 order; __unit is normalized with the same arithmetic
          // as l2normalize) — a second orderBy(md5).limit scan of the
          // full input would double the most expensive step of training
          val initPts = sampleDf
            .orderBy(col("__ord")).limit(math.min(math.max(initCap, kk), n))
            .select(col("__unit")).collect()
            .map { case Row(e: scala.collection.Seq[_]) =>
              e.map(_.asInstanceOf[Number].doubleValue()).toArray
            }
          ppInitSpherical(initPts, math.min(kk, initPts.length), rng)
        }
      val dim = codebook(0).length
      var it = 0
      while (it < iters) {
        val assigned = sampleDf.select(col("__ord"), col("__unit"),
          Centroids.centroidAssign(col("__unit"), codebook).as("__cell"))
        val sums = assigned
          .select(col("__cell"), posexplode(col("__unit")).as(Seq("__pos", "__v")))
          .groupBy("__cell", "__pos")
          .agg(sum("__v").as("__s"), count(lit(1)).as("__n"))
          .collect()
        val sumArr = Array.fill(kk)(new Array[Double](dim))
        val counts = new Array[Long](kk)
        sums.foreach { r =>
          val cell = r.getInt(0) - 1 // CentroidAssign ids are 1-based
          val pos = r.getInt(1)
          sumArr(cell)(pos) = r.getDouble(2)
          if (pos == 0) counts(cell) = r.getLong(3)
        }
        val next: Array[Array[Double]] = Array.tabulate(kk)(j =>
          if (counts(j) > 0) l2normalize(sumArr(j)) else null)
        val nEmpty = next.count(_ == null)
        if (nEmpty > 0) {
          val worst = assigned
            .select(col("__ord"), col("__unit"),
              Centroids.centroidBestSim(col("__unit"), codebook).as("__sim"))
            .orderBy(col("__sim"), col("__ord")).limit(nEmpty)
            .select(col("__unit")).collect()
            .map { case Row(e: scala.collection.Seq[_]) =>
              e.map(_.asInstanceOf[Number].doubleValue()).toArray
            }
          var w = 0
          var j = 0
          while (j < kk) {
            if (next(j) == null) {
              // fewer distinct sample points than empty cells: reuse the
              // worst list cyclically (mirrors the driver trainer's
              // behavior when reseeds exhaust the sample)
              next(j) = l2normalize(worst(w % worst.length))
              w += 1
            }
            j += 1
          }
        }
        codebook = next
        it += 1
      }
      codebook
    } finally { sampleDf.unpersist(); () }
  }

  /** [[trainCentroids]] with the distributed Lloyd assignment — the
    * production trainer for nlist ≥ ~10³.
    */
  def trainCentroidsDistributed(vecs: DataFrame, idCol: String, embCol: String,
                                nlist: Int, sampleCap: Int = 65536,
                                iters: Int = 10, seed: Long = 42L,
                                initCap: Int = 16384): Array[Array[Double]] =
    fitSphericalDistributed(vecs, idCol, embCol, nlist, sampleCap, iters,
      seed, initCap)

  /** [[trainCentroidsDistributed]] with the k-means|| init — BOTH init
    * and Lloyd sweeps distributed, the fully scalable trainer for
    * nlist ≥ ~10⁴ where even the one-time sequential k-means++ prefix
    * scan (O(initCap·nlist·dim) driver flops) is minutes.
    */
  def trainCentroidsScalable(vecs: DataFrame, idCol: String, embCol: String,
                             nlist: Int, sampleCap: Int = 65536,
                             iters: Int = 10, seed: Long = 42L): Array[Array[Double]] =
    fitSphericalDistributed(vecs, idCol, embCol, nlist, sampleCap, iters,
      seed, initMode = "parallel")

  /** One distributed mini-batch update of a running-mean k-means state
    * — the STREAMING/GROWING-corpus trainer the batch tiers
    * ([[trainCentroidsDistributed]], k-means‖) deliberately lack: when
    * vectors arrive in waves, refitting from scratch re-scans the whole
    * history; this folds each new batch into (centroids, per-cell
    * counts) with one assignment projection + one (cell, dim) sum
    * aggregate over the BATCH only. The update is the exact running
    * mean — new_c = (old_c·n_old + Σ_batch) / (n_old + n_batch) — i.e.
    * Spark MLlib's StreamingKMeans with decay 1 (no forgetting), the
    * well-posed distributed form of Sculley's per-point mini-batch
    * SGD (whose result depends on intra-batch order; the running mean
    * does not). Cells with no batch members keep their centroid and
    * count.
    *
    * Every updated coordinate rounds to the 1e-9 lattice (HALF_UP —
    * the t23/t25 trained-model discipline): the division's last bits
    * depend on summation order, the lattice crushes them, so the state
    * replays bit-identically engine-for-engine (gate n27) and
    * run-for-run. Assignment is the same cosine argmax every retrieval
    * tier uses (1-based [[graft.functions.Centroids]] ids).
    *
    * Driver cost per batch: the k×dim state update — same bounded
    * shape as the batch trainers; the corpus never accumulates on the
    * driver.
    */
  def miniBatchStep(centroids: Array[Array[Double]], counts: Array[Long],
                    batch: DataFrame, idCol: String, embCol: String)
      : (Array[Array[Double]], Array[Long]) = {
    require(centroids.nonEmpty && centroids.length == counts.length,
      s"state mismatch: ${centroids.length} centroids, ${counts.length} counts")
    import graft.functions.Centroids
    def rnd9(v: Double): Double =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val k = centroids.length
    val dim = centroids(0).length
    val dbl = transform(col(embCol), x => x.cast("double"))
    val sums = batch
      .select(dbl.as("__v"),
        Centroids.centroidAssign(col(embCol), centroids).as("__cell"))
      .select(col("__cell"), posexplode(col("__v")).as(Seq("__pos", "__x")))
      .groupBy("__cell", "__pos")
      .agg(sum("__x").as("__s"), count(lit(1)).as("__n"))
      .collect()
    val sumArr = Array.fill(k)(new Array[Double](dim))
    val nArr = new Array[Long](k)
    sums.foreach { r =>
      val c = r.getInt(0) - 1
      val p = r.getInt(1)
      sumArr(c)(p) = r.getDouble(2)
      if (p == 0) nArr(c) = r.getLong(3)
    }
    val newCents = Array.tabulate(k) { j =>
      if (nArr(j) == 0L) centroids(j)
      else Array.tabulate(dim) { p =>
        rnd9((centroids(j)(p) * counts(j) + sumArr(j)(p)) /
          (counts(j) + nArr(j)))
      }
    }
    (newCents, Array.tabulate(k)(j => counts(j) + nArr(j)))
  }

  /** Train a two-level (coarse/fine) spherical codebook for
    * hierarchical IVF ([[Similarity.ivfTopKHier]]): `nCoarse` coarse
    * cells over the sample, then an independent `nFine`-cell spherical
    * fit over each coarse cell's members. This is the composition
    * PLANS.md names for real list counts — per-row assignment cost
    * drops from O(nCoarse·nFine·dim) to O((nCoarse + nFine)·dim), so
    * 256×256 = 65536 virtual cells price like 512.
    *
    * A coarse cell with no sample members keeps its coarse centroid as
    * its single fine centroid (assignment stays total); a cell with
    * fewer members than nFine gets that many fine cells — global cell
    * ids are offset-compacted, never sparse.
    */
  def trainHierarchical(vecs: DataFrame, idCol: String, embCol: String,
                        nCoarse: Int, nFine: Int, sampleCap: Int = 65536,
                        iters: Int = 10, seed: Long = 42L)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    require(nFine > 0, s"nFine must be positive, got $nFine")
    val sample = sampleVectors(vecs, idCol, embCol, sampleCap)
    val coarse = fitSpherical(sample, nCoarse, iters, seed)
    val unit = sample.map(l2normalize)
    val members = Array.fill(coarse.length)(
      scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
    unit.indices.foreach { i =>
      var best = 0
      var bestS = Double.NegativeInfinity
      var j = 0
      while (j < coarse.length) {
        val s = dot(unit(i), coarse(j))
        if (s > bestS) { bestS = s; best = j }
        j += 1
      }
      members(best) += sample(i)
    }
    val fine = Array.tabulate(coarse.length) { c =>
      if (members(c).isEmpty) Array(coarse(c).clone())
      else fitSpherical(members(c).toArray, nFine, iters, seed + 1 + c)
    }
    (coarse, fine)
  }

  /** Plain (euclidean) k-means for PQ sub-codebooks: argmin squared L2,
    * mean update, same deterministic tie/empty-cluster rules.
    */
  def fitEuclidean(sample: Array[Array[Double]], k: Int, iters: Int = 10,
                   seed: Long = 42L): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means needs a non-empty sample")
    require(k > 0, s"k must be positive, got $k")
    val n = sample.length
    val kk = math.min(k, n)
    val dim = sample(0).length
    val rng = new scala.util.Random(seed)

    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    val centroids = Array.ofDim[Array[Double]](kk)
    centroids(0) = sample(rng.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var i = 0
      while (i < n) {
        val d = sqDist(sample(i), centroids(c - 1))
        if (d < minD(i)) minD(i) = d
        i += 1
      }
      val total = minD.sum
      val next =
        if (total <= 0) rng.nextInt(n)
        else {
          val target = rng.nextDouble() * total
          var acc = 0.0; var idx = 0
          while (idx < n - 1 && acc + minD(idx) < target) { acc += minD(idx); idx += 1 }
          idx
        }
      centroids(c) = sample(next).clone()
      c += 1
    }

    val assignment = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < kk) {
          val d = sqDist(sample(i), centroids(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        assignment(i) = best
        i += 1
      }
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val a = assignment(i)
        val s = sums(a); val p = sample(i)
        var t = 0
        while (t < dim) { s(t) += p(t); t += 1 }
        counts(a) += 1
        i += 1
      }
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          var t = 0
          val m = sums(j)
          while (t < dim) { m(t) /= counts(j); t += 1 }
          centroids(j) = m
        } else {
          // see fitSpherical: claim the reseed point so multiple empty
          // clusters in one sweep get distinct seeds
          var worst = 0; var worstD = -1.0
          i = 0
          while (i < n) {
            val d = sqDist(sample(i), centroids(assignment(i)))
            if (d > worstD) { worstD = d; worst = i }
            i += 1
          }
          centroids(j) = sample(worst).clone()
          assignment(worst) = j
        }
        j += 1
      }
      it += 1
    }
    centroids
  }

  /** Train a PQ codebook (m sub-codebooks × ks centroids over dim/m-dim
    * subvectors, flattened to the [[graft.functions.Pq]] layout) by
    * per-subspace euclidean k-means over the sampled vectors.
    */
  def trainPqCodebook(vecs: DataFrame, idCol: String, embCol: String,
                      m: Int, ks: Int, dim: Int, sampleCap: Int = 65536,
                      iters: Int = 10, seed: Long = 42L): Array[Array[Double]] = {
    require(dim % m == 0, s"m ($m) must divide dim ($dim)")
    val sub = dim / m
    val sample = sampleVectors(vecs, idCol, embCol, sampleCap)
    Array.tabulate(m) { j =>
      val subSample = sample.map(_.slice(j * sub, (j + 1) * sub))
      // pad short centroid sets by repeating (codebook layout expects ks)
      val cents = fitEuclidean(subSample, ks, iters, seed + j)
      val full =
        if (cents.length >= ks) cents
        else Array.tabulate(ks)(i => cents(i % cents.length))
      full.flatten
    }
  }

  /** Train a RESIDUAL PQ codebook (the FAISS IVFPQ production recipe):
    * each sampled vector is assigned to its nearest cell under
    * `centroids` and the per-subspace k-means runs over the RESIDUALS
    * (emb − centroid[cell]). Residuals concentrate around zero within a
    * cell, so the same ks spans much less space than raw-vector PQ —
    * the quantization-error win [[graft.ops.Similarity.ivfPqResidualTopK]]
    * exploits. Training stays sample-bounded; assignment here is
    * driver-side over the sample only (the data-path assignment is the
    * distributed CentroidAssign projection).
    */
  def trainResidualPqCodebook(vecs: DataFrame, idCol: String, embCol: String,
                              centroids: Array[Array[Double]],
                              m: Int, ks: Int, dim: Int,
                              sampleCap: Int = 65536, iters: Int = 10,
                              seed: Long = 42L): Array[Array[Double]] = {
    require(dim % m == 0, s"m ($m) must divide dim ($dim)")
    val sub = dim / m
    val sample = sampleVectors(vecs, idCol, embCol, sampleCap)
    val residuals = sample.map { v =>
      val cell = graft.functions.Centroids.assign(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v),
        isFloat = false, centroids) - 1
      val c = centroids(cell)
      Array.tabulate(v.length)(i => v(i) - c(i))
    }
    Array.tabulate(m) { j =>
      val subSample = residuals.map(_.slice(j * sub, (j + 1) * sub))
      val cents = fitEuclidean(subSample, ks, iters, seed + j)
      val full =
        if (cents.length >= ks) cents
        else Array.tabulate(ks)(i => cents(i % cents.length))
      full.flatten
    }
  }
}
