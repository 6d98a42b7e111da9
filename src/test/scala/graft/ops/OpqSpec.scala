package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Eigenvalue-allocated PQ (the OPQ non-parametric init).
  *
  * PQ's distortion is Σ_j (det Σ_j)^(1/sub) over its subspace blocks:
  * axis-aligned anisotropic data in spectral order allocates the
  * spectrum maximally badly (the leading block holds nearly all the
  * variance), while the eigenvalue-allocation permutation balances the
  * block log-determinants — the AM-GM optimum among block-diagonal
  * arrangements. [[Embeddings.pcaFitBalanced]] composes the PCA basis
  * with exactly that permutation; these tests pin the error cut and
  * the retrieval contract on a fixture where the effect is
  * deterministic.
  */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32
  private val m = 8
  private val sub = dim / m

  /** Axis-aligned anisotropic gaussians: stddev 1/(d+1) per component —
    * already in PCA coordinates, the WORST layout for block-split PQ
    * (the leading block holds nearly the whole spectrum).
    */
  private def corpus = {
    val r = new scala.util.Random(31)
    (0L until 1000L).map { i =>
      (i, Array.tabulate(dim)(d => (r.nextGaussian() / (d + 1)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("eigenvalue allocation before PQ cuts quantization error on anisotropic data") {
    val vecs = corpus
    val model = Embeddings.pcaFitBalanced(vecs, "vec_id", "embedding",
      k = dim, m = m)
    val rotated = Similarity.rotateToBasis(vecs, model)
    val rawCb = KMeans.trainPqCodebook(vecs, "vec_id", "embedding",
      m = m, ks = 16, dim = dim, iters = 5)
    val rotCb = KMeans.trainPqCodebook(rotated, "vec_id", "embedding",
      m = m, ks = 16, dim = dim, iters = 5)
    import graft.functions.PqColumns
    def selfAdc(df: org.apache.spark.sql.DataFrame,
                cb: Array[Array[Double]]): Double =
      df.select(PqColumns.pqAdc(col("embedding"),
          PqColumns.pqEncode(col("embedding"), cb, sub), cb, sub).as("e"))
        .agg(avg(col("e"))).head.getDouble(0)
    val rawErr = selfAdc(vecs, rawCb)
    val rotErr = selfAdc(rotated, rotCb)
    rotErr should be < rawErr * 0.7
  }

  test("allocation balances block log-dets when eigenvalues exceed 1") {
    // The balanced-log-det objective is scale-invariant; the greedy is
    // not. Un-normalized, any spectrum above 1 keeps the first block's
    // positive logSum maximal so it absorbs the large components until
    // full — the contiguous arrangement the permutation exists to
    // avoid. Stddev (d+1) puts the top eigenvalue near (dim)² ≫ 1.
    val r = new scala.util.Random(7)
    val vecs = (0L until 1000L).map { i =>
      (i, Array.tabulate(dim)(d => (r.nextGaussian() * (d + 1)).toFloat))
    }.toDF("vec_id", "embedding")
    val model = Embeddings.pcaFitBalanced(vecs, "vec_id", "embedding",
      k = dim, m = m)
    val plain = Embeddings.pcaFit(vecs, "vec_id", "embedding", k = dim)
    plain.eigenvalues.head should be > 1.0
    // same eigenvalue multiset (pure permutation, deterministic fit)
    model.eigenvalues.sorted shouldBe plain.eigenvalues.sorted
    def blockSpread(ev: Array[Double]): Double = {
      val sums = ev.grouped(sub).map(_.map(math.log).sum).toArray
      sums.max - sums.min
    }
    // native spectral order = contiguous blocks = maximal spread
    blockSpread(model.eigenvalues) should be <
      blockSpread(plain.eigenvalues) * 0.2
  }

  test("OPQ rotation cuts residual-PQ self-ADC error on anisotropic data") {
    // The production composition (n14): rotation → trained cells →
    // trained residual codebooks. The rotation must cut the coding
    // error of the RESIDUAL path too, not just raw PQ — residuals
    // against cosine-assigned cells inherit the coordinate anisotropy.
    val vecs = corpus
    val model = Embeddings.pcaFitBalanced(vecs, "vec_id", "embedding",
      k = dim, m = m)
    val rotated = Similarity.rotateToBasis(vecs, model)
    import graft.functions.{Centroids => C, PqColumns => P}
    def residualSelfAdc(df: org.apache.spark.sql.DataFrame): Double = {
      val cells = KMeans.trainCentroidsDistributed(df, "vec_id", "embedding",
        nlist = 8, iters = 5)
      val cb = KMeans.trainResidualPqCodebook(df, "vec_id", "embedding",
        cells, m = m, ks = 16, dim = dim)
      df.select(col("embedding"),
          C.centroidAssign(col("embedding"), cells).as("cell"))
        .select(P.pqAdc(
          C.centroidResidual(col("embedding"), col("cell"), cells),
          P.pqEncode(C.centroidResidual(col("embedding"), col("cell"), cells),
            cb, sub), cb, sub).as("e"))
        .agg(avg(col("e"))).head.getDouble(0)
    }
    val rawErr = residualSelfAdc(vecs)
    val rotErr = residualSelfAdc(rotated)
    rotErr should be < rawErr * 0.7
  }

  test("rotatedPqTopK keeps the pqTopK row contract and beats-or-matches raw recall") {
    val vecs = corpus
    val model = Embeddings.pcaFitBalanced(vecs, "vec_id", "embedding",
      k = dim, m = m)
    val q = vecs.filter($"vec_id" < 10)
    val out = Similarity.rotatedPqTopK(q, vecs, k = 5, model,
      m = m, ks = 16, dim = dim)
    out.groupBy("q_id").count().collect().foreach(_.getLong(1) shouldBe 5L)
    out.select("rank").as[Int].collect().foreach(_ should be <= 5)
    // recall vs the exact euclidean top-5 (an orthonormal full-rank
    // rotation preserves euclidean distances, so the truth set is the
    // same in either space)
    val qc = q.select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val cc = vecs.select($"vec_id".as("n_id"), $"embedding".as("n_emb"))
    val exact = qc.crossJoin(cc).filter($"q_id" =!= $"n_id")
      .withColumn("d2", aggregate(zip_with($"q_emb", $"n_emb",
        (x, y) => (x.cast("double") - y.cast("double"))
          * (x.cast("double") - y.cast("double"))), lit(0.0d), _ + _))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy($"d2".asc, $"n_id")))
      .filter($"rank" <= 5).select("q_id", "n_id")
    def hits(approx: org.apache.spark.sql.DataFrame): Long =
      exact.join(approx.select("q_id", "n_id"), Seq("q_id", "n_id")).count()
    val rawCb = KMeans.trainPqCodebook(vecs, "vec_id", "embedding",
      m = m, ks = 16, dim = dim, iters = 5)
    val rawHits = hits(Similarity.pqTopK(q, vecs, k = 5, m = m, ks = 16,
      dim = dim, codebook = Some(rawCb)))
    val rotHits = hits(out)
    rotHits should be >= rawHits
  }
}
