package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reconstruction-distortion report: zero when the corpus IS the
  * codebook, monotone improvement with codebook size, and the OPQ
  * rotation's error cut visible on a live index report (the OpqSpec
  * property measured through the op instead of a raw expression).
  */
class IndexDistortionSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32
  private val m = 8

  private def aniso(n: Int) = {
    val r = new scala.util.Random(31)
    (0L until n.toLong).map { i =>
      (i, Array.tabulate(dim)(d => (r.nextGaussian() / (d + 1)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def totalMse(report: org.apache.spark.sql.DataFrame): Double = {
    val r = report.agg(
      sum(col("mse") * col("n_members")).as("se"),
      sum(col("n_members")).as("n")).head()
    r.getDouble(0) / r.getLong(1)
  }

  test("distortion is ~zero when every vector is a codebook seed") {
    // ks >= corpus size: every residual is its own codeword
    val tiny = aniso(16)
    val rep = Similarity.indexDistortion(tiny, nlist = 1, m = m, ks = 16,
      dim = dim)
    totalMse(rep) shouldBe 0.0 +- 1e-12
  }

  test("distortion decreases with larger ks") {
    val corpus = aniso(500)
    val coarse = totalMse(Similarity.indexDistortion(corpus, nlist = 4,
      m = m, ks = 8, dim = dim))
    val fine = totalMse(Similarity.indexDistortion(corpus, nlist = 4,
      m = m, ks = 64, dim = dim))
    assert(fine < coarse,
      s"ks=64 mse $fine not below ks=8 mse $coarse")
  }

  test("parametric OPQ iterations stay orthonormal and cut error below the init") {
    val corpus = aniso(1000)
    val (model, cb) = Embeddings.opqTrain(corpus, "vec_id", "embedding",
      m = m, ks = 16, iters = 6)
    // R orthonormal: R·Rᵀ = I
    val r = model.basis
    for (a <- r.indices; b <- r.indices) {
      val d = r(a).zip(r(b)).map { case (x, y) => x * y }.sum
      d shouldBe (if (a == b) 1.0 else 0.0) +- 1e-8
    }
    // the iterated (rotation, codebook) pair must beat codebooks trained
    // on the init rotation alone — the parametric refinement's whole point
    val initModel = Embeddings.pcaFitBalanced(corpus, "vec_id", "embedding",
      k = dim, m = m)
    val initRot = Similarity.rotateToBasis(corpus, initModel)
    val initCb = KMeans.trainPqCodebook(initRot, "vec_id", "embedding",
      m = m, ks = 16, dim = dim, iters = 5)
    val initMse = totalMse(Similarity.indexDistortion(initRot, nlist = 1,
      m = m, ks = 16, dim = dim, codebook = Some(initCb)))
    val opqRot = Similarity.rotateToBasis(corpus, model)
    val opqMse = totalMse(Similarity.indexDistortion(opqRot, nlist = 1,
      m = m, ks = 16, dim = dim, codebook = Some(cb)))
    assert(opqMse < initMse,
      s"OPQ iterations did not improve: $opqMse vs init $initMse")
  }

  test("OPQ rotation cuts the live-index distortion on anisotropic data") {
    val corpus = aniso(1000)
    val plainCb = KMeans.trainPqCodebook(corpus, "vec_id", "embedding",
      m = m, ks = 16, dim = dim, iters = 5)
    val model = Embeddings.pcaFitBalanced(corpus, "vec_id", "embedding",
      k = dim, m = m)
    val rotated = Similarity.rotateToBasis(corpus, model)
    val rotCb = KMeans.trainPqCodebook(rotated, "vec_id", "embedding",
      m = m, ks = 16, dim = dim, iters = 5)
    // nlist=1 so the residual step is a constant shift — isolates PQ error
    val plain = totalMse(Similarity.indexDistortion(corpus, nlist = 1,
      m = m, ks = 16, dim = dim, codebook = Some(plainCb)))
    val rot = totalMse(Similarity.indexDistortion(rotated, nlist = 1,
      m = m, ks = 16, dim = dim, codebook = Some(rotCb)))
    assert(rot < plain * 0.9,
      s"rotation did not cut distortion: rotated $rot vs plain $plain")
  }
}
