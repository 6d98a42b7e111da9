package graft.ops

import graft.SparkSpec
import org.scalatest.matchers.should.Matchers._

/** Randomized truncated PCA ([[Embeddings.pcaFitTruncated]]) — the
  * production-embedding-width path (k ≪ dim) that replaces the
  * O(dim²)-memory covariance + O(dim³) Jacobi with subspace iteration
  * against the sample.
  *
  * The dim-2048 test is the one the exact path cannot run in bounded
  * time (Jacobi is ≈8.6e9 flops PER SWEEP there): correctness is
  * checked through the Rayleigh residual ‖A·v − λ·v‖ computed with
  * the same on-the-fly covariance action — an eigenpair certificate
  * that never needs a full eigensolve.
  */
class TruncatedPcaSpec extends SparkSpec {
  import spark.implicits._

  private def anisotropic(n: Int, dim: Int, seed: Int) = {
    val r = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      (i, Array.tabulate(dim)(d => (r.nextGaussian() / (d + 1)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("truncated fit matches exact Jacobi on the same sample (dim 128, k 16)") {
    val df = anisotropic(3000, 128, 31)
    val exact = Embeddings.pcaFit(df, "vec_id", "embedding", k = 16,
      sampleCap = 4096)
    val trunc = Embeddings.pcaFitTruncated(df, "vec_id", "embedding", k = 16,
      sampleCap = 4096)
    trunc.mean shouldBe exact.mean
    (0 until 16).foreach { j =>
      val rel = math.abs(trunc.eigenvalues(j) - exact.eigenvalues(j)) /
        exact.eigenvalues(j)
      rel should be < 1e-5
      val dot = trunc.basis(j).zip(exact.basis(j)).map { case (a, b) => a * b }.sum
      dot should be > (1.0 - 1e-5)
    }
  }

  test("dim 2048 planted fast-decaying spectrum: eigenpair certificate in bounded time") {
    // Planted axis-aligned decay: coordinate c has stddev 0.9^c, so the
    // covariance's top-k eigenpairs are separated (gap ratio 0.81) and
    // the true subspace is known. Sample built driver-side from the
    // deterministic hash-Gaussian stream — no Spark job, no Random
    // state.
    val n = 3000
    val dim = 2048
    val k = 16
    val sample = Array.tabulate(n) { i =>
      Array.tabulate(dim) { c =>
        Embeddings.hashGauss(99L, i.toLong * dim + c) * math.pow(0.9, c)
      }
    }
    val t0 = System.nanoTime()
    val model = Embeddings.fitTruncatedFromSample(sample, k,
      oversample = 8, powerIters = 8, seed = 42L)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"fit took $secs%.1f s")

    // basis orthonormality
    for (a <- 0 until k; b <- a until k) {
      val dot = model.basis(a).zip(model.basis(b)).map(p => p._1 * p._2).sum
      dot shouldBe (if (a == b) 1.0 else 0.0) +- 1e-9
    }
    // eigenvalues strictly decreasing, near the planted decay
    (1 until k).foreach(j =>
      model.eigenvalues(j) should be < model.eigenvalues(j - 1))
    (0 until k).foreach { j =>
      val planted = math.pow(0.9, 2 * j)
      model.eigenvalues(j) shouldBe planted +- planted * 0.15
    }
    // Rayleigh residual: v an eigenpair of the SAMPLE covariance —
    // ‖A·v − λ·v‖ ≤ tol·λ₁ — computed via the same mat-vec form the
    // fit uses, centered on the fly.
    val mean = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0; while (i < dim) { mean(i) += v(i); i += 1 }
    }
    (0 until dim).foreach(i => mean(i) /= n)
    def applyCov(v: Array[Double]): Array[Double] = {
      val out = new Array[Double](dim)
      sample.foreach { x =>
        var w = 0.0
        var r = 0
        while (r < dim) { w += (x(r) - mean(r)) * v(r); r += 1 }
        r = 0
        while (r < dim) { out(r) += (x(r) - mean(r)) * w; r += 1 }
      }
      (0 until dim).foreach(i => out(i) /= n)
      out
    }
    (0 until k).foreach { j =>
      val av = applyCov(model.basis(j))
      val resid = math.sqrt((0 until dim).map { r =>
        val d = av(r) - model.eigenvalues(j) * model.basis(j)(r)
        d * d
      }.sum)
      resid should be < model.eigenvalues(0) * 1e-7
    }
  }

  test("truncated fit is deterministic") {
    val df = anisotropic(500, 64, 7)
    val a = Embeddings.pcaFitTruncated(df, "vec_id", "embedding", k = 8)
    val b = Embeddings.pcaFitTruncated(df, "vec_id", "embedding", k = 8)
    a.eigenvalues.toSeq shouldBe b.eigenvalues.toSeq
    a.basis.map(_.toSeq).toSeq shouldBe b.basis.map(_.toSeq).toSeq
  }

  test("balanced truncated fit permutes the truncated spectrum across PQ blocks") {
    val df = anisotropic(2000, 128, 13)
    val m = 8
    val k = 32
    val plain = Embeddings.pcaFitTruncated(df, "vec_id", "embedding", k = k)
    val bal = Embeddings.pcaFitBalancedTruncated(df, "vec_id", "embedding",
      k = k, m = m)
    // pure permutation of the same fit
    bal.eigenvalues.sorted.toSeq shouldBe plain.eigenvalues.sorted.toSeq
    def blockSpread(ev: Array[Double]): Double = {
      val sums = ev.grouped(k / m).map(_.map(math.log).sum).toArray
      sums.max - sums.min
    }
    blockSpread(bal.eigenvalues) should be <
      blockSpread(plain.eigenvalues) * 0.2
  }
}
