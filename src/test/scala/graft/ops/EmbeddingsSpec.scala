package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(3.0f, 4.0f)),
    (2L, Array(-1.5f, 0.5f, 2.0f)),
    (3L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("l2Normalize yields unit vectors; zero vector stays zero") {
    val out = Embeddings.l2Normalize(vecs, "embedding")
      .select($"vec_id", Embeddings.l2Norm($"unit_vec").as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out(1L) shouldBe 1.0 +- 1e-12
    out(2L) shouldBe 1.0 +- 1e-12
    out(3L) shouldBe 0.0 +- 1e-12
  }

  test("quantizeInt8 bounds values at ±127 and dequantizes within error") {
    val rows = Embeddings.quantizeInt8(vecs, "embedding")
      .select($"vec_id", $"q_scale", $"embedding", $"q_vec").collect()
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val orig = r.getSeq[Float](2)
      val q = r.getSeq[Int](3)
      q.foreach(v => math.abs(v) should be <= 127)
      // |x - q/scale| <= 0.5/scale
      orig.zip(q).foreach { case (x, qi) =>
        math.abs(x - qi / scale) should be <= (0.5 / scale + 1e-12)
      }
    }
    // the max-|x| element hits exactly ±127
    val r1 = rows.find(_.getLong(0) == 1L).get
    r1.getSeq[Int](3) shouldBe Seq(95, 127)
  }

  private def anisotropic(n: Int, dim: Int, seed: Int) = {
    // variance decays by axis: component d has stddev 1/(d+1), so the
    // true principal axes are the coordinate axes in order
    val r = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      (i, Array.tabulate(dim)(d => (r.nextGaussian() / (d + 1)).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("signProject: exact ±1 dot products, linearity, and artifact reproducibility") {
    // the matrix is a frozen artifact: same seed -> identical entries
    val m1 = Embeddings.signProjectionMatrix(4, 3, seed = 9L)
    val m2 = Embeddings.signProjectionMatrix(4, 3, seed = 9L)
    m1.map(_.toSeq).toSeq shouldBe m2.map(_.toSeq).toSeq
    all(m1.flatten.map(math.abs).toSeq) shouldBe 1
    // projection = exact (r_j . x)/sqrt(k), verified against a driver
    // computation on small integers (no float ambiguity)
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Embeddings.signProject(col("embedding"), m1).as("p"))
      .orderBy("vec_id").collect()
      .map(r => r.getSeq[Double](1))
    val x = Array(1.0, 2.0, 3.0, 4.0)
    val expected = m1.map(row =>
      row.zip(x).map { case (s, v) => s * v }.sum / math.sqrt(3.0))
    got(0).toArray shouldBe expected
    got(1).toSeq shouldBe Seq(0.0, 0.0, 0.0)
    // linearity: P(x - y) == P(x) - P(y) up to the one trailing-ULP
    // wobble the final /sqrt(k) scaling introduces (the dot products
    // themselves are exact integers; division does not distribute in
    // IEEE, so bit equality would be a false claim)
    val dfl = Seq(
      (1L, Array(3.0f, -1.0f, 2.0f, 5.0f)),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (3L, Array(2.0f, -2.0f, 1.0f, 4.0f))) // = row1 - row2
      .toDF("vec_id", "embedding")
    val p = dfl.select(col("vec_id"),
        Embeddings.signProject(col("embedding"), m1).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    p(1L).zip(p(2L)).zip(p(3L)).foreach { case ((a, b), c) =>
      (a - b) shouldBe c +- 1e-14
    }
  }

  test("pcaFit: orthonormal basis, descending eigenvalues, deterministic") {
    val df = anisotropic(2000, 8, 11)
    val m = Embeddings.pcaFit(df, "vec_id", "embedding", k = 8)
    m.basis.length shouldBe 8
    // orthonormality: B·Bᵀ == I
    for (a <- m.basis.indices; b <- m.basis.indices) {
      val dot = m.basis(a).zip(m.basis(b)).map { case (x, y) => x * y }.sum
      dot shouldBe (if (a == b) 1.0 else 0.0) +- 1e-9
    }
    m.eigenvalues.toSeq shouldBe m.eigenvalues.sorted(Ordering[Double].reverse).toSeq
    // axis-aligned data: eigenvalues track the planted 1/(d+1)² decay
    for (d <- 0 until 8)
      m.eigenvalues(d) shouldBe (1.0 / ((d + 1.0) * (d + 1.0))) +- 0.05
    // the d-th component is the d-th coordinate axis (up to sign fixed
    // by the normalization)
    for (d <- 0 until 8)
      math.abs(m.basis(d)(d)) shouldBe 1.0 +- 0.05
    val m2 = Embeddings.pcaFit(df, "vec_id", "embedding", k = 8)
    m2.mean.toSeq shouldBe m.mean.toSeq
    m2.basis.map(_.toSeq).toSeq shouldBe m.basis.map(_.toSeq).toSeq
  }

  test("incremental PCA: merged batch states == one-shot state; fit agrees with pcaFit") {
    val df = anisotropic(2000, 8, 17)
    val b1 = df.filter($"vec_id" % 2 === 0)
    val b2 = df.filter($"vec_id" % 2 =!= 0)
    val merged = Embeddings.mergePcaState(
      Embeddings.pcaState(b1, "embedding", 8),
      Embeddings.pcaState(b2, "embedding", 8))
    val oneShot = Embeddings.pcaState(df, "embedding", 8)
    val ms = merged.select("stats").head.getSeq[Double](0)
    val os = oneShot.select("stats").head.getSeq[Double](0)
    ms.length shouldBe os.length
    ms.zip(os).foreach { case (a, b) => a shouldBe b +- 1e-9 }
    // fit from the merged state matches the direct sample fit (same
    // data, cap >= n): spectrum and basis agree to numerical precision
    val fromState = Embeddings.pcaFitFromState(merged, dim = 8, k = 8)
    val direct = Embeddings.pcaFit(df, "vec_id", "embedding", k = 8)
    fromState.eigenvalues.zip(direct.eigenvalues).foreach {
      case (a, b) => a shouldBe b +- 1e-9 }
    fromState.basis.flatMap(_.toSeq).zip(direct.basis.flatMap(_.toSeq)).foreach {
      case (a, b) => a shouldBe b +- 1e-6 }
    // three-way chain (pairwise folds) still equals one shot
    val b2a = b2.filter($"vec_id" % 4 === 1)
    val b2b = b2.filter($"vec_id" % 4 === 3)
    val chained = Embeddings.mergePcaState(
      Embeddings.mergePcaState(
        Embeddings.pcaState(b1, "embedding", 8),
        Embeddings.pcaState(b2a, "embedding", 8)),
      Embeddings.pcaState(b2b, "embedding", 8))
    chained.select("stats").head.getSeq[Double](0).zip(os).foreach {
      case (a, b) => a shouldBe b +- 1e-9 }
  }

  test("pcaProject: projected variance equals the eigenvalue; truncation keeps top variance") {
    val df = anisotropic(2000, 8, 13)
    val m = Embeddings.pcaFit(df, "vec_id", "embedding", k = 4)
    val proj = Embeddings.pcaProject(df, "embedding", m)
      .select(posexplode($"pca_vec").as(Seq("comp", "y")))
    val vars = proj.groupBy("comp")
      .agg(avg($"y" * $"y").as("v")) // components are centered by construction
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (d <- 0 until 4)
      vars(d) shouldBe m.eigenvalues(d) +- 1e-9
    // k=4 keeps the 4 largest variances of the planted spectrum
    m.eigenvalues.length shouldBe 4
    m.eigenvalues.last should be > 1.0 / 36.0 // > the 6th axis variance
  }

  test("sample state merges exactly and refits bit-identical to the one-shot truncated fit") {
    import spark.implicits._
    val r = new scala.util.Random(91)
    val vecs = (0L until 300L).map(i =>
      (i, Array.fill(24)((r.nextGaussian() * 3).toFloat)))
      .toDF("vec_id", "embedding")
    val cap = 64
    val merged = Embeddings.mergeSampleStates(
      Embeddings.sampleState(vecs.filter($"vec_id" % 3 === 0),
        "vec_id", "embedding", cap),
      Embeddings.sampleState(vecs.filter($"vec_id" % 3 =!= 0),
        "vec_id", "embedding", cap), cap)
    val oneShot = Embeddings.sampleState(vecs, "vec_id", "embedding", cap)
    // membership AND rank order equal the one-shot state over the union
    merged.select("id").as[Long].collect().toSeq shouldBe
      oneShot.select("id").as[Long].collect().toSeq
    merged.count() shouldBe cap
    // refit from the merged state == one-shot truncated fit, bitwise
    val mState = Embeddings.pcaFitTruncatedFromState(merged, k = 6)
    val mDirect = Embeddings.pcaFitTruncated(vecs, "vec_id", "embedding",
      k = 6, sampleCap = cap)
    mState.eigenvalues.toSeq shouldBe mDirect.eigenvalues.toSeq
    mState.mean.toSeq shouldBe mDirect.mean.toSeq
    mState.basis.map(_.toSeq).toSeq shouldBe mDirect.basis.map(_.toSeq).toSeq
    // a third batch folds in without touching the first two batches' rows
    val more = (300L until 400L).map(i =>
      (i, Array.fill(24)((r.nextGaussian() * 3).toFloat)))
      .toDF("vec_id", "embedding")
    val grown = Embeddings.mergeSampleStates(merged,
      Embeddings.sampleState(more, "vec_id", "embedding", cap), cap)
    val all = vecs.unionByName(more)
    grown.select("id").as[Long].collect().toSeq shouldBe
      Embeddings.sampleState(all, "vec_id", "embedding", cap)
        .select("id").as[Long].collect().toSeq
  }
}
