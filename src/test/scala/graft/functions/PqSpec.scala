package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 2 subspaces of 2 dims, 2 centroids each — hand-checkable
  private val codebook: Array[Array[Double]] = Array(
    Array(0.0, 0.0, /*c0*/ 10.0, 10.0 /*c1*/),
    Array(5.0, 5.0, /*c0*/ -5.0, -5.0 /*c1*/))

  private val vecs = Seq(
    (1L, Array(0.1f, -0.1f, 4.0f, 6.0f)),   // codes (0, 0)
    (2L, Array(9.0f, 11.0f, -4.0f, -6.0f)), // codes (1, 1)
    (3L, Array(5.0f, 5.0f, 0.0f, 0.0f))     // codes (0 ties->? , 0)
  ).toDF("vec_id", "embedding")

  test("pqEncode picks the nearest centroid per subspace, ties to lowest") {
    val codes = vecs.select($"vec_id",
        PqColumns.pqEncode($"embedding", codebook, 2).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes(1L) shouldBe Seq(0, 0)
    codes(2L) shouldBe Seq(1, 1)
    // (5,5) is sqrt(50) from (0,0) and sqrt(50) from (10,10): tie -> c0;
    // (0,0) is sqrt(50) from both (5,5) and (-5,-5): tie -> c0
    codes(3L) shouldBe Seq(0, 0)
  }

  test("ADC distance equals the hand-computed centroid distance") {
    val q = Seq((9L, Array(1.0f, 1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val codes = vecs.filter($"vec_id" === 2)
      .select(PqColumns.pqEncode($"embedding", codebook, 2).as("codes"))
    val d = q.crossJoin(codes)
      .select(PqColumns.pqAdc($"embedding", $"codes", codebook, 2))
      .collect()(0).getDouble(0)
    // codes (1,1): centroids (10,10) and (-5,-5) vs query (1,1,1,1)
    d shouldBe (81.0 + 81.0 + 36.0 + 36.0) +- 1e-9
  }

  test("pqTopK ranks the planted nearest neighbor first") {
    // corpus clustered around two poles, INTERLEAVED by id so the
    // seeded codebook (first ks vectors) spans both clusters — train a
    // codebook on one pole and ADC can't see the other (the degenerate-
    // codebook failure mode, demonstrated by training-on-one-pole)
    val r = new scala.util.Random(7)
    def around(base: Float) =
      Array.fill(64)(base + r.nextFloat() * 0.1f)
    val corpus = (1 to 40).map(i =>
      (i.toLong, around(if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array.fill(64)(1.0f)), (200L, Array.fill(64)(-1.0f)))
      .toDF("vec_id", "embedding")
    val top = graft.ops.Similarity.pqTopK(queries, corpus, k = 5,
        m = 8, ks = 16, dim = 64)
      .filter($"rank" === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    top(100L) % 2 shouldBe 0L  // pole-1 query -> even (pole-1) neighbor
    top(200L) % 2 shouldBe 1L  // pole-2 query -> odd (pole-2) neighbor
  }
}
