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
}
