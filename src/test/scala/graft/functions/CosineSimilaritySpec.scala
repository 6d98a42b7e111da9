package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Array(1f, 0f, 2f), Array(0f, 1f, 0f)),
    (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
    (Array(1f, 0f, 0f), Array(-1f, 0f, 0f)),
    (Array(0.3f, -0.7f, 0.2f), Array(0.9f, 0.1f, -0.5f))).toDF("a", "b")

  test("fused expression matches the composable zip_with/aggregate form") {
    val both = vecs.select(
      Similarity.cosine($"a", $"b").as("fused"),
      Similarity.cosineComposable($"a", $"b").as("composed"))
      .as[(Double, Double)].collect()
    both.foreach { case (f, c) => f shouldBe c +- 1e-12 }
  }

  test("known values: identical=1, orthogonal=0, opposite=-1") {
    val out = vecs.select(Similarity.cosine($"a", $"b")).as[Double].collect()
    out(0) shouldBe 0.0 +- 1e-9
    out(1) shouldBe 1.0 +- 1e-9
    out(2) shouldBe -1.0 +- 1e-9
  }

  test("interpreted eval path (no codegen) agrees") {
    // force interpreted evaluation through a non-codegen context: eval on
    // the expression directly against catalyst rows
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types._
    val a = ArrayData.toArrayData(Array(1f, 2f, 3f))
    val b = ArrayData.toArrayData(Array(1f, 2f, 3f))
    val e = CosineSimilarity(
      Literal.create(a, ArrayType(FloatType)),
      Literal.create(b, ArrayType(FloatType)))
    e.eval(null).asInstanceOf[Double] shouldBe 1.0 +- 1e-9
  }

  test("null array input yields null (BinaryExpression null handling)") {
    val out = Seq((Some(Array(1f)), None: Option[Array[Float]]))
      .toDF("a", "b")
      .select(Similarity.cosine($"a", $"b").as("c")).collect()
    out(0).isNullAt(0) shouldBe true
  }

  test("double arrays accepted; mismatched lengths use common prefix") {
    val out = Seq((Array(1.0, 0.0), Array(1.0, 0.0, 5.0)))
      .toDF("a", "b")
      .select(Similarity.cosine($"a", $"b").as("c")).as[Double].collect()
    // prefix [1,0]·[1,0] normalized by full |b|? No: both norms over the
    // common prefix => 1.0 (documented: dense same-dim embeddings)
    out(0) shouldBe 1.0 +- 1e-9
  }
}
