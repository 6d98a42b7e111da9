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
}
