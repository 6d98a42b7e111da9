package graft.ops

import org.apache.spark.sql.SparkSession

/** Shared persistence scaffolding for the index families' bounded
  * vector tables (coarse cells, PQ codebooks): one writer/reader pair
  * instead of a copy per index flavor, so a layout change lands
  * everywhere at once. Tables are tiny (nlist / m rows); the ordered
  * collect-back is the codebook discipline.
  */
private[ops] object IndexIo {

  def saveVectors(spark: SparkSession, dir: String, idCol: String,
                  vecCol: String, vecs: Array[Array[Double]]): Unit = {
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF(idCol, vecCol)
      .write.mode("overwrite").parquet(dir)
  }

  def loadVectors(spark: SparkSession, dir: String, idCol: String,
                  vecCol: String): Array[Array[Double]] =
    spark.read.parquet(dir).orderBy(idCol).collect()
      .map(r => r.getSeq[Double](r.fieldIndex(vecCol)).toArray)

  /** Persist a trained OPQ/PCA rotation under `dir` — ONE layout
    * (basis/mean/eigenvalues tables) shared by every rotated index
    * family, so a model-shape change cannot silently diverge between
    * the flat and layered savers.
    */
  def saveRotation(spark: SparkSession, dir: String,
                   rot: graft.ops.Embeddings.PcaModel): Unit = {
    saveVectors(spark, s"$dir/rotation_basis", "row_id", "row", rot.basis)
    saveVectors(spark, s"$dir/rotation_mean", "row_id", "row",
      Array(rot.mean))
    saveVectors(spark, s"$dir/rotation_eigenvalues", "row_id", "row",
      Array(rot.eigenvalues))
  }

  def loadRotation(spark: SparkSession,
                   dir: String): graft.ops.Embeddings.PcaModel =
    graft.ops.Embeddings.PcaModel(
      loadVectors(spark, s"$dir/rotation_mean", "row_id", "row").head,
      loadVectors(spark, s"$dir/rotation_eigenvalues", "row_id",
        "row").head,
      loadVectors(spark, s"$dir/rotation_basis", "row_id", "row"))
}
