package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Dense affine map kernels: y = B·(x − μ) for a k×dim basis B.
  *
  * The PCA projection hot loop. As column algebra this is k
  * zip_with/aggregate HOF dot products — interpreted, k aggregate
  * nodes wide, and the plan grows with k; as ONE expression the basis
  * and mean ride as reference objects (the [[Centroids]]/[[Pq]]
  * codebook pattern), the loop is a static call inside whole-stage
  * codegen, and plan size is independent of k. Cost is O(k·dim) per
  * row; memory is the k·dim·8 B basis per executor — 32 KB at
  * 64×64, broadcast-able far past any PCA size that makes sense.
  */
object Projections {

  /** y_j = Σ_i basis[j][i]·(x_i − mean_i) (static: called from codegen). */
  def affineProject(emb: ArrayData, isFloat: Boolean, mean: Array[Double],
                    basis: Array[Array[Double]]): ArrayData = {
    val dim = math.min(emb.numElements(), mean.length)
    val centered = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      centered(i) = x - mean(i)
      i += 1
    }
    val k = basis.length
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val b = basis(j)
      var s = 0.0
      i = 0
      while (i < dim) { s += b(i) * centered(i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  def pcaProject(emb: Column, mean: Array[Double],
                 basis: Array[Array[Double]]): Column =
    Bridge.column(PcaProject(Bridge.expression(emb), mean, basis))
}

/** array<float|double> embedding -> array<double> B·(x − μ). */
case class PcaProject(child: Expression, mean: Array[Double],
                      basis: Array[Array[Double]])
    extends UnaryExpression {

  require(basis.nonEmpty, "projection basis must be non-empty")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Projections.affineProject(input.asInstanceOf[ArrayData], isFloat, mean, basis)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val basisRef = ctx.addReferenceObj("pcaBasis", basis, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Projections.affineProject($c, $isFloat, $meanRef, $basisRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pca_project"
}
