package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Product-quantization kernels as single-pass expressions.
  *
  * A PQ codebook is `m` sub-codebooks of `ks` centroids over `sub`-dim
  * subvectors (flattened here to `double[m][ks*sub]`). Encoding and ADC
  * scoring as column algebra would be an m×ks aggregate forest (128
  * Catalyst aggregates at the defaults — Janino-hostile and
  * interpreted); these expressions keep both to one codegen'd loop with
  * the codebook attached as a reference object, the same pattern as
  * [[MinHashSignature]]'s coefficient arrays.
  */
object Pq {

  /** code_j = argmin_i ||x[j·sub .. ) - cb[j][i·sub .. )||², ties to the
    * lowest centroid id.
    */
  def encode(emb: ArrayData, isFloat: Boolean, cb: Array[Array[Double]],
             sub: Int): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      val ks = cbj.length / sub
      var best = 0
      var bestD = Double.MaxValue
      var i = 0
      while (i < ks) {
        var d = 0.0
        var t = 0
        while (t < sub) {
          val x = if (isFloat) emb.getFloat(j * sub + t).toDouble
                  else emb.getDouble(j * sub + t)
          val diff = x - cbj(i * sub + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance: Σ_j ||q[j·sub ..) - cb[j][code_j·sub ..)||². */
  def adc(q: ArrayData, isFloat: Boolean, codes: ArrayData,
          cb: Array[Array[Double]], sub: Int): Double = {
    val m = cb.length
    var d = 0.0
    var j = 0
    while (j < m) {
      val cbj = cb(j)
      val c = codes.getInt(j)
      var t = 0
      while (t < sub) {
        val x = if (isFloat) q.getFloat(j * sub + t).toDouble
                else q.getDouble(j * sub + t)
        val diff = x - cbj(c * sub + t)
        d += diff * diff
        t += 1
      }
      j += 1
    }
    d
  }
}

/** array<float|double> embedding -> array<int> PQ codes. */
case class PqEncode(child: Expression, codebook: Array[Array[Double]],
                    sub: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float|double>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Pq.encode(input.asInstanceOf[ArrayData], isFloat, codebook, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Pq.encode($c, $isFloat, $cbRef, $sub);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (array<float|double> query, array<int> codes) -> ADC squared distance. */
case class PqAdcDistance(left: Expression, right: Expression,
                         codebook: Array[Array[Double]], sub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc expects (array<float|double>, array<int>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(q: Any, codes: Any): Any =
    Pq.adc(q.asInstanceOf[ArrayData], isFloat, codes.asInstanceOf[ArrayData],
      codebook, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.functions.Pq.adc($q, $isFloat, $c, $cbRef, $sub);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqColumns {
  def pqEncode(emb: Column, codebook: Array[Array[Double]], sub: Int): Column =
    Bridge.column(PqEncode(Bridge.expression(emb), codebook, sub))
  def pqAdc(q: Column, codes: Column, codebook: Array[Array[Double]],
            sub: Int): Column =
    Bridge.column(PqAdcDistance(Bridge.expression(q),
      Bridge.expression(codes), codebook, sub))
}
