package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Morton (Z-order) bit interleave of two int64 keys' low `bits` bits:
  * z = x₀y₀ x₁y₁ … interleaved, x taking the odd (higher) positions.
  *
  * The data-layout primitive behind multi-dimensional clustering: sort
  * or range-partition by `z` and BOTH dimensions become locally dense,
  * so parquet min/max footer stats prune scans filtered on either
  * column (or both) — the property a single-column sort only gives one
  * dimension. At 100 TB this is the difference between reading one
  * row-group stripe and reading the table for the second filter column.
  *
  * A single codegen'd static call — stays inside WholeStageCodegen in
  * the write path's projection.
  */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits > 0 && bits <= 32, s"bits must be in [1,32], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"z_value expects (bigint, bigint), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZValue.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZValue.interleave($x, $y, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "z_value"
}

object ZValue {

  /** x bit b -> z bit 2b+1; y bit b -> z bit 2b. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((x >>> b) & 1L) << (2 * b + 1)
      z |= ((y >>> b) & 1L) << (2 * b)
      b += 1
    }
    z
  }

  /** Column surface; inputs are masked to the low `bits` bits. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    Bridge.column(ZValue(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long")), bits))
}
