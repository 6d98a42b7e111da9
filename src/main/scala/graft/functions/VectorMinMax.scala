package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Distributed per-dimension extrema for a vector column: one
  * fixed-size buffer `[n, min_0..min_{d-1}, max_0..max_{d-1}]` per map
  * task, elementwise min/max on merge, one array<double> row out — the
  * scalar-quantizer (SQ8) training primitive. Like [[Moments]], the
  * buffer is O(d) and independent of row count (d=64 → ~1 KB; d=4096 →
  * 64 KB), so training the codec touches the corpus exactly once with
  * a map-side-combined aggregate and the shuffle carries one buffer
  * per task — never a (row, dim) explosion, which at 100 TB would
  * shuffle n·d rows onto d hot keys.
  */
object VectorMinMax {

  def statsLength(dim: Int): Int = 1 + 2 * dim

  def vectorMinMax(emb: Column, dim: Int): Column =
    Bridge.column(VectorMinMaxAggregate(
      Bridge.expression(emb), dim).toAggregateExpression())
}

/** array<float|double> column -> array<double> [n, mins…, maxs…]. */
case class VectorMinMaxAggregate(child: Expression, dim: Int,
                                 override val mutableAggBufferOffset: Int = 0,
                                 override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0, s"dim must be positive, got $dim")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = {
    val buf = new Array[Double](VectorMinMax.statsLength(dim))
    var i = 0
    while (i < dim) {
      buf(1 + i) = Double.PositiveInfinity
      buf(1 + dim + i) = Double.NegativeInfinity
      i += 1
    }
    buf
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val emb = v.asInstanceOf[ArrayData]
      val d = math.min(dim, emb.numElements())
      buf(0) += 1.0
      var i = 0
      while (i < d) {
        val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
        if (x < buf(1 + i)) buf(1 + i) = x
        if (x > buf(1 + dim + i)) buf(1 + dim + i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    buf(0) += other(0)
    var i = 0
    while (i < dim) {
      if (other(1 + i) < buf(1 + i)) buf(1 + i) = other(1 + i)
      if (other(1 + dim + i) > buf(1 + dim + i)) buf(1 + dim + i) = other(1 + dim + i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMinMaxAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMinMaxAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "vector_min_max"
}
