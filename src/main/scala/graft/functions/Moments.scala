package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Distributed second-moment sufficient statistics for a vector column:
  * one fixed-size buffer `[n, Σx_0..Σx_{d-1}, Σx_i·x_j (upper
  * triangle)]` per map task, elementwise-added on merge, one
  * array<double> row out. The PCA-state primitive: count + sum + outer
  * product sums determine mean and covariance exactly, and two
  * batches' buffers MERGE exactly (addition of sufficient statistics) —
  * which is what makes PCA refittable incrementally without revisiting
  * old rows. Buffer size is 1 + d + d(d+1)/2 doubles (d=64 → ~17 KB),
  * independent of row count; the shuffle carries one buffer per task.
  */
object Moments {

  def statsLength(dim: Int): Int = 1 + dim + dim * (dim + 1) / 2

  /** Flat index of Σx_i·x_j (i ≤ j) in the stats layout. */
  def triIndex(dim: Int, i: Int, j: Int): Int =
    1 + dim + (i * dim - i * (i - 1) / 2 + (j - i))

  def vectorMoments(emb: Column, dim: Int): Column =
    Bridge.column(VectorMomentsAggregate(
      Bridge.expression(emb), dim).toAggregateExpression())
}

/** array<float|double> column -> array<double> sufficient statistics. */
case class VectorMomentsAggregate(child: Expression, dim: Int,
                                  override val mutableAggBufferOffset: Int = 0,
                                  override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0, s"dim must be positive, got $dim")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](Moments.statsLength(dim))

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val emb = v.asInstanceOf[ArrayData]
      val d = math.min(dim, emb.numElements())
      buf(0) += 1.0
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        x(i) = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
        buf(1 + i) += x(i)
        i += 1
      }
      // rows shorter than dim leave their tail statistics at zero
      i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          buf(Moments.triIndex(dim, i, j)) += x(i) * x(j)
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
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
  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMomentsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMomentsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "vector_moments"
}
