package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: per group, keep the k (score, id) pairs with
  * the highest score (ties broken by lowest id — fully deterministic).
  *
  * The scale story vs the two stock formulations:
  *  - `row_number() over (partition by g order by s desc)` + filter
  *    shuffles and SORTS every input row — at 100 TB the sort of the
  *    99.999% that will be discarded dominates the job;
  *  - `slice(sort_array(collect_list(...)))` partial-aggregates, but the
  *    partial buffers are UNBOUNDED (collect_list keeps everything until
  *    the final slice), so hot groups OOM the map side.
  * This aggregate's partial state is a k-element min-heap: map-side
  * combine discards below-threshold rows immediately, the shuffle
  * carries at most k pairs per (group, map task), and no sort of the
  * full input ever happens. Same plan shape as any agg — one shuffle.
  *
  * Result: `array<struct<score:double, id:bigint>>`, best-first
  * (score desc, id asc).
  */
case class TopKAggregate(scoreExpr: Expression, idExpr: Expression, k: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  // scala PriorityQueue dequeues the ordering's MAX: make "max" = worst
  // kept pair (lowest score, then highest id) so head is the eviction
  // candidate.
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  private def beats(cand: (Double, Long), worst: (Double, Long)): Boolean =
    cand._1 > worst._1 || (cand._1 == worst._1 && cand._2 < worst._2)

  private def push(buf: mutable.PriorityQueue[(Double, Long)],
                   pair: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(pair)
    else if (beats(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      push(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(push(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortWith((a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    new GenericArrayData(best.map(p => InternalRow(p._1, p._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => push(buf, (bb.getDouble, bb.getLong)))
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "top_k"
}

object TopK {
  /** Column surface: `topK(score, id, k)` — casts keep any numeric
    * score / integral id welcome.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAggregate(
      Bridge.expression(score.cast("double")),
      Bridge.expression(id.cast("long")), k).toAggregateExpression())
}
