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

/** Buffer for [[TopKDistinctAggregate]]: the bounded id→score map plus
  * a lazily-maintained cache of its WORST entry. The cache exists so a
  * full buffer rejects a losing candidate in O(1) — without it every
  * new-id arrival rescans all k entries even when it loses, a k×
  * map-side constant the non-dedup heap variant doesn't pay. The cache
  * is invalidated (not eagerly recomputed) whenever the worst entry
  * may have changed: an insert below capacity, an eviction, or a
  * score-raise of the cached-worst id; the next full-buffer rejection
  * test recomputes it once, so the scan is amortized per ACCEPTED row,
  * not per offered row.
  */
private[functions] final class DistinctTopKBuffer {
  val m = new mutable.LongMap[Double]()
  var worstScore: Double = Double.PositiveInfinity
  var worstId: Long = Long.MinValue
  var worstValid: Boolean = false
}

/** [[TopKAggregate]] with per-id DEDUP: a repeated id occupies ONE
  * heap slot (keeping its best score) instead of crowding out distinct
  * candidates. The variant the stream-legal graph expansion serves
  * need: an unpruned h-hop expansion reaches the same node along many
  * paths, and `distinct` before the fold would be a SECOND aggregation
  * — illegal in a streaming plan. Partial state stays bounded at k
  * (id → score) entries; merge is the same dedup push, so map-side
  * combine still discards below-threshold rows immediately.
  *
  * Result and tie order are identical to [[TopKAggregate]] over the
  * deduped input: best-first (score desc, id asc).
  */
case class TopKDistinctAggregate(scoreExpr: Expression, idExpr: Expression,
                                 k: Int,
                                 override val mutableAggBufferOffset: Int = 0,
                                 override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DistinctTopKBuffer] {

  require(k > 0, s"k must be positive, got $k")

  // worst kept = lowest score, then HIGHEST id (the eviction candidate
  // under the score-desc/id-asc result order)
  private def refreshWorst(buf: DistinctTopKBuffer): Unit = {
    var ws = Double.PositiveInfinity; var wi = Long.MinValue
    buf.m.foreachEntry { (i, s) =>
      if (s < ws || (s == ws && i > wi)) { ws = s; wi = i }
    }
    buf.worstScore = ws; buf.worstId = wi; buf.worstValid = true
  }

  private def push(buf: DistinctTopKBuffer, s: Double, i: Long): Unit =
    buf.m.get(i) match {
      case Some(old) =>
        if (s > old) {
          buf.m.update(i, s)
          if (buf.worstValid && i == buf.worstId) buf.worstValid = false
        }
      case None =>
        if (buf.m.size < k) { buf.m.update(i, s); buf.worstValid = false }
        else {
          if (!buf.worstValid) refreshWorst(buf)
          if (s > buf.worstScore ||
              (s == buf.worstScore && i < buf.worstId)) {
            buf.m.subtractOne(buf.worstId); buf.m.update(i, s)
            buf.worstValid = false
          }
        }
    }

  override def createAggregationBuffer(): DistinctTopKBuffer =
    new DistinctTopKBuffer

  override def update(buf: DistinctTopKBuffer,
                      input: InternalRow): DistinctTopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      push(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: DistinctTopKBuffer,
                     other: DistinctTopKBuffer): DistinctTopKBuffer = {
    other.m.foreachEntry((i, s) => push(buf, s, i))
    buf
  }

  override def eval(buf: DistinctTopKBuffer): Any = {
    val best = buf.m.toArray.map { case (i, s) => (s, i) }.sortWith((a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    new GenericArrayData(best.map(p => InternalRow(p._1, p._2)))
  }

  override def serialize(buf: DistinctTopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.m.size)
    bb.putInt(buf.m.size)
    buf.m.foreachEntry { (i, s) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DistinctTopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => push(buf, bb.getDouble, bb.getLong))
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

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDistinctAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDistinctAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "top_k_distinct"
}

object TopK {
  /** Column surface: `topK(score, id, k)` — casts keep any numeric
    * score / integral id welcome.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAggregate(
      Bridge.expression(score.cast("double")),
      Bridge.expression(id.cast("long")), k).toAggregateExpression())

  /** [[TopKDistinctAggregate]] surface: per-id dedup inside the heap. */
  def topKDistinct(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKDistinctAggregate(
      Bridge.expression(score.cast("double")),
      Bridge.expression(id.cast("long")), k).toAggregateExpression())
}
