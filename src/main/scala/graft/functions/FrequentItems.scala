package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable aggregate.
  *
  * The 100 TB story: finding "every token/line/URL that appears at least
  * T times" with a plain `groupBy(item).count` shuffles EVERY distinct
  * item — at corpus scale the gram table is billions of rows of which a
  * few thousand matter. This sketch keeps a bounded summary (≤ capacity
  * entries) per map task, the shuffle carries only those summaries, and
  * the classic Misra–Gries guarantee bounds the undercount: for every
  * item, sketch_count ≥ true_count − N/(capacity+1), where N is the
  * total number of input rows. Hence any item with true frequency
  * > N/(capacity+1) is GUARANTEED present in the merged sketch — the
  * sketch is a complete candidate generator for that threshold, and a
  * second exact recount confined to the candidates (broadcast-joined,
  * so the big table is touched once more with no wide shuffle) turns the
  * approximate summary into an exact heavy-hitters answer. See
  * `graft.ops.Curation.heavyHitters` for that composition.
  *
  * Buffer mechanics: counts accumulate freely until the map reaches
  * 2×capacity, then one compaction subtracts the (capacity+1)-th
  * largest count from everything and drops non-positives (≤ capacity
  * survive). Every unit subtracted is witnessed by ≥ capacity+1 items
  * losing a unit at once, which is what yields the N/(capacity+1)
  * bound; the batched (2k → k) schedule makes updates amortized O(1)
  * instead of the textbook O(k) decrement-all. Merging concatenates the
  * two maps (summing shared keys) and compacts the same way — the
  * standard mergeable-summaries result (Agarwal et al., PODS 2012)
  * keeps the same error bound under arbitrary merge trees, so the
  * result is a valid sketch whatever order Spark merges partials in.
  *
  * NOTE: the sketch CONTENTS (which sub-threshold items survive, and
  * their residual counts) depend on merge order, which Spark does not
  * fix — so this aggregate alone is deterministic only up to the MG
  * guarantee. Gates therefore never hash the raw sketch; they gate the
  * exact sketch→recount composition, whose output IS deterministic.
  *
  * Result: `array<struct<item:string, count:bigint>>`, count desc then
  * item asc (ordering is cosmetic; consumers treat it as a set).
  */
case class MisraGriesAggregate(itemExpr: Expression, capacity: Int,
                               override val mutableAggBufferOffset: Int = 0,
                               override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    new mutable.HashMap[String, Long]()

  /** Subtract the (capacity+1)-th largest count and drop non-positives. */
  private def compact(buf: mutable.HashMap[String, Long]): Unit =
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { k =>
        val left = buf(k) - cut
        if (left > 0) buf(k) = left else dead += k
      }
      dead.foreach(buf.remove)
    }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = itemExpr.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.update(s, buf.getOrElse(s, 0L) + 1L)
      if (buf.size >= 2 * capacity) compact(buf)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    compact(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    compact(buf)
    val rows = buf.toArray.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else a._1 < b._1
    }
    new GenericArrayData(rows.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })
  }

  // Keys are length-prefixed raw UTF-8 (not writeUTF, whose modified-UTF-8
  // form is capped at 65535 bytes — corpus lines and long n-grams exceed it).
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, StandardCharsets.UTF_8), in.readLong())
    }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)

  override def children: Seq[Expression] = Seq(itemExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "misra_gries"
}

object FrequentItems {
  /** Column surface: `mgSketch(item, capacity)` over a string column. */
  def mgSketch(item: Column, capacity: Int): Column =
    Bridge.column(MisraGriesAggregate(
      Bridge.expression(item.cast("string")), capacity).toAggregateExpression())
}
