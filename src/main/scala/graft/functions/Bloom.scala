package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Distributed Bloom-filter build + probe.
  *
  * The scalable membership-sketch pattern for decontamination and
  * blocklist joins at 100 TB: the filter is built as a TRUE distributed
  * aggregate — each map task ORs bits into its own fixed-size word
  * array, partial buffers combine associatively on the reduce side, and
  * the result is one `binary` sketch row that broadcasts to the probe
  * side. Contrast with `DataFrameStatFunctions.bloomFilter`, which
  * collects per-partition filters to the DRIVER; here the driver never
  * materializes anything and the sketch rides the broadcast plan.
  *
  * The probe (`bloom_might_contain`) is a pure codegen-friendly scalar:
  * no false negatives ever; false-positive rate is governed by the
  * (numBits, numHashes) sizing chosen from (expectedItems, fpp) exactly
  * as in the standard Bloom formulae.
  *
  * Inputs are pre-hashed int64 keys (use `xxhash64(...)` over whatever
  * identifies the member — the engine composes, it does not re-hash).
  * Bit positions come from double hashing (Kirsch-Mitzenmacher): k
  * probes derived from two 64-bit halves of one mix of the input hash.
  */
object Bloom {

  /** Optimal sizing: bits = -n·ln(p)/ln2², hashes = bits/n·ln2. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Int = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val m = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2)))
    // round up to a whole word; cap at 2^31-ish (256 MiB of bits)
    val words = math.min((m.toLong + 63) / 64, Int.MaxValue / 64L)
    (words * 64).toInt
  }

  def optimalNumHashes(expectedItems: Long, numBits: Long): Int =
    math.max(1, math.round(numBits.toDouble / expectedItems * math.log(2)).toInt)

  private def mix(h: Long): Long = {
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** i-th probe position for a hash (static: called from codegen). */
  def position(hash: Long, i: Int, numBits: Int): Int = {
    val m = mix(hash)
    val h1 = m & 0xFFFFFFFFL
    val h2 = (m >>> 32) | 1L // odd => full-period stride
    (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
  }

  def setBits(words: Array[Long], hash: Long, numHashes: Int): Unit = {
    val numBits = words.length * 64
    var i = 0
    while (i < numHashes) {
      val p = position(hash, i, numBits)
      words(p >> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  /** Probe a serialized sketch (static: called from codegen). */
  def mightContain(sketch: Array[Byte], hash: Long, numHashes: Int): Boolean = {
    val numBits = (sketch.length - 4) * 8
    var i = 0
    while (i < numHashes) {
      val p = position(hash, i, numBits)
      val byteIdx = 4 + (p >> 3)
      if ((sketch(byteIdx) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Little-endian layout so the byte-level probe addresses bit p at
    * byte p/8, mask 1<<(p%8) — the same bit the word-level builder set.
    */
  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }

  /** numHashes recorded in the sketch header (self-describing probe).
    * Direct byte arithmetic, not a ByteBuffer wrap: this runs once per
    * PROBED ROW inside WholeStageCodegen, and a per-row wrapper
    * allocation is garbage the hot loop doesn't need.
    */
  def numHashesOf(sketch: Array[Byte]): Int =
    (sketch(0) & 0xFF) | ((sketch(1) & 0xFF) << 8) |
      ((sketch(2) & 0xFF) << 16) | ((sketch(3) & 0xFF) << 24)

  // -- Column API --------------------------------------------------------

  /** Aggregate a column of int64 hashes into one binary Bloom sketch. */
  def bloomBuild(hash: Column, expectedItems: Long, fpp: Double): Column = {
    val bits = optimalNumBits(expectedItems, fpp)
    Bridge.column(BloomBuildAggregate(
      Bridge.expression(hash.cast("long")), bits,
      optimalNumHashes(expectedItems, bits)).toAggregateExpression())
  }

  /** Membership probe against a (usually broadcast) sketch column. */
  def bloomMightContain(sketch: Column, hash: Column): Column =
    Bridge.column(BloomMightContain(
      Bridge.expression(sketch), Bridge.expression(hash.cast("long"))))
}

/** The build side: partial state is the word array itself — fixed size,
  * merge = bitwise OR, shuffle payload = one sketch per map task.
  */
case class BloomBuildAggregate(child: Expression, numBits: Int, numHashes: Int,
                               override val mutableAggBufferOffset: Int = 0,
                               override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.setBits(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = Bloom.serialize(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    Bloom.serialize(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.getInt // numHashes header — fixed by the expression parameters
    val words = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    words
  }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bloom_build"
}

/** The probe side: `(sketch binary, hash long) -> boolean`, codegen'd as
  * one static call so it stays inside WholeStageCodegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(sketch: Any, hash: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    Bloom.mightContain(bytes, hash.asInstanceOf[Long], Bloom.numHashesOf(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, h) =>
      s"""${ev.value} = graft.functions.Bloom.mightContain(
         |  $s, $h, graft.functions.Bloom.numHashesOf($s));
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_might_contain"
}
