package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-signature MinHash / SimHash as single per-row expressions.
  *
  * The explode→aggregate formulation (one row per gram, 64 min/sum
  * aggregates map-side combined by doc) was the right fix for the
  * column-algebra trap (Catalyst re-expands a shared array per hash),
  * but it still materializes |docs|×|grams| rows and pays a groupBy
  * shuffle just to reassemble per-doc signatures. These expressions
  * compute the full signature in one codegen'd loop over the gram/token
  * array — NO shuffle at all: signature computation becomes a pure
  * projection pipelined with the scan, which is the shape you want in
  * front of a 100 TB LSH job (the only remaining shuffle is the band
  * candidate join itself).
  *
  * Hash scheme is value-identical to the previous pipeline:
  * h = pmod(xxhash64(gram), P) with Spark's default seed 42, then
  * sig_j = min over grams of pmod(h·a_j + b_j, P) with the same seeded
  * affine coefficients (MinHash), or bit_j = sign of ±1 votes from
  * xxhash64(token) bit j (SimHash).
  */
object Signatures {

  val P = 2147483647L // 2^31 - 1, Mersenne prime

  /** Deterministic affine coefficients — must stay identical to the
    * original Dedup scheme (same Random call order).
    */
  def coeffs(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val r = new scala.util.Random(seed)
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    (0 until k).foreach { i =>
      a(i) = 1L + r.nextInt((P - 1).toInt).toLong
      b(i) = r.nextInt(P.toInt).toLong
    }
    (a, b)
  }

  private def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  /** One pass over the gram array: all k affine minima. */
  def minhash(grams: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val sig = Array.fill(k)(Long.MaxValue)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      val g = grams.getUTF8String(i)
      val h = pmod(XxHash64Function.hash(g, StringType, 42L), P)
      var j = 0
      while (j < k) {
        val v = pmod(h * a(j) + b(j), P)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** One pass over the token array: 64 vote counters -> sign bits. */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(tokens.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if ((h & (1L << j)) != 0) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** One pass over the signature: `bands` chained xxhash64 band keys
    * (band b covers elements [b·rows, (b+1)·rows), seed = b).
    */
  def bandHash(sig: ArrayData, bands: Int): ArrayData = {
    val k = sig.numElements()
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var r = 0
      while (r < rows) {
        h = XxHash64Function.hash(sig.getLong(b * rows + r), LongType, h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** array<string> grams -> array<long> MinHash signature (k minima). */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  private lazy val (aArr, bArr) = Signatures.coeffs(k, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Signatures.minhash(input.asInstanceOf[ArrayData], aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Signatures.minhash($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def minhashSignature(grams: Column, k: Int, seed: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expression(grams), k, seed))
}

/** array<string> tokens -> 64-bit SimHash signature. */
case class SimHashSignature(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_signature expects array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Signatures.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Signatures.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSignature {
  def simhashSignature(tokens: Column): Column =
    Bridge.column(SimHashSignature(Bridge.expression(tokens)))
}

/** array<long> signature -> array<long> of `bands` LSH band keys: band
  * b chain-hashes its row slice (seed = band index). Two signatures get
  * the same band key iff their slices are identical (modulo a 2^-64
  * xxhash collision), which is exactly the banding bucket condition —
  * replaces the interpreted `transform(sequence)(concat_ws(element_at
  * ...))` column algebra (per-band per-element virtual calls + string
  * building) with one codegen'd loop and no string materialization.
  */
case class BandHashes(child: Expression, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"band_hashes expects array<long>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    Signatures.bandHash(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Signatures.bandHash($c, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandHashes {
  def bandHashes(sig: Column, bands: Int): Column =
    Bridge.column(BandHashes(Bridge.expression(sig), bands))
}
