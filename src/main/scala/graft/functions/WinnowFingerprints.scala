package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Single-pass winnowing fingerprint selection (Schleimer et al.,
  * "Winnowing: Local Algorithms for Document Fingerprinting").
  *
  * Replaces the composable `transform(sequence)/slice/array_min` column
  * algebra: higher-order functions are interpreted (no whole-stage
  * codegen), and the k-gram lambda embedded the full document
  * expression, so every gram re-evaluated its child — O(len²) regex
  * work per row once a normalize sat underneath (measured 673 s for
  * one 500-doc pass at sf0.01). This expression evaluates the child
  * ONCE, rolls the k-gram hashes in one byte pass, takes the window
  * minima, and is codegen-friendly (a single static-call fragment).
  *
  * Grams are byte-grams of the UTF-8 encoding — identical to char
  * grams on ASCII corpora; on multi-byte text the gram boundaries
  * shift but the winnowing containment/density guarantees still hold
  * (they are positional, not alphabet-dependent). Hash values are
  * engine-internal (a 31-base polynomial), as with the previous
  * xxhash64 formulation: gates compare counts/bounds/intersections,
  * never raw fingerprint values.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints expects a string arg, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowFingerprints.winnow(input.asInstanceOf[UTF8String].getBytes, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowFingerprints.winnow($c.getBytes(), $k, $w));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** k-gram rolling hashes -> per-window minima -> distinct, sorted.
    * Matches the prior column-algebra semantics exactly in structure:
    * max(n-k+1, 1) grams (short inputs yield one whole-string gram),
    * max(nGrams-w, 0)+1 windows (trailing windows clamp), result =
    * array_sort(array_distinct(window minima)).
    */
  def winnow(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val n = bytes.length
    val nGrams = math.max(n - k + 1, 1)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 1125899906842597L
      var j = i
      val end = math.min(i + k, n)
      while (j < end) { h = h * 31 + (bytes(j) & 0xff); j += 1 }
      hashes(i) = h
      i += 1
    }
    val nWindows = math.max(nGrams - w, 0) + 1
    val mins = new Array[Long](nWindows)
    var m = 0
    while (m < nWindows) {
      var mn = Long.MaxValue
      var j = m
      val e = math.min(m + w, nGrams)
      while (j < e) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
      mins(m) = mn
      m += 1
    }
    val out = mins.distinct
    java.util.Arrays.sort(out)
    out
  }

  /** Column-API entry point. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w))
}
