package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Distinct word n-gram shingles of a (pre-normalized) string, in one
  * pass.
  *
  * Replaces the `transform(sequence)/element_at` column algebra in
  * `Dedup.shingles`: higher-order functions run interpreted (no
  * whole-stage codegen), and the per-gram lambda embedded the
  * `split(normalize(text))` subtree, so every gram re-ran the split —
  * and the normalize regex — over the whole document: O(len²) work per
  * row, the dominant cost of the MinHash/Jaccard dedup stages. This
  * expression evaluates its child once, splits once, and builds the
  * distinct grams in a single sweep.
  *
  * Semantics match the prior formulation exactly: words = split on
  * single spaces; >= n words yields the (len-n+1) consecutive n-grams,
  * fewer yields one whole-string gram; distinct keeps first-occurrence
  * order (array_distinct semantics).
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams expects a string arg, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    WordNGrams.ngrams(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.WordNGrams.ngrams($c.toString(), $n);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {

  /** Distinct consecutive word n-grams, first-occurrence order. */
  def ngrams(s: String, n: Int): ArrayData = {
    val words = s.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (words.length >= n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    } else {
      seen.add(words.mkString(" "))
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point (expects pre-normalized input). */
  def wordNGrams(text: Column, n: Int): Column =
    Bridge.column(WordNGrams(Bridge.expression(text), n))
}
