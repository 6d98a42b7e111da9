package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi word segmentation under a unigram piece model (the
  * SentencePiece decode step): the minimum-total-cost split of a word
  * into vocabulary pieces, costs being fixed-point integer −log-probs
  * (see [[graft.ops.TextOps.unigramSeedModel]]) so the comparison is
  * exact integer arithmetic — engine-portable, no float-tie ambiguity.
  *
  * Tie-break: ascending start index with strictly-better updates, i.e.
  * on equal cost the EARLIER predecessor (longer final piece) wins at
  * every position. Backtracking under this rule equals the global
  * lexicographic-minimum of the reversed boundary list among all
  * minimum-cost paths — the form a SQL oracle can replay with
  * ORDER BY cost, list_reverse(bounds).
  *
  * The vocab rides as a reference object (the codebook pattern): one
  * shared hash map per executor, O(maxPieceLen · |word|) lookups per
  * row inside whole-stage codegen, zero shuffle.
  */
object UnigramSegmenter {

  /** Build the lookup map once (driver), shipped as a reference object. */
  def buildVocab(pieces: Array[String],
                 costs: Array[Long]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), costs(i)); i += 1 }
    m
  }

  /** Static Viterbi (called from codegen). Codepoint-indexed so
    * substring semantics match SQL `substr`. Returns null when the
    * word cannot be covered by the vocabulary.
    */
  def segment(word: UTF8String,
              vocab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int): ArrayData = {
    val s = word.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val inf = Long.MaxValue / 4
    val dp = Array.fill(n + 1)(inf)
    val prev = Array.fill(n + 1)(-1)
    dp(0) = 0L
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (dp(i) < inf) {
          val c = vocab.get(new String(cps, i, j - i))
          // strict < with ascending i = smallest predecessor on ties
          if (c != null && dp(i) + c < dp(j)) {
            dp(j) = dp(i) + c
            prev(j) = i
          }
        }
        i += 1
      }
      j += 1
    }
    if (dp(n) >= inf) return null
    var cnt = 0
    var p = n
    while (p > 0) { cnt += 1; p = prev(p) }
    val out = new Array[Any](cnt)
    p = n
    var idx = cnt - 1
    while (p > 0) {
      val i = prev(p)
      out(idx) = UTF8String.fromString(new String(cps, i, p - i))
      idx -= 1
      p = i
    }
    new GenericArrayData(out)
  }

  def unigramSegment(word: Column, pieces: Array[String], costs: Array[Long],
                     maxPieceLen: Int): Column =
    Bridge.column(UnigramSegment(Bridge.expression(word), pieces, costs,
      maxPieceLen))
}

/** string word -> array<string> minimum-cost piece split (null if the
  * vocab cannot cover the word).
  */
case class UnigramSegment(child: Expression, pieces: Array[String],
                          costs: Array[Long], maxPieceLen: Int)
    extends UnaryExpression {

  require(pieces.length == costs.length, "pieces/costs must align")
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  @transient private lazy val vocab =
    UnigramSegmenter.buildVocab(pieces, costs)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnigramSegmenter.segment(input.asInstanceOf[UTF8String], vocab, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab,
      "java.util.HashMap<String, Long>")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.UnigramSegmenter.segment($c, $vocabRef, $maxPieceLen);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "unigram_segment"
}
