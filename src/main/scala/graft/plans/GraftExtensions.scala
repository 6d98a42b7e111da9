package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._

/** SparkSessionExtensions registering the engine's Snowflake-dialect
  * helpers as SQL functions, so `spark.sql` users get the same surface
  * as the DataFrame API (SURVEY §4: QUALIFY/GROUP BY ALL are handled by
  * Dialect helpers; these cover the expression-level gaps).
  *
  * Every function expands to built-in Catalyst expressions at
  * resolution time — no UDF, no codegen penalty:
  *
  *  - `sf_decode(x, k1, v1[, k2, v2 ...][, default])` — Snowflake decode
  *    (models/silver/accounts.sql:3-7) with null-safe key equality.
  *    (Named sf_decode so Spark's builtin charset/Oracle `decode` stays
  *    reachable.)
  *  - `surrogate_key(c1, c2, ...)` — dbt_utils.generate_surrogate_key
  *    (models/gold/dim_account.sql:2): md5 of '-'-joined null-sentineled
  *    strings.
  *
  * Usage: `SparkSession.builder.withExtensions(GraftExtensions.inject)`
  * or `--conf spark.sql.extensions=graft.plans.GraftSessionExtensions`.
  */
object GraftExtensions {

  private val nullSentinel = Literal("_dbt_utils_surrogate_key_null_")

  /** decode(expr, search1, result1, ..., [default]) => CaseWhen with
    * null-safe equality (decode('x', NULL, v) matches NULL like
    * Snowflake's decode).
    */
  private[plans] def decodeExpr(args: Seq[Expression]): Expression = {
    require(args.length >= 3, "decode requires (expr, search, result, ...)")
    val x = args.head
    val rest = args.tail
    val (pairs, default) =
      if (rest.length % 2 == 0) (rest.grouped(2).toSeq, None)
      else (rest.dropRight(1).grouped(2).toSeq, Some(rest.last))
    CaseWhen(
      pairs.map { case Seq(k, v) => (EqualNullSafe(x, k), v) },
      default)
  }

  /** surrogate_key(c1, ...) => md5(concat_ws('-', coalesce(cast(c as
    * string), sentinel), ...)).
    */
  private[plans] def surrogateKeyExpr(args: Seq[Expression]): Expression = {
    require(args.nonEmpty, "surrogate_key requires at least one column")
    val parts = args.map(a =>
      Coalesce(Seq(Cast(a, org.apache.spark.sql.types.StringType), nullSentinel)))
    Md5(Cast(ConcatWs(Literal("-") +: parts),
      org.apache.spark.sql.types.BinaryType))
  }

  /** Evaluate a constant (foldable) argument, or fail with a message
    * naming the function and parameter. A column reference passed where
    * a constant is required (e.g. `bloom_build(h, cnt_col, 0.01)`) must
    * surface as a diagnosable error at resolution time, not an opaque
    * ClassCastException from a blind Literal cast.
    */
  private def constValue(e: Expression, fn: String, param: String): Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: parameter '$param' must be a constant, got ${e.sql}")
    e.eval() match {
      case null => throw new IllegalArgumentException(
        s"$fn: parameter '$param' must not be NULL")
      case v => v
    }
  }

  private def constNum(e: Expression, fn: String, param: String): Double =
    constValue(e, fn, param) match {
      case n: Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: parameter '$param' must be numeric, got '$other'")
    }

  private def constInt(e: Expression, fn: String, param: String): Int =
    constNum(e, fn, param).toInt
  private def constLong(e: Expression, fn: String, param: String): Long =
    constNum(e, fn, param).toLong

  private[plans] def winnowExpr(args: Seq[Expression]): Expression = {
    require(args.length == 1 || args.length == 3,
      "winnow_fingerprints(text[, k, w])")
    if (args.length == 1) graft.functions.WinnowFingerprints(args.head, 8, 4)
    else graft.functions.WinnowFingerprints(args.head,
      constInt(args(1), "winnow_fingerprints", "k"),
      constInt(args(2), "winnow_fingerprints", "w"))
  }

  private[graft] def minhashSignatureExpr(args: Seq[Expression]): Expression = {
    require(args.length == 1 || args.length == 3,
      "minhash_signature(grams[, k, seed])")
    if (args.length == 1) graft.functions.MinHashSignature(args.head, 64, 42L)
    else graft.functions.MinHashSignature(args.head,
      constInt(args(1), "minhash_signature", "k"),
      constLong(args(2), "minhash_signature", "seed"))
  }

  private[graft] def simhashSignatureExpr(args: Seq[Expression]): Expression = {
    require(args.length == 1, "simhash_signature(tokens)")
    graft.functions.SimHashSignature(args.head)
  }

  private[graft] def bandHashesExpr(args: Seq[Expression]): Expression = {
    require(args.length == 2, "band_hashes(sig, bands)")
    graft.functions.BandHashes(args.head, constInt(args(1), "band_hashes", "bands"))
  }

  private[graft] def topKExpr(args: Seq[Expression]): Expression = {
    require(args.length == 3, "top_k(score, id, k)")
    val k = constInt(args(2), "top_k", "k")
    graft.functions.TopKAggregate(
      Cast(args.head, org.apache.spark.sql.types.DoubleType),
      Cast(args(1), org.apache.spark.sql.types.LongType), k)
      .toAggregateExpression()
  }

  private[plans] def wordNGramsExpr(args: Seq[Expression]): Expression = {
    require(args.length == 2, "word_ngrams(text, n)")
    graft.functions.WordNGrams(args.head, constInt(args(1), "word_ngrams", "n"))
  }

  private[graft] def bloomBuildExpr(args: Seq[Expression]): Expression = {
    require(args.length == 3, "bloom_build(hash, expectedItems, fpp)")
    val n = constLong(args(1), "bloom_build", "expectedItems")
    val fpp = constNum(args(2), "bloom_build", "fpp")
    val bits = graft.functions.Bloom.optimalNumBits(n, fpp)
    graft.functions.BloomBuildAggregate(
      Cast(args.head, org.apache.spark.sql.types.LongType), bits,
      graft.functions.Bloom.optimalNumHashes(n, bits)).toAggregateExpression()
  }

  private[graft] def bloomMightContainExpr(args: Seq[Expression]): Expression = {
    require(args.length == 2, "bloom_might_contain(sketch, hash)")
    graft.functions.BloomMightContain(args.head,
      Cast(args(1), org.apache.spark.sql.types.LongType))
  }

  private[graft] def zValueExpr(args: Seq[Expression]): Expression = {
    require(args.length == 2 || args.length == 3, "z_value(x, y[, bits])")
    val bits = if (args.length == 3) constInt(args(2), "z_value", "bits") else 16
    graft.functions.ZValue(
      Cast(args.head, org.apache.spark.sql.types.LongType),
      Cast(args(1), org.apache.spark.sql.types.LongType), bits)
  }

  val inject: SparkSessionExtensions => Unit = { ext =>
    ext.injectFunction((
      FunctionIdentifier("sf_decode"),
      new ExpressionInfo("graft.plans.GraftExtensions", "sf_decode"),
      (args: Seq[Expression]) => decodeExpr(args)))
    ext.injectFunction((
      FunctionIdentifier("surrogate_key"),
      new ExpressionInfo("graft.plans.GraftExtensions", "surrogate_key"),
      (args: Seq[Expression]) => surrogateKeyExpr(args)))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo("graft.functions.CosineSimilarity", "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity requires two array args")
        graft.functions.CosineSimilarity(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo("graft.functions.WinnowFingerprints", "winnow_fingerprints"),
      (args: Seq[Expression]) => winnowExpr(args)))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo("graft.functions.WordNGrams", "word_ngrams"),
      (args: Seq[Expression]) => wordNGramsExpr(args)))
    ext.injectFunction((
      FunctionIdentifier("top_k"),
      new ExpressionInfo("graft.functions.TopKAggregate", "top_k"),
      (args: Seq[Expression]) => topKExpr(args)))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo("graft.functions.MinHashSignature", "minhash_signature"),
      (args: Seq[Expression]) => minhashSignatureExpr(args)))
    ext.injectFunction((
      FunctionIdentifier("simhash_signature"),
      new ExpressionInfo("graft.functions.SimHashSignature", "simhash_signature"),
      (args: Seq[Expression]) => simhashSignatureExpr(args)))
    ext.injectFunction((
      FunctionIdentifier("band_hashes"),
      new ExpressionInfo("graft.functions.BandHashes", "band_hashes"),
      (args: Seq[Expression]) => bandHashesExpr(args)))
    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo("graft.functions.BloomBuildAggregate", "bloom_build"),
      (args: Seq[Expression]) => bloomBuildExpr(args)))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo("graft.functions.BloomMightContain", "bloom_might_contain"),
      (args: Seq[Expression]) => bloomMightContainExpr(args)))
    ext.injectFunction((
      FunctionIdentifier("z_value"),
      new ExpressionInfo("graft.functions.ZValue", "z_value"),
      (args: Seq[Expression]) => zValueExpr(args)))
  }
}

/** Config-friendly wrapper: `--conf spark.sql.extensions=graft.plans.GraftSessionExtensions`. */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = GraftExtensions.inject(ext)
}
