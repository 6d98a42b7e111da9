package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Vamana/DiskANN RobustPrune edge diversification (Subramanya et al.,
  * NeurIPS 2019, Algorithm 2), per node over its bounded candidate
  * pool: walk candidates best-first and keep one only if NO
  * already-kept neighbor s "covers" it — i.e. keep candidate c unless
  * `alpha · d(s, c) <= d(p, c)` for some kept s, with d = 1 − cosine.
  * Plain kNN edges cluster (a node's k nearest are mutual neighbors of
  * each other), so a fixed out-degree buys little reach; α-pruning
  * spends the same degree on DIRECTIONALLY DIVERSE edges — each new
  * edge must not be reachable "through" a kept one within a factor α —
  * which is what makes low-degree graphs navigable.
  *
  * Input: `array<struct>` with fields `sim` (double, cosine of the
  * node to the candidate), `id` (long), `emb` (array<float|double>,
  * the candidate's embedding — pairwise d(s, c) needs real geometry).
  * Output: `array<long>` of at most `degree` kept ids, best-first.
  *
  * Determinism: candidates sort by (sim desc, id asc) under
  * `java.lang.Double.compare` total order before the greedy walk, and
  * pairwise cosines are the same fused exact loop as
  * [[CosineSimilarity]] — the prune replays bit-identically on any
  * input order or layout (the pool arrives from `collect_list`, whose
  * order is nondeterministic).
  *
  * Work per row is poolSize · degree pairwise cosines — bounded by
  * construction (the pool is a prior bounded-heap top-K), evaluated
  * inside whole-stage codegen; nothing here scales with the corpus.
  */
object RobustPruner {

  /** Static greedy α-prune (called from codegen). `simOrd`/`idOrd`/
    * `embOrd` locate the struct fields; `nFields` is the struct's
    * ACTUAL arity (UnsafeRow field offsets derive from it — a
    * hardcoded 3 would silently misread a struct carrying extra
    * fields); `embFloat` flags float32 embeddings. Null pool entries
    * are not supported (the pool comes from an inner join).
    */
  def prune(pool: ArrayData, degree: Int, alpha: Double,
            simOrd: Int, idOrd: Int, embOrd: Int, nFields: Int,
            embFloat: Boolean): ArrayData = {
    val n = pool.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val sims = new Array[Double](n)
    val ids = new Array[Long](n)
    val embs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = pool.getStruct(i, nFields)
      sims(i) = row.getDouble(simOrd)
      ids(i) = row.getLong(idOrd)
      val a = row.getArray(embOrd)
      val m = a.numElements()
      val e = new Array[Double](m)
      var j = 0
      while (j < m) {
        e(j) = if (embFloat) a.getFloat(j).toDouble else a.getDouble(j)
        j += 1
      }
      embs(i) = e
      i += 1
    }
    val order = Array.range(0, n).sortWith { (a, b) =>
      val c = java.lang.Double.compare(sims(b), sims(a))
      if (c != 0) c < 0 else ids(a) < ids(b)
    }
    val chosen = new Array[Int](math.min(degree, n))
    var nChosen = 0
    var oi = 0
    while (oi < n && nChosen < degree) {
      val c = order(oi)
      var dominated = false
      var j = 0
      while (j < nChosen && !dominated) {
        val s = chosen(j)
        // d = 1 − cosine; covered if alpha·d(s,c) <= d(p,c).
        // NaN cosines (zero-norm vectors) compare false -> kept, the
        // same never-dominated treatment CosineSimilarity gives them
        if (alpha * (1.0 - cosine(embs(s), embs(c))) <= 1.0 - sims(c))
          dominated = true
        j += 1
      }
      if (!dominated) { chosen(nChosen) = c; nChosen += 1 }
      oi += 1
    }
    val out = new Array[Any](nChosen)
    i = 0
    while (i < nChosen) { out(i) = ids(chosen(i)); i += 1 }
    new GenericArrayData(out)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-API entry point: `pool` is the collect_list'd
    * `struct(sim, id, emb)` candidate array.
    */
  def robustPrune(pool: Column, degree: Int, alpha: Double): Column =
    Bridge.column(RobustPrune(Bridge.expression(pool), degree, alpha))
}

/** array<struct<sim,id,emb>> candidate pool -> array<long> diversified
  * out-edges (at most `degree`, best-first).
  */
case class RobustPrune(child: Expression, degree: Int, alpha: Double)
    extends UnaryExpression {

  require(degree >= 1, s"degree must be >= 1, got $degree")
  require(alpha >= 1.0, s"alpha must be >= 1.0, got $alpha")

  private def structType: Option[StructType] = child.dataType match {
    case ArrayType(s: StructType, _) => Some(s)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = structType match {
    case Some(s) =>
      def field(name: String): Option[StructField] =
        s.fields.find(_.name == name)
      val ok = field("sim").exists(_.dataType == DoubleType) &&
        field("id").exists(_.dataType == LongType) &&
        field("emb").exists(_.dataType match {
          case ArrayType(FloatType | DoubleType, _) => true
          case _ => false
        })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects struct fields sim:double, id:bigint, " +
          s"emb:array<float|double>, got ${s.sql}")
    case None => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct>, got ${child.dataType.sql}")
  }

  private lazy val simOrd = structType.get.fieldIndex("sim")
  private lazy val idOrd = structType.get.fieldIndex("id")
  private lazy val embOrd = structType.get.fieldIndex("emb")
  private lazy val nFields = structType.get.length
  private lazy val embFloat =
    structType.get(embOrd).dataType == ArrayType(FloatType, false) ||
      structType.get(embOrd).dataType == ArrayType(FloatType, true)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    RobustPruner.prune(input.asInstanceOf[ArrayData], degree, alpha,
      simOrd, idOrd, embOrd, nFields, embFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.RobustPruner.prune($c, $degree,
      |  $alpha, $simOrd, $idOrd, $embOrd, $nFields, $embFloat);
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "robust_prune"
}
