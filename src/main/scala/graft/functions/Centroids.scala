package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Nearest-centroid kernels for IVF / SemDeDup / k-means assignment.
  *
  * The round-3 formulation inlined one [[CosineSimilarity]] subtree per
  * centroid into a single `array(...)` expression — an nlist-wide
  * Catalyst tree that stalls Janino past a few hundred centroids. These
  * expressions keep assignment to ONE codegen'd node regardless of
  * nlist: the codebook rides along as a reference object (the
  * [[Pq]]-codebook pattern), and the argmax loop is a static call.
  *
  * Semantics replicate the array formulation bit-for-bit so the
  * existing cross-engine oracles stay green:
  *  - per-centroid similarity = CosineSimilarity's fused loop
  *    (`dot/(sqrt(|a|²)·sqrt(|b|²))`, elements promoted to double);
  *  - [[CentroidAssign]] = `array_position(sims, array_max(sims))`:
  *    1-based argmax, FIRST max on ties (strictly-greater update);
  *  - [[CentroidProbes]] = stable sim-desc sort head: top-`nprobe`
  *    1-based cells, ties broken by lower cell id.
  *
  * Driver/executor memory is the codebook itself: nlist·dim·8 B
  * (nlist=10⁵ at dim=64 → 51 MB — broadcast-able; at dim≥1024 shard the
  * codebook hierarchically before reaching for a distributed-join
  * assignment). Per-row cost is O(nlist·dim); past ~10⁴ cells compose a
  * coarse/fine two-level assignment instead of widening one codebook.
  */
object Centroids {

  private def cosine(emb: ArrayData, isFloat: Boolean, c: Array[Double]): Double = {
    val n = math.min(emb.numElements(), c.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      val y = c(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** 1-based argmax-cosine cell id; first max wins ties (static: called
    * from codegen).
    */
  def assign(emb: ArrayData, isFloat: Boolean, cb: Array[Array[Double]]): Int = {
    var best = 0
    var bestS = Double.NegativeInfinity
    var i = 0
    while (i < cb.length) {
      val s = cosine(emb, isFloat, cb(i))
      if (s > bestS) { bestS = s; best = i }
      i += 1
    }
    best + 1
  }

  /** Top-`nprobe` 1-based cells by cosine desc, ties to the lower cell
    * id (static: called from codegen). Selection over the sims array —
    * O(nlist·nprobe), fine for the nprobe ≪ nlist probe counts IVF uses.
    */
  def probes(emb: ArrayData, isFloat: Boolean, cb: Array[Array[Double]],
             nprobe: Int): ArrayData = {
    val n = cb.length
    val sims = new Array[Double](n)
    var i = 0
    while (i < n) { sims(i) = cosine(emb, isFloat, cb(i)); i += 1 }
    val k = math.min(nprobe, n)
    val taken = new Array[Boolean](n)
    val out = new Array[Int](k)
    var j = 0
    while (j < k) {
      var best = -1
      var bestS = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!taken(i) && sims(i) > bestS) { bestS = sims(i); best = i }
        i += 1
      }
      taken(best) = true
      out(j) = best + 1
      j += 1
    }
    new GenericArrayData(out)
  }

  // -- Column API --------------------------------------------------------

  def centroidAssign(emb: Column, codebook: Array[Array[Double]]): Column =
    Bridge.column(CentroidAssign(Bridge.expression(emb), codebook))

  def centroidProbes(emb: Column, codebook: Array[Array[Double]],
                     nprobe: Int): Column =
    Bridge.column(CentroidProbes(Bridge.expression(emb), codebook, nprobe))
}

private[functions] trait CentroidExpression extends UnaryExpression {
  def codebook: Array[Array[Double]]

  require(codebook.nonEmpty, "centroid codebook must be non-empty")

  protected def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.sql}")
  }
}

/** array<float|double> embedding -> 1-based nearest-centroid cell id. */
case class CentroidAssign(child: Expression, codebook: Array[Array[Double]])
    extends CentroidExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    Centroids.assign(input.asInstanceOf[ArrayData], isFloat, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("centroids", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Centroids.assign($c, $isFloat, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "centroid_assign"
}

/** array<float|double> embedding -> array<int> of the nprobe nearest
  * 1-based cell ids (cosine desc, ties to the lower id).
  */
case class CentroidProbes(child: Expression, codebook: Array[Array[Double]],
                          nprobe: Int) extends CentroidExpression {

  require(nprobe > 0, s"nprobe must be positive, got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Centroids.probes(input.asInstanceOf[ArrayData], isFloat, codebook, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("centroids", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Centroids.probes($c, $isFloat, $cbRef, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "centroid_probes"
}
