package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  /** Max cosine over the codebook — the assigned cell's similarity
    * (static: called from codegen). Pairs with [[assign]] in the
    * distributed k-means reseed: the worst-assigned point is the
    * argmin of this value.
    */
  def bestSim(emb: ArrayData, isFloat: Boolean, cb: Array[Array[Double]]): Double = {
    var bestS = Double.NegativeInfinity
    var i = 0
    while (i < cb.length) {
      val s = cosine(emb, isFloat, cb(i))
      if (s > bestS) bestS = s
      i += 1
    }
    bestS
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

  /** Two-level nearest-centroid assignment (IVF coarse/fine): nearest
    * coarse cell first, then nearest fine centroid WITHIN it. Global
    * 1-based cell id = offsets(coarseIdx) + fineIdx + 1, where offsets
    * is the running sum of fine-codebook sizes. Per-row cost is
    * O((|coarse| + |fine cell|)·dim) — at 256×256 = 65536 virtual cells
    * that is 512 cosines instead of 65536, which is what makes real
    * IVF list counts affordable (static: called from codegen).
    */
  def hierAssign(emb: ArrayData, isFloat: Boolean,
                 coarse: Array[Array[Double]],
                 fine: Array[Array[Array[Double]]],
                 offsets: Array[Int]): Int = {
    var bestC = 0
    var bestS = Double.NegativeInfinity
    var i = 0
    while (i < coarse.length) {
      val s = cosine(emb, isFloat, coarse(i))
      if (s > bestS) { bestS = s; bestC = i }
      i += 1
    }
    val fc = fine(bestC)
    var bestF = 0
    bestS = Double.NegativeInfinity
    i = 0
    while (i < fc.length) {
      val s = cosine(emb, isFloat, fc(i))
      if (s > bestS) { bestS = s; bestF = i }
      i += 1
    }
    offsets(bestC) + bestF + 1
  }

  /** Probe set for two-level IVF: the `nprobe` best global (fine) cells
    * drawn from the `pCoarse` nearest coarse cells — cosine desc, ties
    * to the lower id at both levels (static: called from codegen).
    */
  def hierProbes(emb: ArrayData, isFloat: Boolean,
                 coarse: Array[Array[Double]],
                 fine: Array[Array[Array[Double]]],
                 offsets: Array[Int], pCoarse: Int, nprobe: Int): ArrayData = {
    val nc = coarse.length
    val cSims = new Array[Double](nc)
    var i = 0
    while (i < nc) { cSims(i) = cosine(emb, isFloat, coarse(i)); i += 1 }
    val pc = math.min(pCoarse, nc)
    val takenC = new Array[Boolean](nc)
    val probedC = new Array[Int](pc)
    var j = 0
    while (j < pc) {
      var best = -1
      var bestS = Double.NegativeInfinity
      i = 0
      while (i < nc) {
        if (!takenC(i) && cSims(i) > bestS) { bestS = cSims(i); best = i }
        i += 1
      }
      takenC(best) = true
      probedC(j) = best
      j += 1
    }
    // score every fine centroid of the probed coarse cells
    var total = 0
    j = 0
    while (j < pc) { total += fine(probedC(j)).length; j += 1 }
    val gSims = new Array[Double](total)
    val gIds = new Array[Int](total)
    var t = 0
    j = 0
    while (j < pc) {
      val c = probedC(j)
      val fc = fine(c)
      var f = 0
      while (f < fc.length) {
        gSims(t) = cosine(emb, isFloat, fc(f))
        gIds(t) = offsets(c) + f + 1
        t += 1
        f += 1
      }
      j += 1
    }
    // top-nprobe by sim desc, ties to the lower GLOBAL id
    val k = math.min(nprobe, total)
    val taken = new Array[Boolean](total)
    val out = new Array[Int](k)
    j = 0
    while (j < k) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var bestId = Int.MaxValue
      i = 0
      while (i < total) {
        if (!taken(i) &&
            (gSims(i) > bestS || (gSims(i) == bestS && gIds(i) < bestId))) {
          bestS = gSims(i); bestId = gIds(i); best = i
        }
        i += 1
      }
      taken(best) = true
      out(j) = gIds(best)
      j += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Residual of `emb` against the GIVEN 1-based cell's centroid —
    * emb − codebook[cell−1], elements promoted to double (static:
    * called from codegen). The residual-PQ primitive: both the corpus
    * encode side (residual vs the row's assigned cell) and the query
    * ADC side (residual vs each probed cell) are this one kernel with
    * a different cell column.
    */
  def residual(emb: ArrayData, isFloat: Boolean, cb: Array[Array[Double]],
               cell: Int): ArrayData = {
    val c = cb(cell - 1)
    val n = math.min(emb.numElements(), c.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      out(i) = x - c(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def fineOffsets(fine: Array[Array[Array[Double]]]): Array[Int] = {
    val offsets = new Array[Int](fine.length)
    var i = 1
    while (i < fine.length) {
      offsets(i) = offsets(i - 1) + fine(i - 1).length
      i += 1
    }
    offsets
  }

  // -- Column API --------------------------------------------------------

  def centroidAssign(emb: Column, codebook: Array[Array[Double]]): Column =
    Bridge.column(CentroidAssign(Bridge.expression(emb), codebook))

  def centroidProbes(emb: Column, codebook: Array[Array[Double]],
                     nprobe: Int): Column =
    Bridge.column(CentroidProbes(Bridge.expression(emb), codebook, nprobe))

  def centroidBestSim(emb: Column, codebook: Array[Array[Double]]): Column =
    Bridge.column(CentroidBestSim(Bridge.expression(emb), codebook))

  def hierarchicalAssign(emb: Column, coarse: Array[Array[Double]],
                         fine: Array[Array[Array[Double]]]): Column =
    Bridge.column(HierarchicalAssign(Bridge.expression(emb), coarse, fine))

  def hierarchicalProbes(emb: Column, coarse: Array[Array[Double]],
                         fine: Array[Array[Array[Double]]],
                         pCoarse: Int, nprobe: Int): Column =
    Bridge.column(HierarchicalProbes(Bridge.expression(emb), coarse, fine,
      pCoarse, nprobe))

  def centroidResidual(emb: Column, cell: Column,
                       codebook: Array[Array[Double]]): Column =
    Bridge.column(CentroidResidual(Bridge.expression(emb),
      Bridge.expression(cell), codebook))
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

/** array<float|double> embedding -> max cosine over the codebook (the
  * assigned cell's similarity).
  */
case class CentroidBestSim(child: Expression, codebook: Array[Array[Double]])
    extends CentroidExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    Centroids.bestSim(input.asInstanceOf[ArrayData], isFloat, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("centroids", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Centroids.bestSim($c, $isFloat, $cbRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "centroid_best_sim"
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

/** Two-level IVF assignment: embedding -> 1-based GLOBAL fine-cell id
  * (nearest coarse cell, then nearest fine centroid within it). One
  * codegen node; coarse + fine codebooks ride as reference objects.
  */
case class HierarchicalAssign(child: Expression,
                              coarse: Array[Array[Double]],
                              fine: Array[Array[Array[Double]]])
    extends CentroidExpression {

  require(coarse.length == fine.length,
    s"need one fine codebook per coarse cell (${coarse.length} vs ${fine.length})")
  override def codebook: Array[Array[Double]] = coarse
  private lazy val offsets = Centroids.fineOffsets(fine)

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    Centroids.hierAssign(input.asInstanceOf[ArrayData], isFloat, coarse,
      fine, offsets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val fineRef = ctx.addReferenceObj("fine", fine, "double[][][]")
    val offRef = ctx.addReferenceObj("offsets", offsets, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.Centroids.hierAssign(
         |  $c, $isFloat, $coarseRef, $fineRef, $offRef);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "centroid_hier_assign"
}

/** Two-level IVF probe set: embedding -> sorted array<int> of the
  * nprobe best global fine-cell ids among the pCoarse nearest coarse
  * cells.
  */
case class HierarchicalProbes(child: Expression,
                              coarse: Array[Array[Double]],
                              fine: Array[Array[Array[Double]]],
                              pCoarse: Int, nprobe: Int)
    extends CentroidExpression {

  require(coarse.length == fine.length,
    s"need one fine codebook per coarse cell (${coarse.length} vs ${fine.length})")
  require(pCoarse > 0 && nprobe > 0,
    s"pCoarse/nprobe must be positive, got $pCoarse/$nprobe")
  override def codebook: Array[Array[Double]] = coarse
  private lazy val offsets = Centroids.fineOffsets(fine)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Centroids.hierProbes(input.asInstanceOf[ArrayData], isFloat, coarse,
      fine, offsets, pCoarse, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val fineRef = ctx.addReferenceObj("fine", fine, "double[][][]")
    val offRef = ctx.addReferenceObj("offsets", offsets, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.Centroids.hierProbes(
         |  $c, $isFloat, $coarseRef, $fineRef, $offRef, $pCoarse, $nprobe);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "centroid_hier_probes"
}

/** (array<float|double> embedding, 1-based cell id) -> array<double>
  * residual emb − codebook[cell−1]. The residual-PQ encode/ADC
  * primitive ([[graft.ops.Similarity.ivfPqResidualTopK]]); one codegen
  * node, codebook as a reference object.
  */
case class CentroidResidual(left: Expression, right: Expression,
                            codebook: Array[Array[Double]])
    extends BinaryExpression {

  require(codebook.nonEmpty, "centroid codebook must be non-empty")

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float|double>, int), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(emb: Any, cell: Any): Any =
    Centroids.residual(emb.asInstanceOf[ArrayData], isFloat, codebook,
      cell.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("centroids", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, (e, c) =>
      s"${ev.value} = graft.functions.Centroids.residual($e, $isFloat, $cbRef, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "centroid_residual"
}
