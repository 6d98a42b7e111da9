package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Randomized property tests for the kernels whose correctness
  * arguments are subtle: the bounded-heap top-k must equal the window
  * formulation on ANY input (not just the fixtures), and the
  * distributed shard prefix-sum must equal the global-window definition
  * under arbitrary token distributions and group counts.
  *
  * Spark jobs per case are slow — sized at a handful of generated cases
  * each, which still explores far beyond the hand-written fixtures.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Run a scalacheck prop under ScalaTest (no scalatestplus bridge in
    * the dependency set): fail the test with the counterexample if any
    * generated case fails.
    */
  private def checkProp(prop: Prop, cases: Int = 5): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(cases).withWorkers(1), prop)
    withClue(res.status.toString) { res.passed shouldBe true }
  }

  test("property: topK == window row_number for random data") {
    val gen = for {
      n <- Gen.choose(1, 300)
      k <- Gen.choose(1, 12)
      nGroups <- Gen.choose(1, 6)
      scoreCard <- Gen.choose(2, 8) // low cardinality -> heavy ties
      seed <- Gen.choose(0L, 10000L)
    } yield (n, k, nGroups, scoreCard, seed)
    checkProp(Prop.forAll(gen) { case (n, k, nGroups, scoreCard, seed) =>
      val r = new scala.util.Random(seed)
      val df = (1 to n).map(i => (i.toLong, s"g${r.nextInt(nGroups)}",
        r.nextInt(scoreCard).toDouble)).toDF("id", "g", "score")
      val viaHeap = df.groupBy("g")
        .agg(graft.functions.TopK.topK($"score", $"id", k).as("top"))
        .select($"g", explode($"top").as("t"))
        .select($"g", $"t.id".as("id"))
      val viaWindow = df.withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(desc("score"), asc("id"))))
        .filter($"rn" <= k).select("g", "id")
      viaHeap.except(viaWindow).isEmpty && viaWindow.except(viaHeap).isEmpty
    })
  }

  test("property: assignShards == global window for random corpora") {
    val gen = for {
      n <- Gen.choose(1, 400)
      budget <- Gen.choose(5L, 200L)
      nGroups <- Gen.choose(1, 5)
      parts <- Gen.choose(1, 9)
      seed <- Gen.choose(0L, 10000L)
    } yield (n, budget, nGroups, parts, seed)
    checkProp(Prop.forAll(gen) { case (n, budget, nGroups, parts, seed) =>
      val r = new scala.util.Random(seed)
      val df = (1 to n).map(i => (i.toLong, s"g${r.nextInt(nGroups)}",
        r.nextInt(50).toLong)).toDF("doc_id", "g", "tok").repartition(parts)
      val got = graft.ops.Curation.assignShards(
        df, $"g", $"doc_id", $"tok", budget).select("doc_id", "shard")
      val want = df.withColumn("shard",
        expr(s"(sum(tok) over (partition by g order by doc_id) - tok) div $budget"))
        .select("doc_id", "shard")
      got.except(want).isEmpty && want.except(got).isEmpty
    })
  }

  test("property: minhash est_jaccard within 0.25 of true jaccard on near-dups") {
    // planted near-duplicates: shared base + small random suffix edits
    val gen = for {
      words <- Gen.choose(30, 80)
      edits <- Gen.choose(0, 3)
      seed <- Gen.choose(0L, 10000L)
    } yield (words, edits, seed)
    checkProp(Prop.forAll(gen) { case (words, edits, seed) =>
      val r = new scala.util.Random(seed)
      val base = (1 to words).map(i => s"w${r.nextInt(1000)}")
      val edited = base.dropRight(edits) ++ (1 to edits).map(i => s"e${r.nextInt(1000)}")
      val docs = Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
        .toDF("doc_id", "text")
      val pairs = graft.ops.Dedup.minhashLsh(docs, "text", "doc_id",
        threshold = 0.0).collect()
      // true jaccard of 3-gram shingle sets
      def grams(ws: Seq[String]) = ws.sliding(3).map(_.mkString(" ")).toSet
      val (ga, gb) = (grams(base), grams(edited))
      val trueJ = (ga intersect gb).size.toDouble / (ga union gb).size
      if (pairs.isEmpty) trueJ < 0.7 // banding may miss only low-sim pairs
      else math.abs(pairs(0).getAs[Double]("est_jaccard") - trueJ) <= 0.25
    })
  }

  test("property: hierarchical centroid invariants on random codebooks") {
    // (1) degenerate two-level == flat: with ONE coarse cell, hierAssign
    //     must equal CentroidAssign over that cell's fine codebook;
    // (2) the assigned cell is always among the probes when every
    //     coarse cell and fine centroid is probed (no id mis-pairing).
    import graft.functions.Centroids
    val gen = for {
      dim <- Gen.choose(4, 12)
      nFine <- Gen.choose(2, 6)
      nCoarse <- Gen.choose(2, 5)
      seed <- Gen.choose(0L, 10000L)
    } yield (dim, nFine, nCoarse, seed)
    checkProp(Prop.forAll(gen) { case (dim, nFine, nCoarse, seed) =>
      val r = new scala.util.Random(seed)
      def vec() = Array.fill(dim)(r.nextGaussian())
      val vecs = (0L until 40L).map(i => (i, vec().map(_.toFloat)))
        .toDF("vec_id", "embedding")
      val flatCb = Array.fill(nFine)(vec())
      val degenerate = vecs.select(
        Centroids.hierarchicalAssign($"embedding", Array(vec()),
          Array(flatCb)).as("hier"),
        Centroids.centroidAssign($"embedding", flatCb).as("flat"))
      val coarse = Array.fill(nCoarse)(vec())
      val fine = Array.fill(nCoarse)(Array.fill(nFine)(vec()))
      val total = nCoarse * nFine
      val membership = vecs.select(
        Centroids.hierarchicalAssign($"embedding", coarse, fine).as("cell"),
        Centroids.hierarchicalProbes($"embedding", coarse, fine,
          nCoarse, total).as("probes"))
      degenerate.filter($"hier" =!= $"flat").count() == 0L &&
        membership.filter(!array_contains($"probes", $"cell")).count() == 0L
    })
  }

  test("property: bigram LM tiers partition the bigram stream exactly") {
    val gen = for {
      n <- Gen.choose(2, 40)
      vocab <- Gen.choose(2, 6)
      maxLen <- Gen.choose(0, 12)
      seed <- Gen.choose(0L, 10000L)
    } yield (n, vocab, maxLen, seed)
    checkProp(Prop.forAll(gen) { case (n, vocab, maxLen, seed) =>
      val r = new scala.util.Random(seed)
      val lens = (1 to n).map(_ => r.nextInt(maxLen + 1))
      val docs = lens.zipWithIndex.map { case (len, i) =>
        ((i + 1).toLong, Seq.fill(len)(s"w${r.nextInt(vocab)}").mkString(" "))
      }.toDF("doc_id", "text")
      val out = graft.ops.TextOps.bigramScore(docs, "doc_id", "text",
        col("doc_id") % 2 === 0).collect()
      val expNb = lens.zipWithIndex.map { case (len, i) =>
        (i + 1).toLong -> math.max(0, len - 1).toLong
      }.toMap
      // hit/backoff/OOV partition the bigrams; count matches tokens-1 —
      // on ANY corpus and ANY train split, including empty training
      // halves (every bigram then lands in the OOV tier)
      out.forall { row =>
        val nb = row.getAs[Long]("n_bigrams")
        nb == row.getAs[Long]("n_hit") + row.getAs[Long]("n_backoff") +
          row.getAs[Long]("n_oov") &&
          nb == expNb(row.getAs[Long]("doc_id"))
      }
    })
  }

  test("property: gumbelTopK is a deterministic k-subset of scorable rows") {
    val gen = for {
      n <- Gen.choose(0, 60)
      k <- Gen.choose(1, 10)
      seed <- Gen.choose(0L, 10000L)
    } yield (n, k, seed)
    checkProp(Prop.forAll(gen) { case (n, k, seed) =>
      val r = new scala.util.Random(seed)
      val rows = (1 to n).map(i => (i.toLong,
        if (r.nextInt(5) == 0) None else Some(r.nextDouble() * 10 - 5)))
      val df = rows.toDF("doc_id", "w")
      val out = graft.ops.Curation.gumbelTopK(df, "doc_id", "w", k, seed)
        .collect().map(_.getLong(0)).toSeq
      val scorable = rows.collect { case (id, Some(_)) => id }.toSet
      out.length == math.min(k, scorable.size) &&
        out.toSet.subsetOf(scorable) &&
        out == graft.ops.Curation.gumbelTopK(df.repartition(5), "doc_id",
          "w", k, seed).collect().map(_.getLong(0)).toSeq
    })
  }

  test("property: VectorMinMax aggregate == per-dim min/max under any layout") {
    val gen = for {
      n <- Gen.choose(1, 120)
      dim <- Gen.choose(1, 12)
      parts <- Gen.choose(1, 7)
      seed <- Gen.choose(0L, 9999L)
    } yield (n, dim, parts, seed)
    checkProp(Prop.forAll(gen) { case (n, dim, parts, seed) =>
      val r = new scala.util.Random(seed)
      val data = (0 until n).map(i =>
        (i.toLong, Array.fill(dim)((r.nextGaussian() * 100).toFloat)))
      val df = data.toDF("id", "v").repartition(parts)
      val got = df.agg(graft.functions.VectorMinMax
          .vectorMinMax(col("v"), dim).as("mm"))
        .head().getSeq[Double](0)
      val expMin = (0 until dim).map(j => data.map(_._2(j).toDouble).min)
      val expMax = (0 until dim).map(j => data.map(_._2(j).toDouble).max)
      got.head == n.toDouble &&
        (0 until dim).forall(j => got(1 + j) == expMin(j)) &&
        (0 until dim).forall(j => got(1 + dim + j) == expMax(j))
    }, cases = 5)
  }

  test("property: sample-state merge == one-shot state for any split and cap") {
    val gen = for {
      n <- Gen.choose(2, 150)
      cap <- Gen.choose(1, 60)
      mod <- Gen.choose(2, 5)
      seed <- Gen.choose(0L, 9999L)
    } yield (n, cap, mod, seed)
    checkProp(Prop.forAll(gen) { case (n, cap, mod, seed) =>
      val r = new scala.util.Random(seed)
      val vecs = (0 until n).map(i =>
        (i.toLong, Array.fill(4)(r.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
      val merged = graft.ops.Embeddings.mergeSampleStates(
        graft.ops.Embeddings.sampleState(
          vecs.filter(col("vec_id") % mod === 0), "vec_id", "embedding", cap),
        graft.ops.Embeddings.sampleState(
          vecs.filter(col("vec_id") % mod =!= 0), "vec_id", "embedding", cap),
        cap)
      val oneShot = graft.ops.Embeddings.sampleState(
        vecs, "vec_id", "embedding", cap)
      merged.select("id").as[Long].collect().toSeq ==
        oneShot.select("id").as[Long].collect().toSeq
    }, cases = 5)
  }

  test("property: gopherRules signals are bounded on arbitrary text") {
    val charGen = Gen.frequency(6 -> Gen.alphaLowerChar,
      2 -> Gen.const(' '), 1 -> Gen.const('\n'), 1 -> Gen.oneOf("#.-*!"))
    val textGen = Gen.listOf(charGen).map(_.mkString)
    checkProp(Prop.forAll(Gen.listOfN(8, textGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
        .toDF("doc_id", "text")
      val out = df.select(graft.ops.TextOps.gopherRules($"text")
        .map { case (nm, c) => c.as(nm) }: _*).collect()
      out.forall { row =>
        val fracs = Seq("symbol_ratio", "bullet_frac", "ellipsis_frac",
          "alpha_frac").map(row.getAs[Double])
        // symbol_ratio counts "..." runs per word and can exceed 1 on
        // pure-punctuation strings; the line/word fractions cannot
        fracs.forall(f => !f.isNaN && f >= 0.0) &&
          Seq("bullet_frac", "ellipsis_frac", "alpha_frac")
            .map(row.getAs[Double]).forall(_ <= 1.0) &&
          row.getAs[Int]("stop_hits") >= 0 &&
          row.getAs[Int]("stop_hits") <= 8 &&
          row.getAs[Double]("mean_word_len") >= 0.0 &&
          !row.isNullAt(row.fieldIndex("keep"))
      }
    }, cases = 4)
  }
}
