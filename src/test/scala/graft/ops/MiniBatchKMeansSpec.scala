package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mini-batch k-means state updates: a single batch from zero counts is
  * the plain per-cell mean, cells without members carry state forward,
  * counts accumulate, and the update is layout-independent (the sums
  * must not depend on partitioning).
  */
case class MiniBatchVec(vec_id: Long, embedding: Array[Double])

class MiniBatchKMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4
  private def vecs(ids: Range) = ids.map { i =>
    (i.toLong, Array.tabulate(dim)(j => (i % 10 + j).toDouble / 10.0))
  }.toDF("vec_id", "embedding")

  test("first batch from zero counts is the exact per-cell mean") {
    val corpus = vecs(0 until 100)
    val seeds = Similarity.firstVectors(corpus, 4)
    val (c1, n1) = KMeans.miniBatchStep(seeds, new Array[Long](4),
      corpus, "vec_id", "embedding")
    n1.sum shouldBe 100L
    // replicate: assign with the same argmax, average per cell
    val assigned = corpus.select(col("vec_id"), col("embedding"),
        graft.functions.Centroids.centroidAssign(col("embedding"), seeds)
          .as("cell"))
      .collect().map(r => (r.getInt(2) - 1,
        r.getSeq[Double](1).toArray))
    for (j <- 0 until 4 if n1(j) > 0) {
      val members = assigned.filter(_._1 == j).map(_._2)
      members.length.toLong shouldBe n1(j)
      for (p <- 0 until dim) {
        val mean = members.map(_(p)).sum / members.length
        c1(j)(p) shouldBe mean +- 1e-9
      }
    }
  }

  test("cells without batch members keep centroid and count") {
    val corpus = vecs(0 until 50)
    val seeds = Similarity.firstVectors(corpus, 4)
    val (c1, n1) = KMeans.miniBatchStep(seeds, new Array[Long](4),
      corpus, "vec_id", "embedding")
    // a batch far from everything lands in one cell; others must be frozen
    val far = Seq((999L, Array(-1.0, -1.0, -1.0, -1.0)))
      .toDF("vec_id", "embedding")
    val (c2, n2) = KMeans.miniBatchStep(c1, n1, far, "vec_id", "embedding")
    val moved = (0 until 4).count(j => n2(j) != n1(j))
    moved shouldBe 1
    for (j <- 0 until 4 if n2(j) == n1(j))
      c2(j).toSeq shouldBe c1(j).toSeq
  }

  test("update is layout-independent") {
    val corpus = vecs(0 until 200)
    val seeds = Similarity.firstVectors(corpus, 4)
    val (cA, nA) = KMeans.miniBatchStep(seeds, new Array[Long](4),
      corpus, "vec_id", "embedding")
    val (cB, nB) = KMeans.miniBatchStep(seeds, new Array[Long](4),
      corpus.repartition(13), "vec_id", "embedding")
    nB.toSeq shouldBe nA.toSeq
    cB.map(_.toSeq).toSeq shouldBe cA.map(_.toSeq).toSeq
  }

  test("streaming foreachBatch folds arriving waves into the state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[MiniBatchVec]
    val corpus = vecs(0 until 60)
    val seeds = Similarity.firstVectors(corpus, 4)
    var state = (seeds, new Array[Long](4))
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          state = KMeans.miniBatchStep(state._1, state._2, batch,
            "vec_id", "embedding")
        ()
      }.start()
    def wave(ids: Range): Unit = {
      input.addData(ids.map(i =>
        MiniBatchVec(i.toLong, Array.tabulate(dim)(j => (i % 10 + j).toDouble / 10.0))))
      q.processAllAvailable()
    }
    wave(0 until 30)
    wave(30 until 60)
    q.stop()
    state._2.sum shouldBe 60L
    // the streamed two-wave state equals the two-step batch fold
    val (c1, n1) = KMeans.miniBatchStep(seeds, new Array[Long](4),
      vecs(0 until 30), "vec_id", "embedding")
    val (c2, n2) = KMeans.miniBatchStep(c1, n1,
      vecs(30 until 60), "vec_id", "embedding")
    state._2.toSeq shouldBe n2.toSeq
    state._1.map(_.toSeq).toSeq shouldBe c2.map(_.toSeq).toSeq
  }
}
