package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Refresh policy: in-distribution appends never trigger, planted
  * drift triggers exactly once and recovers, baseline resets after a
  * retrain, and the trace replays across layouts.
  */
class IndexRefreshSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, idBase: Long, seed: Int,
                        shift: Double = 0.0) = {
    val r = new scala.util.Random(seed)
    val anchors = Array.fill(4)(Array.fill(16)(r.nextGaussian()))
    (0 until n).map { i =>
      val a = anchors(i % 4)
      (idBase + i, a.map(x => (x + shift + 0.1 * r.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("drift triggers a retrain that recovers; in-distribution appends don't") {
    val base = clustered(120, 0L, seed = 11)
    val inDist = clustered(40, 1000L, seed = 11) // same anchors
    val drifted = clustered(40, 2000L, seed = 11, shift = 4.0)
    val trace = Similarity.refreshPolicy(base, Seq(inDist, drifted),
        nlist = 4, m = 4, ks = 8, dim = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    trace shouldBe Array(
      (1, 40L, 160L, false, true),
      (2, 40L, 200L, true, true))
  }

  test("a second in-distribution batch after a retrain rides the new baseline") {
    val base = clustered(120, 0L, seed = 23)
    val drifted = clustered(40, 1000L, seed = 23, shift = 4.0)
    // same drifted distribution again (same seed → same anchors): the
    // retrained artifacts now cover it, so batch 2 must NOT trigger
    val driftedAgain = clustered(40, 2000L, seed = 23, shift = 4.0)
    val trace = Similarity.refreshPolicy(base, Seq(drifted, driftedAgain),
        nlist = 16, m = 4, ks = 16, dim = 16)
      .collect().map(r => (r.getInt(0), r.getBoolean(3), r.getBoolean(4)))
    trace shouldBe Array((1, true, true), (2, false, true))
  }

  test("trace replays identically across corpus layouts") {
    val base = clustered(100, 0L, seed = 31)
    val b1 = clustered(30, 1000L, seed = 31)
    val b2 = clustered(30, 2000L, seed = 31, shift = 4.0)
    def run(parts: Int) = Similarity.refreshPolicy(
        base.repartition(parts), Seq(b1.repartition(parts),
          b2.repartition(parts)), nlist = 4, m = 4, ks = 8, dim = 16)
      .collect().map(r => (r.getInt(0), r.getBoolean(3), r.getBoolean(4)))
      .toSeq
    run(1) shouldBe run(13)
  }
}
