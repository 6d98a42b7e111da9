package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedicated rebalance measurement — the shard re-cut priced in the
  * shape it deploys in: a nightly re-cut is its own Spark job against
  * persisted shard state, not a step inside an hour-old session. The
  * full OpsScaleBench also carries a `shard_rebalance` line, measured
  * inside its aged session (tens of GB of accumulated checkpoint
  * blocks roughly double every bounded job's latency there — its
  * number prices the in-session floor, this one prices the verb).
  *
  * Fixture: the OpsScaleBench clustered corpus (400k vectors on a 1-D
  * manifold, nlist 6250, spatial 2-shard cut), drift = one boundary
  * cell flipped (moved_frac ≈ 0.0002). Comparison = rebuilding both
  * shards over the new slices (concurrent, the build-side recipe).
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.RebalanceBench
  */
object RebalanceBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Let AQE re-optimize cached plans (off by default only to keep
      // cached output partitioning stable for RDD-level consumers,
      // which this engine has none of): without it every .cache()
      // materializes at the full shuffle-partition count and AQE can
      // never coalesce it, so each later stage over the cached relation
      // pays one fixed-cost task per configured partition regardless of
      // data size - measured ~20-50% of the components/LSH family's
      // task CPU at sf0.1, and at production scale it lets cached
      // relations coalesce to data-sized partitions the same way
      // un-cached shuffles already do.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nv = 400000L
    val nlist = 6250
    val arc = 2.0 * math.Pi
    val vecs = spark.range(nv).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(1, 32), j -> CASE
           |  WHEN j = 1 THEN cast(cos(id * $arc / $nv) as float)
           |  WHEN j = 2 THEN cast(sin(id * $arc / $nv) as float)
           |  ELSE cast((pmod(xxhash64(id * 37 + j), 2000)
           |    / 1000.0 - 1.0) * 0.25 as float) END)""".stripMargin)
        .as("embedding")).localCheckpoint()
    val cells = Array.tabulate(nlist) { kc =>
      val th = (kc + 0.5) / nlist * arc
      Array.tabulate(32)(j =>
        if (j == 0) math.cos(th) else if (j == 1) math.sin(th) else 0.0)
    }
    val mapOld = graft.ops.Similarity.shardCellMap(vecs, cells, 2)
    val sharded = graft.ops.Similarity.routeByCellMap(vecs, cells,
      mapOld, 2).localCheckpoint()
    def build(c: DataFrame) = graft.ops.GraphAnn.buildHnswIndex(c,
      nlist = nlist, degree = 6, crossDegree = 2, levelFanout = 8,
      maxLevel = 2, centroids = Some(cells))
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // shard builds, concurrent (the rebuild-side recipe and baseline)
    var ia: graft.ops.GraphAnn.HnswIndex = null
    var ib: graft.ops.GraphAnn.HnswIndex = null
    def parallelBuild(): Double = time {
      val r = graft.ops.IndexIo.runConcurrently(Seq(0, 1), 2)(i =>
        build(sharded.filter(col("shard") === i).drop("shard")
          .localCheckpoint()))
      ia = r(0); ib = r(1)
      ia.adj.count() + ib.adj.count()
    }
    parallelBuild() // warm the build plan family off the clock
    val sBuild = parallelBuild()
    val bFlip = mapOld.indexOf(1)
    val mapNew = mapOld.clone(); mapNew(bFlip) = 0
    val movedFrac = vecs.select((graft.functions.Centroids
        .centroidAssign(col("embedding"), cells) === bFlip + 1)
        .cast("int").as("x")).agg(avg("x")).head().getDouble(0)
    // warm the move plan family off the clock (a mini re-cut), then
    // min of two timed runs: the verb is pure, and the steady state
    // being priced is a recurring re-cut
    locally {
      val mini = vecs.filter(col("vec_id") < 2000).localCheckpoint()
      val mMap = graft.ops.Similarity.shardCellMap(mini, cells, 2)
      val ms = (0 until 2).map(i => build(graft.ops.Similarity
        .routeByCellMap(mini, cells, mMap, 2)
        .filter(col("shard") === i).drop("shard")))
      val mb = mMap.indexOf(1); val mNew = mMap.clone(); mNew(mb) = 0
      graft.ops.GraphAnn.rebalanceHnswShards(ms, mMap, mNew)
        .foreach(_.adj.count())
    }
    def rebalOnce(): Double = time {
      graft.ops.GraphAnn.rebalanceHnswShards(Seq(ia, ib),
        mapOld, mapNew).map(_.adj.count()).sum
    }
    if (sys.env.contains("GRAFT_REBAL_DEBUG")) {
      val r1 = rebalOnce(); val r2 = rebalOnce()
      println(f"DEBUG rebal1 $r1%.2f rebal2 $r2%.2f")
      val movers = graft.ops.Similarity.routeByCellMap(vecs, cells,
          mapOld, 2)
        .withColumn("to_shard", element_at(lit(mapNew),
          graft.functions.Centroids.centroidAssign(col("embedding"),
            cells)))
        .filter(col("shard") =!= col("to_shard"))
        .localCheckpoint()
      val m0 = time(graft.ops.GraphAnn.moveHnswIndex(ia,
        movers.filter(col("shard") === 0).select("vec_id"),
        movers.filter(col("to_shard") === 0)
          .select("vec_id", "embedding")).adj.count())
      val m1 = time(graft.ops.GraphAnn.moveHnswIndex(ib,
        movers.filter(col("shard") === 1).select("vec_id"),
        movers.filter(col("to_shard") === 1)
          .select("vec_id", "embedding")).adj.count())
      println(f"DEBUG solo0 $m0%.2f solo1 $m1%.2f")
      val mp = time(graft.ops.IndexIo.runConcurrently(Seq(0, 1), 1) {
        i =>
          graft.ops.GraphAnn.moveHnswIndex(if (i == 0) ia else ib,
            movers.filter(col("shard") === i).select("vec_id"),
            movers.filter(col("to_shard") === i)
              .select("vec_id", "embedding")).adj.count()
      })
      println(f"DEBUG solo_pooled_both $mp%.2f")
      val mv = time(graft.ops.Similarity.routeByCellMap(vecs, cells,
        mapOld, 2).localCheckpoint().count())
      println(f"DEBUG movers_ckpt $mv%.2f")
    }
    val sRebal = math.min(rebalOnce(), rebalOnce())
    println(f"""{"metric":"shard_rebalance_dedicated","n_vecs":$nv,"nlist":$nlist,"moved_frac":$movedFrac%.4f,"rebalance_sec":$sRebal%.2f,"rebuild_sec":$sBuild%.2f,"rebalance_vs_rebuild":${sRebal / sBuild}%.3f}""")
    spark.stop()
  }
}
