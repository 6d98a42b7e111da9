package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve measurement for the heavy curation operators: the same
  * op at 1× and 10× corpus size, reported as one JSON line — the ops
  * analog of the WarehouseBench 10× datapoint. The 10× corpus is the
  * sf corpus replicated with remapped ids and a per-replica suffix
  * token: every document becomes a 10-member NEAR-duplicate cluster,
  * which is the hostile shape for the dedup family (bucket load and
  * pair counts grow with cluster size), so the curve measured here is
  * a worst-case, not a best-case.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.OpsScaleBench [mult]
  */
object OpsScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").cache()
    val n1 = base.count()

    def replicated(m: Int): DataFrame =
      if (m == 1) base
      else (0 until m).map { k =>
        base.select((col("doc_id") * m + k).as("doc_id"),
          concat(col("text"), lit(s" replica$k")).as("text"))
      }.reduce(_.unionByName(_))

    // Bench's sink: full-row hash aggregate, NOT count() — under
    // count() Catalyst eliminates the outer joins and prunes whole
    // pipelines (a span-dedup "measurement" that never grams anything)
    def sink(df: DataFrame): Long = {
      val h = df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
        .agg(count(lit(1)).as("n"), bit_xor(col("__h")).as("x")).collect()(0)
      h.getLong(0)
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // task CPU + input bytes via listener, bus-drained for exact
    // attribution (the Bench discipline): CPU adjudicates contention,
    // bytes adjudicate scan pruning
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val inputBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    // held in a val and removed before the final report: a listener
    // left registered would attribute any later in-session work to the
    // measured block (the drain discipline only bounds WHEN counts
    // land, not WHOSE tasks they are)
    val meterListener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          cpuNanos.addAndGet(m.executorCpuTime)
          inputBytes.addAndGet(m.inputMetrics.bytesRead)
          shuffleBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(meterListener)
    def cpuTime(f: => Long): (Double, Double, Long, Long) = {
      org.apache.spark.graftbridge.CoreBridge
        .drainListenerBus(spark.sparkContext)
      val c0 = cpuNanos.get(); val b0 = inputBytes.get()
      val t0 = System.nanoTime()
      val rows = f
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.CoreBridge
        .drainListenerBus(spark.sparkContext)
      ((cpuNanos.get() - c0) / 1e9, wall, rows,
        inputBytes.get() - b0)
    }
    // wall + shuffle-read bytes: the metric the bucketed serving
    // layouts move (exchanged bytes per serve), same drain discipline
    def shufTime(f: => Long): (Double, Long) = {
      org.apache.spark.graftbridge.CoreBridge
        .drainListenerBus(spark.sparkContext)
      val s0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.CoreBridge
        .drainListenerBus(spark.sparkContext)
      (wall, shuffleBytes.get() - s0)
    }

    val ops: Seq[(String, DataFrame => Long)] = Seq(
      "minhash_lsh_ids" -> (df => sink(graft.ops.Dedup.minhashLsh(df,
        "text", "doc_id", carrySignatures = false))),
      "span_dedup" -> (df => sink(graft.ops.Dedup.dedupSpans(df, "text",
        "doc_id", l = 8))),
      "dsir_weights" -> (df => sink(graft.ops.Curation.dsirWeights(df,
        "text", "doc_id", col("doc_id") % 3 === 0))),
      "gopher_rules" -> (df => sink(df.select(col("doc_id") +:
        graft.ops.TextOps.gopherRules(col("text"))
          .map { case (n, c) => c.as(n) }: _*))),
      // FIXED-size benchmark (first 50 base docs) against the growing
      // corpus — the real decontamination shape: the broadcast side
      // must stay constant while the stream side scales
      "fuzzy_decontaminate" -> (df => sink(graft.ops.Curation
        .fuzzyContamination(df, base.filter(col("doc_id") < 50),
          "text", "doc_id"))),
      "bm25" -> { df =>
        import spark.implicits._
        val qt = Seq("q1" -> "hash", "q1" -> "join", "q2" -> "vector",
          "q2" -> "scan", "q3" -> "stream").toDF("query_id", "term")
        // cacheTf=false: the timed runs must pay the full pipeline —
        // a cached (doc, term) combine would flatten the curve
        sink(graft.ops.TextOps.bm25(df, "text", "doc_id", qt,
          cacheTf = false))
      },
      // State build + scoring at the growing corpus — the incremental
      // retrieval path. The state is per-run (not cached), so the
      // curve measures the full tokenize+aggregate+score pipeline.
      "bm25_state_score" -> { df =>
        import spark.implicits._
        val qt = Seq("q1" -> "hash", "q1" -> "join", "q2" -> "vector",
          "q2" -> "scan", "q3" -> "stream").toDF("query_id", "term")
        val st = graft.ops.TextOps.bm25State(df, "text", "doc_id")
        sink(graft.ops.TextOps.bm25ScoreWithState(st, df, "text",
          "doc_id", qt))
      },
      // Full-batch GD over hashed n-gram features: iteration count is
      // fixed, so the curve is the per-iteration aggregate cost.
      "hashed_classifier_train" -> { df =>
        val keep = graft.ops.TextOps.qualityMetrics(col("text"))
          .toMap.apply("keep")
        val m = graft.ops.TextOps.trainHashedClassifier(df, "text",
          "doc_id", keep, buckets = 64, iters = 3)
        sink(df.select(col("doc_id"),
          graft.ops.TextOps.scoreHashedClassifier(col("text"), m).as("s")))
      },
      // Banded Hamming pairs over packed text-simhash-style codes
      // derived from the replicated corpus: replicas become clusters
      // of identical codes — the hostile quadratic shape for any pair
      // generator — so this curve bounds the banding's blowup with
      // the cap in place.
      // Sketch-then-recount heavy hitters over exploded bigrams: the
      // gram table grows linearly with the corpus but the shuffle only
      // ever carries bounded MG summaries + the candidates' rows, so
      // the curve should track the scan, not the distinct-gram count
      // (replicas multiply gram OCCURRENCES, not distinct grams —
      // the sketch's easy direction; the replica-suffix tokens add
      // mult new grams each).
      "heavy_hitters" -> { df =>
        val grams = df.select(explode(expr(
          """transform(sequence(1, size(split(text, ' ')) - 1),
            |  i -> concat(element_at(split(text, ' '), i), ' ',
            |              element_at(split(text, ' '), i + 1)))"""
            .stripMargin)).as("item"))
        // capacity sized so the MG error band (N/(capacity+1)) stays
        // under the threshold at the 10× corpus (~2.7M bigram rows)
        sink(graft.ops.Curation.heavyHitters(grams, "item",
          minCount = 100L, capacity = 65536))
      },
      // All-integer PPS draw: prefix sum + lattice count. The curve is
      // the subtotal machinery's — one bounded shuffle of per-partition
      // sums — so it should be scan-bound at any corpus size.
      "pps_sample" -> (df => sink(graft.ops.Curation.ppsSample(df,
        "doc_id", size(split(col("text"), " ")).cast("long"),
        n = 50L))),
      "hamming_pairs" -> { df =>
        val sim = graft.functions.SimHashSignature.simhashSignature(
          split(graft.ops.TextOps.normalize(col("text")), " "))
        val fp = df.select(col("doc_id"),
          array(sim.bitwiseAND(lit(0xFFFFFFFFL)),
            shiftright(sim, 32).bitwiseAND(lit(0xFFFFFFFFL))).as("code"))
        sink(graft.ops.Similarity.hammingNearDupPairs(fp, "doc_id",
          "code", maxHamming = 3, maxBucket = 1000))
      },
      // EXACT substring dedup at character grain: the curve is
      // log(minLen) rounds of two hash shuffles over one (pos, cls)
      // row per corpus character — should track the character count
      // linearly (replica-suffix tokens add fresh text, so the marked
      // set grows too, but marking is one more keyed aggregate).
      "substr_dedup_exact" -> (df => sink(
        graft.ops.SuffixArray.repeatedSpans(df, "text", "doc_id",
          minLen = 40))),
      // Graph-ANN build + serve with nlist scaled to hold cell size
      // constant (the production configuration — fixed nlist would
      // make the within-cell self-join quadratic): build is n·cellsize
      // edge candidates, serve is a fixed 20-query beam batch, so the
      // curve should be ~linear in the corpus.
      "graph_ann" -> { df =>
        val vecs = df.select(col("doc_id").as("vec_id"),
          expr("transform(sequence(1, 32), j -> " +
            "cast(pmod(xxhash64(doc_id * 31 + j), 1000) / 500.0 - 1.0 " +
            "as float))").as("embedding")).localCheckpoint()
        val n = vecs.count()
        val idx = graft.ops.GraphAnn.buildGraphIndex(vecs,
          nlist = math.max(16, (n / 64).toInt), degree = 6,
          crossDegree = 2)
        sink(graft.ops.GraphAnn.queryGraphIndex(
          vecs.filter(col("vec_id") < 20), idx, k = 5, beam = 3,
          hops = 2))
      },
      // HNSW build + serve, nlist scaled like graph_ann (cell size
      // constant). Layer sizes decay by fanout^l and the per-layer
      // grid coarsens with them, so the build cost is a geometric
      // series over the layer-0 term — the curve should track
      // graph_ann's with a bounded constant on top, NOT a second
      // linear term; serve adds two narrow upper sweeps per query.
      "hnsw" -> { df =>
        val vecs = df.select(col("doc_id").as("vec_id"),
          expr("transform(sequence(1, 32), j -> " +
            "cast(pmod(xxhash64(doc_id * 31 + j), 1000) / 500.0 - 1.0 " +
            "as float))").as("embedding")).localCheckpoint()
        val n = vecs.count()
        val idx = graft.ops.GraphAnn.buildHnswIndex(vecs,
          nlist = math.max(16, (n / 64).toInt), degree = 6,
          crossDegree = 2, levelFanout = 8, maxLevel = 2)
        sink(graft.ops.GraphAnn.queryHnswIndex(
          vecs.filter(col("vec_id") < 20), idx, k = 5, beam = 3,
          hops = 2, upperBeam = 1, upperHops = 2))
      })

    val parts = ops.map { case (name, f) =>
      val d1 = replicated(1)
      val dM = replicated(mult).localCheckpoint() // pay replication once
      f(d1) // untimed warmup: JIT + codegen compile off the measurement
      val (s1a, r1) = time(f(d1)); val (s1b, _) = time(f(d1))
      val (sMa, rM) = time(f(dM)); val (sMb, _) = time(f(dM))
      val s1 = math.min(s1a, s1b); val sM = math.min(sMa, sMb)
      f"""\"$name\":{\"sec_1x\":$s1%.2f,\"sec_${mult}x\":$sM%.2f,\"ratio\":${sM / s1}%.2f,\"rows_1x\":$r1,\"rows_${mult}x\":$rM}"""
    }
    // singleton-pruning collapse curve on NATURAL text (the 1× corpus):
    // per-refinement-round surviving (pos, cls) rows — the volume each
    // later round actually shuffles, vs the total character count the
    // unpruned loop would carry to the end
    val survivors = graft.ops.SuffixArray.refinementSurvivorCounts(
      base, "text", "doc_id", minLen = 40)
    val totalChars = base.agg(sum(length(col("text")))).head().getLong(0)
    val survJson = survivors
      .map { case (w, n) => s""""w$w":$n""" }.mkString(",")
    // Incremental substring index: append-vs-rebuild at the grown
    // corpus — the exact-family analog of the d13/d14/d16 incremental
    // curves, in the regime the index exists for: a SMALL increment
    // (a tenth of the base corpus — the daily-crawl shape) landing on
    // a mult×-accumulated index. The accumulated index is built OFF
    // the clock (production owns it already); the timed pair is the
    // batch append (refines only the batch's characters against the
    // persisted dictionaries) vs re-refining the whole union from
    // scratch. The ratio falls as the accumulated corpus grows —
    // measured at sf0.1 / mult 4: append 6-8 s vs rebuild 25 s.
    val acc = replicated(mult).localCheckpoint()
    val batch = base.filter(col("doc_id") < n1 / 10)
      .select((col("doc_id") + n1 * (mult + 1)).as("doc_id"),
        concat(col("text"), lit(" replicaZ")).as("text"))
      .localCheckpoint()
    val allLen = acc.unionByName(batch)
      .agg(max(length(col("text")))).head().getInt(0)
    val idx0 = graft.ops.SuffixArray.buildSubstrIndex(acc, "text",
      "doc_id", minLen = 40, maxDocLen = allLen)
    // the refinement state materializes EAGERLY inside build/append
    // (localCheckpoint), so timing the calls times exactly the index
    // MAINTENANCE — the work the append exists to shrink; the spans
    // readout over the accumulated keys (identical cost on either
    // path — it is a whole-corpus question) is timed once, separately
    var grownKeys = 0L
    val (sApp, _) = time {
      grownKeys = graft.ops.SuffixArray.appendToSubstrIndex(idx0, batch,
        "text", "doc_id").keys.count()
      grownKeys
    }
    val union = acc.unionByName(batch).localCheckpoint()
    var fullIdx: graft.ops.SuffixArray.SubstrIndex = null
    val (sReb, rReb) = time {
      fullIdx = graft.ops.SuffixArray.buildSubstrIndex(union, "text",
        "doc_id", minLen = 40, maxDocLen = allLen)
      fullIdx.keys.count()
    }
    val (sSpan, rSpan) = time(sink(
      graft.ops.SuffixArray.substrIndexSpans(fullIdx, "doc_id")))
    // The nightly PERSISTED path, both layouts: a plain parquet save
    // re-scans the whole pair dictionary from disk once per doubling
    // round of every append; the width-partitioned bucketed layout
    // prunes each round to its width's slice (PartitionFilters,
    // spec-pinned), so the per-append dictionary bytes drop from
    // rounds x |dict| to |dict| — the ratio below measures that cut
    // on the same batch.
    val dirP = "/tmp/graft-opsscale-substr-plain"
    val dirB = "/tmp/graft-opsscale-substr-bucketed"
    graft.ops.SuffixArray.saveSubstrIndex(idx0, dirP)
    graft.ops.SuffixArray.saveSubstrIndexBucketed(idx0, dirB,
      "opsscale_substr", buckets = 32, partitionDictByWidth = true)
    val loadedP = graft.ops.SuffixArray.loadSubstrIndex(spark, dirP)
    val loadedB = graft.ops.SuffixArray.loadSubstrIndexBucketed(spark,
      dirB, "opsscale_substr")
    // bytes read is the scale metric pruning moves (each round reads
    // ONE width slice instead of the whole dictionary); local WALL at
    // this corpus is file-count/catalog bound and can run against the
    // pruned layout — report both, adjudicate by bytes
    val (_, sAppP, _, bAppP) = cpuTime {
      graft.ops.SuffixArray.appendToSubstrIndex(loadedP, batch,
        "text", "doc_id").keys.count()
    }
    val (_, sAppB, _, bAppB) = cpuTime {
      graft.ops.SuffixArray.appendToSubstrIndex(loadedB, batch,
        "text", "doc_id").keys.count()
    }
    val substrIdxJson = f""""substr_index":{"acc_docs":${n1 * mult},"batch_docs":${n1 / 10},"append_sec":$sApp%.2f,"rebuild_sec":$sReb%.2f,"ratio":${sApp / sReb}%.2f,"append_loaded_plain_sec":$sAppP%.2f,"append_loaded_pruned_sec":$sAppB%.2f,"append_loaded_plain_bytes":$bAppP,"append_loaded_pruned_bytes":$bAppB,"pruned_bytes_ratio":${bAppB.toDouble / bAppP}%.2f,"spans_sec":$sSpan%.2f,"keys":$grownKeys,"spans":$rSpan}"""

    // Substr-index scale exponent (the round-13 cost-center question:
    // d28/d37/d30/d32 dominate the bench — does construction scale?):
    // build wall AND small-batch append wall at 1×/4×/10× accumulated
    // corpus, with the SAME fixed batch appended at every point. The
    // fitted log-log slope names the exponent: refinement is
    // log(minLen) rounds of keyed shuffles over one row per surviving
    // character, so build should fit ~1 (linear in characters, the
    // d25 curve note), and append should be FLAT-ish in the
    // accumulated size (it refines only the batch's characters against
    // the persisted dictionaries — sub-linear growth comes only from
    // the dictionary probe joins' scan term).
    val scaleBatch = base.filter(col("doc_id") < n1 / 10)
      .select((col("doc_id") + n1 * 1000L).as("doc_id"),
        concat(col("text"), lit(" replicaZ")).as("text"))
      .localCheckpoint()
    val scalePts = Seq(1, 4, 10).map { m =>
      val c = replicated(m).localCheckpoint()
      val mLen = c.unionByName(scaleBatch)
        .agg(max(length(col("text")))).head().getInt(0)
      var sIdx: graft.ops.SuffixArray.SubstrIndex = null
      val (sBld, _) = time {
        sIdx = graft.ops.SuffixArray.buildSubstrIndex(c, "text",
          "doc_id", minLen = 40, maxDocLen = mLen)
        sIdx.keys.count()
      }
      val (sApnd, _) = time {
        graft.ops.SuffixArray.appendToSubstrIndex(sIdx, scaleBatch,
          "text", "doc_id").keys.count()
      }
      (m, sBld, sApnd)
    }
    def fitSlope(pts: Seq[(Double, Double)]): Double = {
      val xs = pts.map(p => math.log(p._1)); val ys = pts.map(p => math.log(p._2))
      val mx = xs.sum / xs.length; val my = ys.sum / ys.length
      val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val den = xs.map(x => (x - mx) * (x - mx)).sum
      num / den
    }
    val bldExp = fitSlope(scalePts.map(p => (p._1.toDouble, p._2)))
    val apndExp = fitSlope(scalePts.map(p => (p._1.toDouble, p._3)))
    val scaleJson = s""""substr_scale_curve":{${
      scalePts.map { case (m, b, a) =>
        f""""x$m":{"build_sec":$b%.2f,"append_sec":$a%.2f}""" }
        .mkString(",")
    },${f""""build_exponent":$bldExp%.2f,"append_exponent":$apndExp%.2f"""}}"""

    // Singleton-pruning CPU re-pin (round-11 evidence gap): d25's
    // pruning win is re-measured as a toggled pair on the SAME host in
    // the SAME session — wall AND task CPU — so the claim is a
    // committed ratio, not a cross-round comparison of contended
    // numbers. Spans are identical either way (spec-pinned).
    def spansToggled(prune: Boolean): Long = sink(
      graft.ops.SuffixArray.repeatedSpansPruneToggle(base, "text",
        "doc_id", minLen = 40, prune = prune))
    spansToggled(true) // warmup: JIT + codegen off the clock
    val (cOn, wOn, rOn, _) = cpuTime(spansToggled(true))
    val (cOff, wOff, rOff, _) = cpuTime(spansToggled(false))
    val pruneJson = f""""substr_prune":{"cpu_on_sec":$cOn%.2f,"cpu_off_sec":$cOff%.2f,"cpu_ratio":${cOn / cOff}%.2f,"wall_on_sec":$wOn%.2f,"wall_off_sec":$wOff%.2f,"rows_equal":${rOn == rOff}}"""

    // Sharded parallel build + merge (the n46/n47 verb measured),
    // decomposed into the terms that decide the 100 TB recipe:
    //  - parallel_build_sec: two SPATIALLY-sharded builds run
    //    CONCURRENTLY on this host (the local stand-in for two cluster
    //    build jobs). On ONE shared host shard builds are
    //    work-conserving, so this ≈ the one-shot wall — the recipe's
    //    wall win comes from disjoint cluster resources, which a
    //    local[32] line cannot manufacture;
    //  - merge_sec and affected_frac: the merge's work is EXACTLY the
    //    affected fraction re-running the edge rule (plus bounded
    //    stage constants). affected_frac is the quantity a deployment
    //    controls via shard geometry: home cells are disjoint under
    //    spatial sharding, so the leak is nodes whose SECOND cell
    //    crosses the boundary — ~1/2 on this hash-random corpus (the
    //    honest worst case; clustered corpora with geometry-aware
    //    shards shrink it toward the boundary, and crossDegree = 0
    //    makes it exactly zero).
    val vecsAll = replicated(mult)
      .select(col("doc_id").as("vec_id"),
        expr("transform(sequence(1, 32), j -> " +
          "cast(pmod(xxhash64(doc_id * 31 + j), 1000) / 500.0 - 1.0 " +
          "as float))").as("embedding")).localCheckpoint()
    val nv = vecsAll.count()
    val nlist = math.max(16, (nv / 64).toInt)
    val mergeCells = graft.ops.Similarity.firstVectors(vecsAll, nlist)
    def buildShard(c: DataFrame) = graft.ops.GraphAnn.buildHnswIndex(c,
      nlist = nlist, degree = 6, crossDegree = 2, levelFanout = 8,
      maxLevel = 2, centroids = Some(mergeCells))
    val cellCol = graft.functions.Centroids.centroidAssign(
      col("embedding"), mergeCells)
    val cell2Col = graft.functions.Centroids.centroidProbes(
      col("embedding"), mergeCells, 2).getItem(1)
    val shardA = vecsAll.filter(cellCol < nlist / 2).localCheckpoint()
    val shardB = vecsAll.filter(cellCol >= nlist / 2).localCheckpoint()
    // affected fraction at layer 0: nodes whose second cell crosses
    // the shard boundary (home cells are disjoint by construction)
    val affectedFrac = vecsAll
      .select(((cellCol < nlist / 2) =!= (cell2Col < nlist / 2))
        .cast("int").as("x"))
      .agg(avg("x")).head().getDouble(0)
    buildShard(vecsAll) // warmup
    val (sOne, _) = time { buildShard(vecsAll).adj.count() }
    var mergeSec = 0.0
    var mergedIdx: graft.ops.GraphAnn.HnswIndex = null
    val (sPar, _) = time {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fa = Future(buildShard(shardA))
      val fb = Future(buildShard(shardB))
      val ia = Await.result(fa, Duration.Inf)
      val ib = Await.result(fb, Duration.Inf)
      val t0 = System.nanoTime()
      val m = graft.ops.GraphAnn.mergeHnswIndexes(ia, ib)
      val r = m.adj.count()
      mergeSec = (System.nanoTime() - t0) / 1e9
      mergedIdx = m
      r
    }
    // compressed-tier completion: projecting the merged float index
    // into its PQ serving form (encodeHnswIndex — one row-independent
    // pass) vs the rebuild-the-union path the recipe used to route
    // through (buildHnswPqIndex re-runs the whole float graph build).
    // The ratio is the verb's reason to exist.
    val (encSec, _) = time {
      graft.ops.GraphAnn.encodeHnswIndex(mergedIdx, m = 8, ks = 16,
        dim = 32).nodes.count()
    }
    val (pqRebSec, _) = time {
      graft.ops.GraphAnn.buildHnswPqIndex(vecsAll, nlist = nlist,
        degree = 6, crossDegree = 2, levelFanout = 8, maxLevel = 2,
        m = 8, ks = 16, dim = 32,
        centroids = Some(mergeCells)).nodes.count()
    }
    val mergeJson = f""""shard_merge":{"n_vecs":$nv,"oneshot_sec":$sOne%.2f,"parallel_build_sec":${sPar - mergeSec}%.2f,"merge_sec":$mergeSec%.2f,"affected_frac":$affectedFrac%.2f,"total_ratio":${sPar / sOne}%.2f,"pq_encode_sec":$encSec%.2f,"pq_rebuild_sec":$pqRebSec%.2f,"pq_encode_ratio":${encSec / pqRebSec}%.2f}"""

    // The same merge on a CLUSTERED corpus under shardByCells — the
    // regime the boundary-priced claim is about. The random corpus
    // above is the honest worst case (cell2 is arbitrary →
    // affected_frac ≈ 0.5); this fixture is the honest best case: a
    // 1-D geodesic manifold (quarter arc of the unit circle in dims
    // 1-2, hash noise in dims 3-32 — ORTHOGONAL noise rescales the
    // vector norm identically across centroids, so cosine argmax
    // ranking is exactly nearest-in-arc and cell2 is the adjacent
    // cell; in-plane jitter of ±0.2 cell widths keeps boundaries
    // real). Real clustered corpora sit between the two numbers.
    // Expected: affected_frac ≈ (boundary cells)/nlist and merge_sec
    // a small constant, vs 0.5 / edge-rerun-priced on random data.
    val arc = math.Pi / 2
    // 20× the random fixture: the merge's remaining cost is bounded
    // stage constants + work ∝ affected, so the wall ratio to the
    // (linear-in-corpus) one-shot build only shows at a corpus where
    // the build dominates those constants
    val nvC = nv * 20
    val nlistC = math.max(16, (nvC / 64).toInt)
    val jitterAmp = 0.2 * arc / nlistC
    val clusteredVecs = spark.range(nvC).select(
      col("id").as("vec_id"),
      expr(
        s"""transform(sequence(1, 32), j -> CASE
           |  WHEN j = 1 THEN cast(cos((id + 0.5) / $nvC * $arc +
           |    (pmod(xxhash64(id * 53 + 1), 1001) / 500.0 - 1.0)
           |      * $jitterAmp) as float)
           |  WHEN j = 2 THEN cast(sin((id + 0.5) / $nvC * $arc +
           |    (pmod(xxhash64(id * 53 + 1), 1001) / 500.0 - 1.0)
           |      * $jitterAmp) as float)
           |  ELSE cast((pmod(xxhash64(id * 1000 + j * 17 + 5), 2001)
           |    / 1000.0 - 1.0) * 0.25 as float) END)""".stripMargin)
        .as("embedding")).localCheckpoint()
    val spatialCells = Array.tabulate(nlistC) { kc =>
      val th = (kc + 0.5) / nlistC * arc
      Array.tabulate(32)(j =>
        if (j == 0) math.cos(th) else if (j == 1) math.sin(th) else 0.0)
    }
    val shardMap = graft.ops.Similarity.shardCellMap(clusteredVecs,
      spatialCells, 2)
    val shardedC = graft.ops.Similarity.shardByCells(clusteredVecs,
      spatialCells, 2).localCheckpoint()
    val cProbes = graft.functions.Centroids.centroidProbes(
      col("embedding"), spatialCells, 2)
    val affectedFracSpatial = clusteredVecs
      .select((element_at(lit(shardMap), cProbes.getItem(0)) =!=
        element_at(lit(shardMap), cProbes.getItem(1)))
        .cast("int").as("x"))
      .agg(avg("x")).head().getDouble(0)
    def buildSpatial(c: DataFrame) = graft.ops.GraphAnn.buildHnswIndex(
      c, nlist = nlistC, degree = 6, crossDegree = 2, levelFanout = 8,
      maxLevel = 2, centroids = Some(spatialCells))
    val shardCA = shardedC.filter(col("shard") === 0).drop("shard")
      .localCheckpoint()
    val shardCB = shardedC.filter(col("shard") === 1).drop("shard")
      .localCheckpoint()
    buildSpatial(clusteredVecs) // warmup: fresh plan family
    val (sOneC, _) = time { buildSpatial(clusteredVecs).adj.count() }
    var mergeSecC = 0.0
    var shardIa: graft.ops.GraphAnn.HnswIndex = null
    var shardIb: graft.ops.GraphAnn.HnswIndex = null
    val (sParC, _) = time {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fa = Future(buildSpatial(shardCA))
      val fb = Future(buildSpatial(shardCB))
      val ia = Await.result(fa, Duration.Inf)
      val ib = Await.result(fb, Duration.Inf)
      shardIa = ia; shardIb = ib
      val t0 = System.nanoTime()
      val r = graft.ops.GraphAnn.mergeHnswIndexes(ia, ib).adj.count()
      mergeSecC = (System.nanoTime() - t0) / 1e9
      r
    }
    val mergeSpatialJson = f""""shard_merge_spatial":{"n_vecs":$nvC,"nlist":$nlistC,"affected_frac":$affectedFracSpatial%.4f,"oneshot_sec":$sOneC%.2f,"parallel_build_sec":${sParC - mergeSecC}%.2f,"merge_sec":$mergeSecC%.2f,"merge_vs_oneshot":${mergeSecC / sOneC}%.3f}"""

    // Drift re-cut on the same shards (the n58 verb): flip shard 1's
    // first cell to shard 0 and MOVE only the crossing rows — the
    // comparison is the verb's alternative, rebuilding both shards
    // over the new slices (parallel_build_sec above is exactly that
    // wall). moved_frac prices the drift; the ratio is the verb's
    // reason to exist at 100 TB, where a rebuild is a corpus-sized
    // job and a re-cut moves one boundary cell.
    val mapOld = shardMap
    val bFlip = mapOld.indexOf(1)
    val mapNew = mapOld.clone(); mapNew(bFlip) = 0
    // warmup: the fused-move plan family + codegen off the clock (the
    // same discipline as every other serve/build leg here) — a
    // miniature re-cut over a 2k-vector slice of the same fixture;
    // measured: the cold first execution of the move family costs ~7 s
    // of driver-side analysis/codegen that a production deployment
    // pays once per session, not per re-cut
    locally {
      val mini = clusteredVecs.filter(col("vec_id") < 2000)
        .localCheckpoint()
      val miniMap = graft.ops.Similarity.shardCellMap(mini,
        spatialCells, 2)
      val miniShards = (0 until 2).map(i =>
        buildSpatial(graft.ops.Similarity.routeByCellMap(mini,
          spatialCells, miniMap, 2)
          .filter(col("shard") === i).drop("shard")))
      val mb = miniMap.indexOf(1)
      val mNew = miniMap.clone(); mNew(mb) = 0
      graft.ops.GraphAnn.rebalanceHnswShards(miniShards, miniMap,
        mNew).foreach(_.adj.count())
    }
    val movedFrac = clusteredVecs
      .select((graft.functions.Centroids.centroidAssign(
        col("embedding"), spatialCells) === bFlip + 1)
        .cast("int").as("x"))
      .agg(avg("x")).head().getDouble(0)
    // The rebalance is ONE batched job family across all touched
    // shards (moveHnswShardsBatched) — no per-shard concurrency knob
    // to size. Min of two samples: the verb is pure (inputs
    // untouched), its wall is ~15 bounded driver jobs whose per-job
    // cost swings 2× with JVM state, and the steady state being
    // priced is a nightly re-cut on a long-lived session — the warm
    // sample, same as every serve leg's warmup discipline.
    def rebalOnce(): Double = time {
      graft.ops.GraphAnn.rebalanceHnswShards(Seq(shardIa, shardIb),
        mapOld, mapNew)
        .map(_.adj.count()).sum
    }._1
    val sRebal = math.min(rebalOnce(), rebalOnce())
    val rebalJson = f""""shard_rebalance":{"n_vecs":$nvC,"moved_frac":$movedFrac%.4f,"rebalance_sec":$sRebal%.2f,"rebuild_sec":${sParC - mergeSecC}%.2f,"rebalance_vs_rebuild":${sRebal / (sParC - mergeSecC)}%.3f}"""

    // Serve-regime scale curve: per-query serve cost swept across the
    // broadcast↔shuffle-hash crossover (DefaultFrontierBroadcastLimit
    // = 65536). The number to watch is sec_per_kq flatness in the
    // shuffle regime — per-query cost must not grow with |Q|, which is
    // what validates the default instead of asserting it.
    val sIdx = buildShard(vecsAll)
    def qBatch(nQ: Long) = spark.range(nQ)
      .select((col("id") + 10000000L).as("vec_id"),
        expr("transform(sequence(1, 32), j -> " +
          "cast(pmod(xxhash64(id * 37 + j), 1000) / 500.0 - 1.0 " +
          "as float))").as("embedding"))
      .localCheckpoint()
    val servePts = Seq(4096L, 65536L, 262144L).map { nQ =>
      val qb = qBatch(nQ)
      def serve() = sink(graft.ops.GraphAnn.queryHnswIndex(qb, sIdx,
        k = 5, beam = 3, hops = 2, upperBeam = 1, upperHops = 2))
      serve() // warmup
      val (s1, _) = time(serve())
      val regime = if (nQ <= 65536L) "broadcast" else "shuffle_hash"
      f""""q$nQ":{"sec":$s1%.2f,"sec_per_kq":${s1 * 1000.0 / nQ}%.3f,"regime":"$regime"}"""
    }
    val serveJson = s""""serve_regime":{${servePts.mkString(",")}}"""

    // Bucketed-vs-plain graph serving, measured in SHUFFLE-READ BYTES
    // (the n53 claim, previously only plan-pinned): a fixed query
    // batch in the shuffle-hash regime against two corpus sizes. The
    // bucketed layout's exchanged bytes must stay ~flat as the corpus
    // grows (only the frontier exchanges — the corpus scans arrive
    // pre-partitioned), while the plain layout re-exchanges nodes per
    // hop join, so its bytes grow with the corpus. |Q| is kept SMALL
    // (forced shuffle regime) so the corpus-side exchange is the
    // signal: a first measurement at |Q|=131k drowned the corpus term
    // under ~650 MB of query-side frontier bytes common to both
    // layouts (bytes_ratio 0.95-0.99) — the claim is about the
    // corpus side, so the measurement must let it dominate, exactly
    // the regime a 100 TB corpus with bounded query batches lives in.
    val bktPts = Seq(1, 4).map { kMult =>
      val nB = nv * kMult
      val corpusB = spark.range(nB).select(col("id").as("vec_id"),
        expr("transform(sequence(1, 32), j -> " +
          "cast(pmod(xxhash64(id * 31 + j), 1000) / 500.0 - 1.0 " +
          "as float))").as("embedding")).localCheckpoint()
      val gIdx = graft.ops.GraphAnn.buildGraphIndex(corpusB,
        nlist = math.max(16, (nB / 64).toInt), degree = 6,
        crossDegree = 2)
      val dP = s"/tmp/graft-opsscale-graph-plain-$kMult"
      val dB = s"/tmp/graft-opsscale-graph-bkt-$kMult"
      graft.ops.GraphAnn.saveGraphIndex(gIdx, dP)
      graft.ops.GraphAnn.saveGraphIndexBucketed(gIdx, dB,
        s"opsscale_graph_x$kMult", buckets = 32)
      val lP = graft.ops.GraphAnn.loadGraphIndex(spark, dP)
      val lB = graft.ops.GraphAnn.loadGraphIndexBucketed(spark, dB,
        s"opsscale_graph_x$kMult")
      val qb = qBatch(8192L)
      def serveOn(i: graft.ops.GraphAnn.GraphIndex) = sink(
        graft.ops.GraphAnn.queryGraphIndex(qb, i, k = 5, beam = 3,
          hops = 2, broadcastFrontier = Some(false)))
      serveOn(lB); serveOn(lP) // warm BOTH plan families off the clock
      val (wP, sbP) = shufTime(serveOn(lP))
      val (wB, sbB) = shufTime(serveOn(lB))
      f""""x$kMult":{"n_corpus":$nB,"plain_sec":$wP%.2f,"bucketed_sec":$wB%.2f,"plain_shuffle_bytes":$sbP,"bucketed_shuffle_bytes":$sbB,"bytes_ratio":${sbB.toDouble / sbP}%.3f}"""
    }
    val bktJson = s""""graph_bucketed":{${bktPts.mkString(",")}}"""

    // Cell-partitioned IVF-PQ serving layout (n52): the same pruned
    // serve over the plain vs the partitioned on-disk layout — the
    // bytes ratio is the layout's reason to exist. Measured in the
    // regime the layout serves: probed fraction << 1 (a small query
    // batch against many well-filled inverted lists — at 100 TB this
    // is any online serve or decontamination screen; a batch probing
    // MOST cells should use the plain layout and a full scan). Bytes
    // adjudicate, wall at this corpus is file-count bound — the
    // substr_index discipline.
    val pqNlist = math.max(16, (nv / 512).toInt)
    val pqIdx = graft.ops.Similarity.buildIvfPqIndex(vecsAll,
      nlist = pqNlist, m = 8, ks = 16, dim = 32,
      centroids = Some(graft.ops.Similarity.firstVectors(vecsAll,
        pqNlist)))
    val dirPlainPq = "/tmp/graft-opsscale-ivfpq-plain"
    val dirPartPq = "/tmp/graft-opsscale-ivfpq-part"
    graft.ops.Similarity.saveIvfPqIndex(pqIdx, dirPlainPq)
    graft.ops.Similarity.saveIvfPqIndexPartitioned(pqIdx, dirPartPq)
    val qPq = qBatch(4L)
    def servePq(d: String) = sink(graft.ops.Similarity
      .queryIvfPqIndexPruned(qPq,
        graft.ops.Similarity.loadIvfPqIndex(spark, d), k = 5,
        nprobe = 4))
    // warm BOTH paths: file-listing caches and codegen are
    // plan-specific, so warming only one would bias its wall number
    servePq(dirPartPq); servePq(dirPlainPq)
    val (_, sPqPlain, _, bPqPlain) = cpuTime(servePq(dirPlainPq))
    val (_, sPqPart, _, bPqPart) = cpuTime(servePq(dirPartPq))
    // the analytic bound the bytes ratio converges to as inverted
    // lists grow past the parquet per-file floor: distinct probed
    // cells / nlist
    val probedFrac = qPq.select(explode(graft.functions.Centroids
        .centroidProbes(col("embedding"), pqIdx.cells, 4)).as("cell"))
      .distinct().count().toDouble / pqNlist
    val pqPartJson = f""""ivfpq_partitioned":{"nlist":$pqNlist,"n_queries":4,"nprobe":4,"probed_frac":$probedFrac%.3f,"serve_plain_sec":$sPqPlain%.2f,"serve_part_sec":$sPqPart%.2f,"serve_plain_bytes":$bPqPlain,"serve_part_bytes":$bPqPart,"part_bytes_ratio":${bPqPart.toDouble / bPqPlain}%.3f}"""

    // The same layout comparison at PRODUCTION list size (10× rows per
    // list, same cells/codebook/queries so probed_frac is identical):
    // at bench scale the lists are a few KB and the bytes ratio sits
    // on the parquet per-file floor; with 10× rows per list the ratio
    // should move toward probed_frac, pinning the curve's direction.
    val vecsBig = spark.range(nv * 10L).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 32), j -> " +
        "cast(pmod(xxhash64(id * 31 + j), 1000) / 500.0 - 1.0 " +
        "as float))").as("embedding")).localCheckpoint()
    val pqIdxBig = graft.ops.Similarity.buildIvfPqIndex(vecsBig,
      nlist = pqNlist, m = 8, ks = 16, dim = 32,
      centroids = Some(pqIdx.cells), codebook = Some(pqIdx.codebook))
    val dirPlainPqB = "/tmp/graft-opsscale-ivfpq-plain-10x"
    val dirPartPqB = "/tmp/graft-opsscale-ivfpq-part-10x"
    graft.ops.Similarity.saveIvfPqIndex(pqIdxBig, dirPlainPqB)
    graft.ops.Similarity.saveIvfPqIndexPartitioned(pqIdxBig, dirPartPqB)
    servePq(dirPartPqB); servePq(dirPlainPqB)
    val (_, sPqPlainB, _, bPqPlainB) = cpuTime(servePq(dirPlainPqB))
    val (_, sPqPartB, _, bPqPartB) = cpuTime(servePq(dirPartPqB))
    val pqPartBigJson = f""""ivfpq_partitioned_10x":{"nlist":$pqNlist,"rows_per_list":${nv * 10L / pqNlist},"n_queries":4,"nprobe":4,"probed_frac":$probedFrac%.3f,"serve_plain_sec":$sPqPlainB%.2f,"serve_part_sec":$sPqPartB%.2f,"serve_plain_bytes":$bPqPlainB,"serve_part_bytes":$bPqPartB,"part_bytes_ratio":${bPqPartB.toDouble / bPqPlainB}%.3f}"""

    // Scatter-gather serve over UNMERGED spatial shards (n56): the
    // serve-without-merge half of the sharded recipe, measured in the
    // regime routing exists for — a query batch whose probed cells
    // live in ONE shard's range. merged_sec is the one-index serve
    // baseline; scatter_sec fans out to all shards (per-shard top-k +
    // the bounded gather — on one host this adds per-shard plan
    // overhead, on a cluster the shards run on disjoint resources);
    // routed_sec serves ONLY the touched shards, so its win over
    // scatter_sec is the shard-skip (shards_served of n_shards), the
    // local stand-in for touching nprobe/nlist of a 100 TB fleet.
    val scNShards = 4
    val scMap = graft.ops.Similarity.shardCellMap(vecsBig, pqIdx.cells,
      scNShards)
    val scSharded = graft.ops.Similarity.shardByCells(vecsBig,
      pqIdx.cells, scNShards).localCheckpoint()
    val scShards = (0 until scNShards).map(i =>
      graft.ops.Similarity.buildIvfPqIndex(
        scSharded.filter(col("shard") === i).drop("shard"),
        nlist = pqNlist, m = 8, ks = 16, dim = 32,
        centroids = Some(pqIdx.cells), codebook = Some(pqIdx.codebook)))
      .map(ix => ix.copy(codes = ix.codes.localCheckpoint()))
    val scMerged = scShards.reduce(graft.ops.Similarity.mergeIvfPqIndexes)
    // home-cell query batch of shard 0 (nprobe=1: probes == home cells,
    // so the router provably confines the serve to one shard)
    val scQ = scSharded.filter(col("shard") === 0).drop("shard")
      .orderBy("vec_id").limit(64)
      .select(col("vec_id") + 20000000L as "vec_id", col("embedding"))
      .localCheckpoint()
    def scServe(f: => org.apache.spark.sql.DataFrame): Long = sink(f)
    def scRun(f: => org.apache.spark.sql.DataFrame): Double = {
      scServe(f) // warmup: plan family + codegen off the clock
      val (t, _) = time(scServe(f))
      t
    }
    val scMergedSec = scRun(graft.ops.Similarity.queryIvfPqIndex(scQ,
      scMerged, k = 5, nprobe = 1))
    val scScatterSec = scRun(graft.ops.Similarity.queryIvfPqIndexScatter(
      scQ, scShards, k = 5, nprobe = 1))
    val scRoutedSec = scRun(graft.ops.Similarity.queryIvfPqIndexScatter(
      scQ, scShards, k = 5, nprobe = 1, cellShardMap = Some(scMap)))
    val scTouched = scQ.select(graft.functions.Centroids
        .centroidAssign(col("embedding"), pqIdx.cells).as("cell"))
      .distinct().collect().map(r => scMap(r.getInt(0) - 1)).toSet.size
    val scatterJson = f""""scatter_serve":{"n_corpus":${nv * 10L},"n_shards":$scNShards,"n_queries":64,"nprobe":1,"merged_sec":$scMergedSec%.2f,"scatter_sec":$scScatterSec%.2f,"routed_sec":$scRoutedSec%.2f,"shards_served_routed":$scTouched,"routed_vs_scatter":${scRoutedSec / scScatterSec}%.2f}"""

    // The same routed scatter against PERSISTED cell-partitioned
    // shards — the full at-rest serving story: untouched shards are
    // never planned (no scan exists for them) and the touched shard's
    // scan partition-prunes to the probed cell directories, so the
    // bytes actually read should track touched_shard_bytes ·
    // probed_frac, a sliver of the fleet's resident state. read_frac
    // is the measured input bytes over the TOTAL persisted code bytes
    // of all shards; the analytic envelope alongside it is what the
    // layout promises at any corpus size.
    val scDirs = (0 until scNShards).map(i =>
      s"/tmp/graft-opsscale-scatter-shard$i")
    scShards.zipWithIndex.foreach { case (ix, i) =>
      graft.ops.Similarity.saveIvfPqIndexPartitioned(ix, scDirs(i)) }
    val scLoaded = scDirs.map(d =>
      graft.ops.Similarity.loadIvfPqIndex(spark, d))
    def scPersServe() = sink(graft.ops.Similarity.queryIvfPqIndexScatter(
      scQ, scLoaded, k = 5, nprobe = 1, cellShardMap = Some(scMap)))
    scPersServe() // warmup: file listing + codegen off the clock
    val (_, scPersSec, _, scPersBytes) = cpuTime(scPersServe())
    val hconf = spark.sparkContext.hadoopConfiguration
    val scTotalBytes = scDirs.map { d =>
      val p = new org.apache.hadoop.fs.Path(s"$d/codes")
      p.getFileSystem(hconf).getContentSummary(p).getLength
    }.sum
    val scProbedFrac = scQ.select(graft.functions.Centroids
        .centroidAssign(col("embedding"), pqIdx.cells).as("cell"))
      .distinct().count().toDouble / pqNlist
    val scPersJson = f""""scatter_persisted":{"n_shards":$scNShards,"shards_touched":$scTouched,"probed_frac":$scProbedFrac%.4f,"serve_sec":$scPersSec%.2f,"persisted_code_bytes":$scTotalBytes,"read_bytes":$scPersBytes,"read_frac":${scPersBytes.toDouble / scTotalBytes}%.4f,"analytic_frac":${scTouched.toDouble / scNShards * scProbedFrac}%.4f}"""

    spark.sparkContext.removeSparkListener(meterListener)
    println(s"""{"metric":"ops_scale","docs_1x":$n1,"mult":$mult,"substr_total_chars":$totalChars,"substr_survivors":{$survJson},$substrIdxJson,$scaleJson,$pruneJson,$mergeJson,$mergeSpatialJson,$rebalJson,$serveJson,$bktJson,$pqPartJson,$pqPartBigJson,$scatterJson,$scPersJson,${parts.mkString(",")}}""")
    spark.stop()
  }
}
