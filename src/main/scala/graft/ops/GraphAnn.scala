package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Centroids, TopK}

/** Distributed graph-based ANN — the HNSW/Vamana regime (high recall
  * at a small candidate budget) re-expressed for a partitioned engine.
  *
  * Single-node HNSW is a pointer-chasing structure served by one
  * process; neither the build (global greedy insertions) nor the serve
  * (sequential best-first walk) maps onto a shuffle-based engine. What
  * DOES map is the two ideas that give graph indexes their recall:
  *  - a navigable neighborhood graph: every vector keeps edges to its
  *    `degree` nearest peers, so similarity "flows" — walking from any
  *    entry point reaches a query's true neighbors in a few hops;
  *  - beam search: expand the current best `beam` nodes' edges, score,
  *    keep the best `beam` again — candidates stay bounded while the
  *    walk homes in.
  * This module builds the graph as a plain DataFrame (`n_id, emb,
  * neighbors array<long>`) and serves queries with a BATCHED beam
  * search: all queries advance one hop per round, each hop being one
  * broadcast join + one bounded-heap aggregate. No pointer chasing, no
  * per-query driver loop — the per-hop work for the whole query batch
  * is a single Spark job.
  *
  * Build shape (the Vamana-merge idea, DataFrame-native): a coarse
  * codebook partitions the corpus into cells; intra-cell edges come
  * from a WITHIN-CELL top-`degree` self-join (cost Σ n_c² = n · n_c,
  * bounded by the cell size the codebook is trained for — never
  * all-pairs); cross-cell edges link every node to its top
  * `crossDegree` peers in its SECOND-closest cell, which is what makes
  * the merged graph navigable ACROSS the partition boundary (a beam
  * started in the wrong cell can cross over). The built node table is
  * localCheckpointed: build once, query many.
  *
  * Serve shape: the corpus-sized node table is NEVER exchanged. Each
  * hop broadcast-joins the (|Q|·beam)-row frontier against the node
  * table twice — once for adjacency, once for candidate embeddings —
  * and reduces with the bounded-heap [[graft.functions.TopKAggregate]]
  * (the n24 serving aggregate), whose shuffle carries at most
  * beam/k pairs per (query, task). Per-query candidate budget is
  * entryProbes + hops · beam · (degree + crossDegree), independent of
  * corpus size. GraphAnnSpec pins the no-exchange serve plan;
  * gates n29/n31 pin saturated-config exactness vs [[Similarity
  * .bruteForceTopK]] and recall-vs-IVF at matched budget.
  */
object GraphAnn {

  /** A built graph index.
    *
    * @param nodes   n_id, emb (array, as loaded), neighbors
    *                (array<long>, best-first) — localCheckpointed
    * @param entries per-cell entry nodes: cell, entry_id
    *                (nlist · entriesPerCell rows)
    * @param cells   the coarse codebook used for routing
    */
  case class GraphIndex(nodes: DataFrame, entries: DataFrame,
                        cells: Array[Array[Double]])

  private def dot(x: org.apache.spark.sql.Column,
                  y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), _ + _)

  /** Build the neighborhood graph.
    *
    * @param corpus      vec_id, embedding
    * @param nlist       coarse cells (train so cells stay bounded —
    *                    n_c ≈ n / nlist drives the build's n·n_c cost)
    * @param degree      intra-cell out-degree
    * @param crossDegree out-degree into the second-closest cell
    * @param centroids   trained coarse codebook
    *                    ([[KMeans.trainCentroidsDistributed]] — the
    *                    production path); None = the deterministic
    *                    first-nlist scheme every n-gate replays
    */
  def buildGraphIndex(corpus: DataFrame, nlist: Int = 16, degree: Int = 8,
                      crossDegree: Int = 2,
                      centroids: Option[Array[Array[Double]]] = None,
                      entriesPerCell: Int = 4): GraphIndex = {
    require(degree >= 1, s"degree must be >= 1, got $degree")
    require(crossDegree >= 0, s"crossDegree must be >= 0, got $crossDegree")
    require(entriesPerCell >= 1,
      s"entriesPerCell must be >= 1, got $entriesPerCell")
    val cells = centroids.getOrElse(Similarity.firstVectors(corpus, nlist))
    val c = corpus.select(col("vec_id").as("n_id"),
      col("embedding").as("emb"),
      Centroids.centroidAssign(col("embedding"), cells).as("cell"))
    val peers = c.select(col("cell"), col("n_id").as("m_id"),
      col("emb").as("m_emb"))
    def scoredEdges(side: DataFrame, d: Int): DataFrame =
      side.join(peers, Seq("cell")).filter(col("n_id") =!= col("m_id"))
        .withColumn("sim", Similarity.cosine(col("emb"), col("m_emb")))
        .groupBy("n_id").agg(TopK.topK(col("sim"), col("m_id"), d).as("top"))
        .select(col("n_id"), explode(col("top")).as("e"))
        .select(col("n_id"), col("e.id").as("m_id"), col("e.score").as("sim"))
    val intra = scoredEdges(c, degree)
    val edges =
      if (crossDegree == 0) intra
      else {
        // route each node to its SECOND-closest cell for cross-links;
        // members of that cell live in a different home cell, so the
        // edge crosses the partition boundary by construction
        val second = c.select(col("n_id"), col("emb"),
          Centroids.centroidProbes(col("emb"), cells, 2).getItem(1)
            .as("cell"))
        intra.unionByName(scoredEdges(second, crossDegree))
      }
    val nbrs = edges.groupBy("n_id")
      .agg(TopK.topK(col("sim"), col("m_id"), degree + crossDegree).as("top"))
      .select(col("n_id"), col("top.id").as("neighbors"))
    val nodes = c.join(nbrs, Seq("n_id"))
      .select("n_id", "emb", "neighbors")
      .localCheckpoint()
    // entries per cell: `entriesPerCell` members in deterministic HASH
    // order, NOT the members closest to the centroid. A cell is often a
    // union of tight sub-clusters whose kNN edges never cross between
    // them (each member's `degree` nearest are its own sub-cluster) —
    // centroid-proximal entries would all come from the dominant
    // sub-cluster and a walk started there can never reach the others.
    // Hash-spread entries land one in each sizeable sub-cluster with
    // high probability — the flat-index substitute for HNSW's
    // long-range upper-layer links.
    val entries = c
      .groupBy("cell")
      .agg(TopK.topK(-abs(xxhash64(col("n_id"))).cast("double"),
        col("n_id"), entriesPerCell).as("top"))
      .select(col("cell"), explode(col("top.id")).as("entry_id"))
      .localCheckpoint()
    GraphIndex(nodes, entries, cells)
  }

  /** One scoring step: candidates (q_id, n_id) pick up their embedding
    * from the node table and their query vector from the broadcast
    * query side, and evaluate one fused cosine. Package-private so
    * GraphAnnSpec can pin this plan: both joins broadcast the SMALL
    * side — the node table itself never exchanges.
    */
  private[ops] def scoreCandidates(cand: DataFrame, nodes: DataFrame,
                                   q: DataFrame): DataFrame =
    broadcast(cand)
      .join(nodes.select(col("n_id"), col("emb")), Seq("n_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        Similarity.cosine(col("q_emb"), col("emb")).as("sim"))

  private def topPerQuery(scored: DataFrame, n: Int): DataFrame =
    scored.groupBy("q_id")
      .agg(TopK.topK(col("sim"), col("n_id"), n).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("n_id"))

  /** Batched beam search. Returns (q_id, n_id, rank, sim, n_visited) —
    * the [[Similarity.bruteForceTopK]] contract plus the per-query
    * candidate count, so budget-matched comparisons (gate n31) read
    * the actual budget off the result instead of trusting the formula.
    * Self-matches are excluded from results (every ANN path here does)
    * but still act as waypoints for the walk.
    *
    * Determinism: every selection is the bounded-heap aggregate's
    * (score desc, id asc) order; cosines are the fused exact
    * expression — the whole search replays bit-identically on any
    * layout.
    */
  def queryGraphIndex(queries: DataFrame, index: GraphIndex, k: Int,
                      beam: Int = 8, hops: Int = 3,
                      entryProbes: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(beam >= 1, s"beam must be >= 1, got $beam")
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"))
    val entryCand = q.select(col("q_id"),
        explode(Centroids.centroidProbes(col("q_emb"), index.cells,
          entryProbes)).as("cell"))
      .join(broadcast(index.entries), Seq("cell"))
      .select(col("q_id"), col("entry_id").as("n_id"))
      .distinct()
    // best-first, batched: each round expands the best `beam` scored-
    // but-unexpanded candidates per query (NOT just the newest hop's —
    // a strong find from an earlier round stays eligible, the property
    // that makes HNSW's ef-search converge), scores their out-edges,
    // and folds them into the candidate pool.
    var scored = scoreCandidates(entryCand, index.nodes, q).localCheckpoint()
    var expanded = scored.select("q_id", "n_id").limit(0).localCheckpoint()
    var h = 0
    while (h < hops) {
      val frontier = topPerQuery(
        scored.join(expanded, Seq("q_id", "n_id"), "left_anti"), beam)
        .localCheckpoint()
      expanded = expanded.unionByName(frontier).localCheckpoint()
      val cand = frontier
        .join(index.nodes.select(col("n_id"), col("neighbors")), Seq("n_id"))
        .select(col("q_id"), explode(col("neighbors")).as("n_id"))
        .distinct()
        .join(scored.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_anti")
      scored = scored
        .unionByName(scoreCandidates(cand, index.nodes, q))
        .localCheckpoint()
      h += 1
    }
    val nVisited = scored.groupBy("q_id")
      .agg(count(lit(1)).as("n_visited"))
    scored.filter(col("q_id") =!= col("n_id"))
      .groupBy("q_id")
      .agg(TopK.topK(col("sim"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.id").as("n_id"),
        (col("pos") + 1).cast("int").as("rank"), col("e.score").as("sim"))
      .join(nVisited, Seq("q_id"))
  }
}
