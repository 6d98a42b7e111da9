package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: point-in-interval joins WITHOUT an equi key.
  *
  * A bare `f.ts BETWEEN d.start AND d.end` join has no equi conjunct, so
  * Catalyst's only plans are BroadcastNestedLoopJoin (dies when the dim
  * outgrows memory) or a cartesian product (dies always at scale). The
  * standard fix is to manufacture the equi key: quantize time into
  * fixed-width bins, explode each dim interval onto every bin it
  * overlaps, map each fact row to its single bin, hash-join on the bin,
  * and re-check the exact predicate as a post-join filter.
  *
  * Cost model: dim explodes ×(interval/binWidth + 1); fact stays 1:1.
  * Pick binWidth near the median interval length — wider bins mean fewer
  * dim replicas but more false candidate pairs for the residual filter,
  * narrower the reverse. Both sides shuffle once, on uniformly
  * distributed bin ids (time bins are only skewed if event time itself
  * is — then AQE skew-split applies).
  */
object RangeJoin {

  /** Join rows of `fact` to every `dim` interval containing `factTs`
    * (inclusive bounds, SQL BETWEEN semantics).
    *
    * Column-name based: `fact` and `dim` must not share column names
    * (rename beforehand — same contract as USING joins).
    */
  def binnedRangeJoin(fact: DataFrame, dim: DataFrame,
                      factTsCol: String, startCol: String, endCol: String,
                      binWidthSeconds: Long,
                      joinType: String = "inner"): DataFrame = {
    require(binWidthSeconds > 0, "binWidthSeconds must be positive")
    val overlap = fact.columns.toSet intersect dim.columns.toSet
    require(overlap.isEmpty, s"fact and dim share column names: $overlap")
    val bw = binWidthSeconds * 1000000L
    val f = fact.withColumn("__bin",
      expr(s"unix_micros($factTsCol) div ${bw}L"))
    val d = dim.withColumn("__bin",
      explode(sequence(expr(s"unix_micros($startCol) div ${bw}L"),
        expr(s"unix_micros($endCol) div ${bw}L"))))
    f.join(d, Seq("__bin"), joinType)
      .filter(col(factTsCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }
}
