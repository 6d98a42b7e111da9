package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import graft.engine.TemporalJoin

/** Temporal dimension lookup on a STREAMING fact: the production shape
  * of the reference's signature operator (fact.ts BETWEEN dim.effective
  * AND dim.end) when facts arrive continuously and the SCD2 dimension
  * is a slowly-refreshed table.
  *
  * Structured Streaming executes stream-static joins per micro-batch
  * with the static side re-read (or broadcast) each batch, so a
  * dimension refresh between batches is picked up automatically — the
  * dynamic-table semantics of the reference without its scheduler. The
  * join itself is the SAME TemporalJoin kernel as batch: equi conjunct
  * drives the shuffle/broadcast, the BETWEEN is a post-join filter.
  *
  * Constraint (Spark rule, documented here because callers hit it):
  * stream-static joins must be inner or left-outer with the stream on
  * the left; the kernel's require mirrors that.
  */
object StreamingTemporalJoin {

  def temporalJoinStream(factStream: DataFrame, dim: DataFrame,
                         factKey: Column, dimKey: Column, factTs: Column,
                         joinType: String = "inner"): DataFrame = {
    require(factStream.isStreaming, "factStream must be a streaming DataFrame")
    require(!dim.isStreaming, "dim must be a static (batch) DataFrame")
    require(joinType == "inner" || joinType == "left",
      s"stream-static temporal join supports inner/left only (got $joinType)")
    TemporalJoin.temporalJoin(factStream, dim, factKey, dimKey, factTs, joinType)
  }
}
