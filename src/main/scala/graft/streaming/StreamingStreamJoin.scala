package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream equi-join with an event-time range
  * constraint — the streaming analog of the temporal join for two LIVE
  * inputs (e.g. click facts joining purchase facts as both arrive).
  *
  * Spark buffers both sides in the state store; the join is only
  * scale-safe when BOTH streams carry watermarks AND the join condition
  * bounds how far apart matching events can be (here:
  * `right.ts ∈ [left.ts - lookback, left.ts + lookahead]`). That time
  * bound is what lets the state store evict rows once the watermark
  * passes — without it state grows forever. Shuffle is the usual hash
  * exchange on the equi key; state is partitioned the same way.
  */
object StreamingStreamJoin {

  /** Inner-join two streams on `key` where the right event's time lies
    * within `[left.ts - lookback, left.ts + lookahead]`.
    *
    * Column names must be disjoint apart from `key` (same contract as
    * USING joins); `leftTs`/`rightTs` name each side's event-time
    * column. `horizon` sets both watermarks.
    */
  def joinWithinInterval(left: DataFrame, right: DataFrame, key: String,
                         leftTs: String, rightTs: String,
                         lookback: String, lookahead: String,
                         horizon: String): DataFrame = {
    val l = left.withWatermark(leftTs, horizon)
    val r = right.withWatermark(rightTs, horizon)
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) >= col(leftTs) - expr(s"interval $lookback") &&
        col(rightTs) <= col(leftTs) + expr(s"interval $lookahead"))
      .drop(r(key))
  }
}
