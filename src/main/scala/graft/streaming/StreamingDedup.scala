package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming exact deduplication for document-ingestion pipelines:
  * keep the first document per content fingerprint, drop the rest —
  * the streaming counterpart of `ops/Dedup.exact` (which groups the
  * whole corpus in batch).
  *
  * Scale shape: the fingerprint is the shuffle key (uniform md5 — no
  * skew), state is one tiny record per distinct document, partitioned
  * across executors exactly like the batch groupBy. Two variants with
  * different state-retention contracts:
  *
  *  - [[dedupWithinWatermark]]: built-in
  *    `dropDuplicatesWithinWatermark` — state bounded by the watermark
  *    horizon, so duplicates arriving further apart than the horizon
  *    are NOT caught. Right when duplicate arrivals cluster in time
  *    (re-crawls, retry storms) and state must stay bounded.
  *  - [[dedupStream]]: `flatMapGroupsWithState` first-wins — exact
  *    global dedup; state grows with the distinct corpus (one boolean
  *    + timestamp per fingerprint), the unavoidable cost of exactness.
  */
object StreamingDedup {

  /** A document on the ingest stream. */
  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** Content fingerprint matching TextOps.fingerprint's normalization
    * (lowercase, collapse whitespace, trim, md5).
    */
  private[streaming] def fingerprint(text: String): String = {
    val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** Bounded-state dedup over any DataFrame with an event-time column:
    * documents whose normalized-text fingerprint was already seen
    * within the watermark horizon are dropped.
    */
  def dedupWithinWatermark(docs: DataFrame, eventTimeCol: String,
                           textCol: String, horizon: String): DataFrame =
    docs
      .withColumn("__fp", md5(trim(regexp_replace(lower(col(textCol)), "\\s+", " "))))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Exact first-wins dedup over a typed document stream: emits a
    * document iff its fingerprint has not been seen before (ties within
    * a micro-batch resolve to the earliest ts, then lowest doc_id).
    */
  def dedupStream(docs: Dataset[Doc]): Dataset[Doc] = {
    implicit val docEnc: Encoder[Doc] = Encoders.product[Doc]
    implicit val seenEnc: Encoder[Timestamp] = Encoders.TIMESTAMP
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    docs
      .groupByKey(d => fingerprint(d.text))
      .flatMapGroupsWithState[Timestamp, Doc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Doc], state: GroupState[Timestamp]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.toSeq.minBy(d => (d.ts.getTime, d.doc_id))
            state.update(first.ts)
            Iterator.single(first)
          }
      }
  }
}
