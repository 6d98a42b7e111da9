package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static decontamination for document-ingestion pipelines:
  * drop (or flag) arriving documents that match a STATIC eval
  * benchmark — the streaming counterpart of `ops/Curation`'s
  * decontaminate / fuzzyDecontaminate batch passes. Decontamination is
  * per-document against a fixed reference set, so it needs NO
  * cross-batch state — which picks the two shapes here:
  *
  *  - [[exactStream]] runs fully inside the streaming plan: a
  *    STATELESS stream-static left-anti join on the content
  *    fingerprint, benchmark side broadcast. Every micro-batch pays a
  *    map-side probe per document, nothing accumulates.
  *  - [[fuzzyBatch]] is the `foreachBatch` kernel (the dynamic-table
  *    refresh idiom used throughout this streaming tier): each
  *    micro-batch runs the BATCH MinHash pass against the static
  *    benchmark — the asymmetric broadcast plan (eval bands broadcast,
  *    batch rows join map-side) is already the per-batch-optimal
  *    shape, and reusing it keeps streaming and batch decontamination
  *    one implementation with one gate (d19).
  */
object StreamingDecontaminate {

  /** Stateless streaming exact decontamination: arriving docs whose
    * normalized-text fingerprint appears in the static eval set are
    * dropped inside the streaming plan (no foreachBatch, no state
    * store). `eval` must be a static (batch) DataFrame; its distinct
    * fingerprint set broadcasts.
    */
  def exactStream(docs: DataFrame, textCol: String,
                  eval: DataFrame, evalTextCol: String): DataFrame = {
    val fps = broadcast(
      eval.select(graft.ops.TextOps.fingerprint(col(evalTextCol)).as("__fp"))
        .distinct())
    docs.join(fps,
      graft.ops.TextOps.fingerprint(docs(textCol)) === fps("__fp"),
      "left_anti")
  }

  /** The fuzzy per-micro-batch kernel for
    * `writeStream.foreachBatch((b, _) => fuzzyBatch(b, ...) ...)`:
    * exactly the batch [[graft.ops.Curation.fuzzyDecontaminate]]
    * against the static benchmark. Kept as a named kernel (the
    * StreamingScd2 pattern) so the streaming spec and any production
    * caller drive the same code path the d19 oracle gates.
    */
  def fuzzyBatch(batch: DataFrame, textCol: String, idCol: String,
                 eval: DataFrame, k: Int = 64, bands: Int = 16,
                 threshold: Double = 0.7, shingleN: Int = 3,
                 seed: Long = 42L): DataFrame =
    graft.ops.Curation.fuzzyDecontaminate(batch, eval, textCol, idCol,
      k, bands, threshold, shingleN, seed)
}
