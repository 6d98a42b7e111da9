package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The full STREAMING near-dup loop over the d33 MinHash index: each
  * micro-batch is screened against the index-so-far (the d13
  * asymmetric join — only batch-touching buckets expand), then
  * appended to it. Two invariants make micro-batch boundaries
  * invisible:
  *  - state: the rolled index after all batches equals the one-shot
  *    build over the whole corpus, signature-for-signature (signatures
  *    are row-independent, append is union);
  *  - answers: every near-dup pair surfaces exactly when its LATER
  *    side arrives (same-batch pairs surface in that batch), so the
  *    union of per-batch emissions equals the one-shot [[Dedup
  *    .minhashLsh]] pair set over the whole corpus.
  */
class StreamingMinHashSpec extends SparkSpec {

  case class Doc(doc_id: Long, text: String)

  test("screen-then-append loop: rolled state == one-shot build; pair union == batch LSH") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = Seq(
      Doc(1L, "the quick brown fox jumps over the lazy dog"),
      Doc(2L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      Doc(3L, "the quick brown fox jumps over the lazy cat"), // near dup
      Doc(4L, "completely different content about spark engines at scale"),
      Doc(5L, "the quick brown fox jumps over the lazy dog"), // dup of 1,2
      Doc(6L, "unrelated closing document with its own words entirely"))

    // start from an empty signed corpus: an index built over zero docs
    var idx = Dedup.buildMinHashIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", "doc_id")
    val pairs = scala.collection.mutable.Set.empty[(Long, Long)]
    val input = MemoryStream[Doc]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        pairs ++= Dedup.queryMinHashIndex(idx, b, "text", "doc_id",
            threshold = 0.4)
          .select("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        idx = Dedup.appendToMinHashIndex(idx, b, "text", "doc_id")
        ()
      }
      .start()
    input.addData(docs(0), docs(1)) // 1-2 dup pair inside one batch
    q.processAllAvailable()
    input.addData(docs(2), docs(3)) // 3 near-dups 1 and 2 across batches
    q.processAllAvailable()
    input.addData(docs(4), docs(5)) // 5 dups 1, 2 across batches
    q.processAllAvailable()
    q.stop()

    // rolled state equals the one-shot build, signature-for-signature
    val all = docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val oneShot = Dedup.buildMinHashIndex(all, "text", "doc_id")
    def sigSet(i: Dedup.MinHashIndex) = i.sigs.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    sigSet(idx) shouldBe sigSet(oneShot)

    // pair union equals the one-shot LSH over the whole corpus
    val batchPairs = Dedup.minhashLsh(all, "text", "doc_id",
        threshold = 0.4)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.toSet shouldBe batchPairs
    // sanity on the fixture: the dup triangle surfaced across batches
    pairs should contain allOf ((1L, 2L), (1L, 5L), (2L, 5L))
  }
}
