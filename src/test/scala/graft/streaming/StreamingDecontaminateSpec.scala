package graft.streaming

import graft.SparkSpec
import graft.ops.SuffixArray
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Screening a STREAM of crawl batches against a static substring
  * index — the d29/d32 production loop as a streaming job: the
  * benchmark suite is indexed once, each micro-batch refines against
  * the frozen dictionaries inside `foreachBatch` (the screen is a
  * multi-join refinement, so it runs as a per-batch batch query —
  * exactly the incremental-dedup streaming discipline), and the union
  * of per-batch spans must equal screening the whole stream at once.
  * Micro-batch boundaries cannot change answers: each document's
  * spans depend only on its own text and the frozen index.
  */
class StreamingDecontaminateSpec extends SparkSpec {

  case class Doc(doc_id: Long, text: String)

  test("per-micro-batch screening equals the one-shot batch screen") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val leak = "this exact benchmark sentence leaked into the training set"
    val evalDocs = Seq(
      (0L, s"question about $leak indeed"),
      (1L, "an unrelated benchmark prompt with unique words")).toDF("doc_id", "text")
    val idx = SuffixArray.buildSubstrIndex(evalDocs, "text", "doc_id",
      minLen = 20, maxDocLen = 200)
    val crawl = Seq(
      Doc(0L, s"prefix text $leak suffix text"), // id collides with eval 0
      Doc(1L, "clean crawl document with nothing shared"),
      Doc(2L, s"another capture of $leak here"),
      Doc(3L, "zzrepeatedblockzz filler zzrepeatedblockzz"), // self-repeat only
      Doc(4L, s"$leak"))

    val got = scala.collection.mutable.Set.empty[(Long, Int, Int, Int)]
    val input = MemoryStream[Doc]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got ++= SuffixArray.substrIndexContamination(idx, batch, "text",
            "doc_id")
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        ()
      }
      .start()
    input.addData(crawl(0), crawl(1))
    q.processAllAvailable()
    input.addData(crawl(2))
    q.processAllAvailable()
    input.addData(crawl(3), crawl(4))
    q.processAllAvailable()
    q.stop()

    val batchAnswer = SuffixArray.substrIndexContamination(idx,
        crawl.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    got.toSet shouldBe batchAnswer
    // the leak really is caught (docs 0, 2, 4), the clean and
    // self-repeating docs stay unmarked
    got.map(_._1).toSet shouldBe Set(0L, 2L, 4L)
  }
}
