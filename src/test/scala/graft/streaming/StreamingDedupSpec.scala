package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkSpec {
  import StreamingDedup._

  test("first-wins dedup across micro-batches; normalization-equal texts collapse") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Doc]
    val q = dedupStream(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two distinct docs + an intra-batch duplicate (later ts loses)
    input.addData(
      Doc(1L, ts("2020-01-01 00:00:00"), "Hello  World"),
      Doc(2L, ts("2020-01-01 00:00:05"), "hello world"), // same normalized
      Doc(3L, ts("2020-01-01 00:00:01"), "something else"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate + one genuinely new doc
    input.addData(
      Doc(4L, ts("2020-01-02 00:00:00"), " HELLO   world "),
      Doc(5L, ts("2020-01-02 00:00:01"), "brand new"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").as[Doc].collect().sortBy(_.doc_id)
    out.map(_.doc_id).toSeq shouldBe Seq(1L, 3L, 5L)
  }

  test("watermarked dedup drops in-horizon duplicates") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Doc]
    val deduped = dedupWithinWatermark(
      input.toDF(), eventTimeCol = "ts", textCol = "text", horizon = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("wm_out")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Doc(1L, ts("2020-01-01 10:00:00"), "alpha beta"),
      Doc(2L, ts("2020-01-01 10:10:00"), "Alpha  Beta"), // dup within horizon
      Doc(3L, ts("2020-01-01 10:20:00"), "gamma"))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("wm_out").select("doc_id").as[Long].collect().sorted
    ids.toSeq shouldBe Seq(1L, 3L)
  }

  test("span dedup composes with streaming arrival: foreachBatch replay == batch") {
    // the d16 incremental kernel driven by the PRODUCTION arrival path:
    // docs arrive as micro-batches, foreachBatch rolls the gram-count
    // state forward and reworks dirty docs; the accumulated output must
    // equal one-shot dedupSpans over everything that ever arrived
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.ops.Dedup

    val spanG = (1 to 8).map(i => s"g$i").mkString(" ")
    val h = (1 to 8).map(i => s"h$i").mkString(" ")

    // mutable loop state, localCheckpoint'd per batch so lineage stays
    // bounded across micro-batches (the d13/d16 hygiene pattern)
    var corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
      .localCheckpoint()
    var stats = Dedup.spanGramStats(corpus, "text", "doc_id", l = 8)
      .localCheckpoint()
    var result = Dedup.dedupSpans(corpus, "text", "doc_id", l = 8)
      .localCheckpoint()

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        if (!b.isEmpty) {
          result = Dedup.dedupSpansIncremental(corpus, stats, result, b,
            "text", "doc_id", l = 8).localCheckpoint()
          stats = Dedup.mergeSpanGramStats(stats, b, "text", "doc_id",
            l = 8).localCheckpoint()
          corpus = corpus.unionByName(b).localCheckpoint()
        }
      }
      .outputMode(OutputMode.Update()).start()

    input.addData((1L, s"$spanG alpha beta gamma one"),
      (2L, "all unique tokens nothing shared here ok fine"))
    q.processAllAvailable()
    input.addData((3L, s"$h mid tokens other pad"))
    q.processAllAvailable()
    // batch 3 dirties docs from both earlier micro-batches
    input.addData((4L, s"$spanG $h tail pad two"))
    q.processAllAvailable()
    q.stop()

    val full = Dedup.dedupSpans(corpus, "text", "doc_id", l = 8)
    result.except(full).count() shouldBe 0L
    full.except(result).count() shouldBe 0L
    val m = result.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    m(1L).getAs[Int]("tokens_removed") shouldBe 8 // reworked on arrival of 4
    m(4L).getAs[Int]("tokens_removed") shouldBe 16
    m(2L).getAs[Int]("tokens_removed") shouldBe 0
  }

  test("PCA state composes with streaming arrival: rolled state == one-shot fit") {
    // the e03 mergeable-moments state driven by the production arrival
    // path: embedding batches arrive as micro-batches, foreachBatch
    // folds each batch's sufficient statistics into the rolling state;
    // after any number of batches, a fit from the rolled state must
    // equal a one-shot fit over everything that ever arrived.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.ops.Embeddings

    val dim = 6
    var corpus = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
      .localCheckpoint()
    var state = Embeddings.pcaState(corpus, "embedding", dim)
      .localCheckpoint()

    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        if (!b.isEmpty) {
          state = Embeddings.mergePcaState(state,
            Embeddings.pcaState(b, "embedding", dim)).localCheckpoint()
          corpus = corpus.unionByName(b).localCheckpoint()
        }
      }
      .outputMode(OutputMode.Update()).start()

    val r = new scala.util.Random(41)
    def vec() = Array.tabulate(dim)(d => (r.nextGaussian() / (d + 1)).toFloat)
    input.addData((1L, vec()), (2L, vec()), (3L, vec()))
    q.processAllAvailable()
    input.addData((4L, vec()), (5L, vec()))
    q.processAllAvailable()
    input.addData((6L, vec()))
    q.processAllAvailable()
    q.stop()

    val rolled = state.select("stats").head.getSeq[Double](0)
    val oneShot = Embeddings.pcaState(corpus, "embedding", dim)
      .select("stats").head.getSeq[Double](0)
    rolled.zip(oneShot).foreach { case (a, b) => a shouldBe b +- 1e-9 }
    val fromRolled = Embeddings.pcaFitFromState(state, dim, k = dim)
    val direct = Embeddings.pcaFit(corpus, "vec_id", "embedding", k = dim)
    fromRolled.eigenvalues.zip(direct.eigenvalues).foreach {
      case (a, b) => a shouldBe b +- 1e-9 }
  }

  test("DSIR model state composes with streaming arrival") {
    // the t17 incremental kernel on the production arrival path: each
    // micro-batch's bucket counts fold into the rolled state; scoring
    // the final batch against it must equal a from-scratch refit over
    // everything that ever arrived
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.ops.Curation
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col

    val tgt = col("doc_id") % 3 === 0
    var corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
      .localCheckpoint()
    var state: DataFrame = null
    var lastBatch: DataFrame = null

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        if (!b.isEmpty) {
          val bs = Curation.dsirState(b, "text", "doc_id", tgt)
          state = (if (state == null) bs
                   else Curation.mergeDsirState(state, bs)).localCheckpoint()
          corpus = corpus.unionByName(b).localCheckpoint()
          lastBatch = b
        }
      }
      .outputMode(OutputMode.Update()).start()

    input.addData((3L, "the cat"), (1L, "the cat"), (2L, "rare token"))
    q.processAllAvailable()
    input.addData((6L, "the dog"), (5L, "dog token here"))
    q.processAllAvailable()
    q.stop()

    val inc = Curation.dsirScoreWithState(state, lastBatch, "text",
        "doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("log_weight")).toMap
    val full = Curation.dsirWeights(corpus, "text", "doc_id", tgt)
      .filter(col("doc_id") === 6L || col("doc_id") === 5L).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("log_weight")).toMap
    inc.keySet shouldBe Set(5L, 6L)
    inc.foreach { case (id, lw) => lw shouldBe (full(id) +- 1e-9) }
  }
}
