package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retrieval metrics against hand-computed values: graded nDCG, first-
  * relevant MRR, zero-scoring for queries whose judgments were all
  * missed, and the never-drop-a-judged-query rule.
  */
class RetrievalMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("recall/MRR/nDCG match hand computation on a graded fixture") {
    // q1: results 10,11,12; judged rel(11)=2, rel(12)=1, rel(99)=2 (missed)
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("q_id", "n_id", "rank")
    val qrels = Seq((1L, 11L, 2.0), (1L, 12L, 1.0), (1L, 99L, 2.0))
      .toDF("q_id", "n_id", "rel")
    val m = Similarity.retrievalMetrics(ranked, qrels, 3).head()
    m.getAs[Long]("n_rel") shouldBe 3L
    m.getAs[Long]("n_rel_ret") shouldBe 2L
    m.getAs[Double]("recall") shouldBe (2.0 / 3.0) +- 1e-12
    m.getAs[Double]("mrr") shouldBe 0.5 +- 1e-12           // first hit at rank 2
    // DCG = 2/log2(3) + 1/log2(4); IDCG = 2/log2(2) + 2/log2(3) + 1/log2(4)
    val dcg = 2.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    val idcg = 2.0 + 2.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    m.getAs[Double]("ndcg") shouldBe (dcg / idcg) +- 1e-12
  }

  test("a judged query with zero retrieved hits scores 0, not a dropped row") {
    val ranked = Seq((1L, 10L, 1)).toDF("q_id", "n_id", "rank")
    val qrels = Seq((1L, 99L, 1.0), (2L, 50L, 1.0)).toDF("q_id", "n_id", "rel")
    val m = Similarity.retrievalMetrics(ranked, qrels, 5)
      .orderBy("q_id").collect()
    m.length shouldBe 2
    m.foreach { r =>
      r.getAs[Double]("recall") shouldBe 0.0
      r.getAs[Double]("mrr") shouldBe 0.0
      r.getAs[Double]("ndcg") shouldBe 0.0
    }
  }

  test("hardNegatives skips positives, keeps retriever order, yields m rows") {
    // retriever rank order for q=1: 10, 11, 12, 13, 14; positives 10, 12
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (1L, 13L, 4), (1L, 14L, 5)).toDF("q_id", "n_id", "rank")
    val pos = Seq((1L, 10L), (1L, 12L)).toDF("q_id", "n_id")
    val out = Similarity.hardNegatives(
        ranked.limit(0).select("q_id").limit(0), // unused by stub retriever
        ranked.limit(0), pos, m = 3, maxPositives = 2,
        retriever = (_, _, _) => ranked)
      .orderBy("neg_rank").collect()
    out.map(r => (r.getLong(1), r.getInt(2))).toSeq shouldBe
      Seq((11L, 1), (13L, 2), (14L, 3))
  }

  test("results beyond k are ignored") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 4)).toDF("q_id", "n_id", "rank")
    val qrels = Seq((1L, 11L, 1.0)).toDF("q_id", "n_id", "rel")
    val m = Similarity.retrievalMetrics(ranked, qrels, 3).head()
    m.getAs[Long]("n_rel_ret") shouldBe 0L
  }
}
