package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKAggregate must equal the window row_number formulation
  * bit-for-bit (same deterministic tie-break) on every layout — the
  * merge path is exercised by forcing many input partitions.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  // heavy ties: scores collide constantly, so the (score desc, id asc)
  // tie-break does real work
  private def data(n: Int) =
    (1 to n).map(i => (i.toLong, s"g${i % 4}", (i * 37 % 11).toDouble))
      .toDF("id", "g", "score")

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(desc("score"), asc("id"))))
      .filter($"rn" <= k).select("g", "id", "score")

  test("topK equals the window formulation, ties and layouts included") {
    val df = data(500)
    val expected = windowed(df, 7)
    for (layout <- Seq(df, df.repartition(13), df.coalesce(1))) {
      val got = layout.groupBy("g")
        .agg(TopK.topK($"score", $"id", 7).as("top"))
        .select($"g", explode($"top").as("t"))
        .select($"g", $"t.id".as("id"), $"t.score".as("score"))
      got.except(expected).count() shouldBe 0
      expected.except(got).count() shouldBe 0
    }
  }

  test("groups smaller than k return all rows, best-first order") {
    val out = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0)).toDF("id", "score")
      .agg(TopK.topK($"score", $"id", 10).as("top"))
      .select(explode($"top").as("t")).select($"t.score", $"t.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    out.toSeq shouldBe Seq((9.0, 2L), (9.0, 3L), (5.0, 1L))
  }

  test("null scores and ids are skipped") {
    val out = Seq((Some(1L), Some(5.0)), (None, Some(9.0)), (Some(3L), None))
      .toDF("id", "score")
      .agg(TopK.topK($"score", $"id", 3).as("top"))
      .select(org.apache.spark.sql.functions.size($"top"))
      .collect()(0).getInt(0)
    out shouldBe 1
  }

  test("topKDistinct equals topK over pre-deduped input; duplicates take one slot") {
    // duplicated rows: every (g, id) appears 1-3 times, same score per
    // id — the expansion-serve shape (multi-path arrivals)
    val base = data(300)
    val dups = base.unionByName(base.filter($"id" % 2 === 0))
      .unionByName(base.filter($"id" % 3 === 0))
    def fold(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column) =
      df.groupBy("g").agg(c.as("top"))
        .select($"g", posexplode($"top").as(Seq("pos", "t")))
        .select($"g", $"pos", $"t.id", $"t.score")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    for (layout <- Seq(dups, dups.repartition(13), dups.coalesce(1))) {
      fold(layout, TopK.topKDistinct($"score", $"id", 7)) shouldBe
        fold(base, TopK.topK($"score", $"id", 7))
    }
    // a duplicate id with DIFFERENT scores keeps its best score
    val best = Seq((1L, 2.0), (1L, 9.0), (2L, 5.0), (1L, 4.0))
      .toDF("id", "score")
      .agg(TopK.topKDistinct($"score", $"id", 2).as("top"))
      .select(explode($"top").as("t")).select($"t.score", $"t.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    best.toSeq shouldBe Seq((9.0, 1L), (5.0, 2L))
  }

  test("topKDistinct under heavy load: cached-worst invalidation survives raise-the-worst and eviction churn") {
    // single group, k small, ids cycling so the same id keeps
    // RAISING its own score (including while it IS the cached worst)
    // and full-buffer evictions interleave with O(1) rejections — the
    // exact update sequence the worst-entry cache must survive.
    val n = 4000
    val churn = (0 until n).map { step =>
      val id = (step * 13 % 50).toLong                // 50 ids, revisited
      val score = ((step * 7919 + id * 31) % 97).toDouble // raises + drops
      (id, score)
    }.toDF("id", "score")
    val bestPerId = churn.groupBy("id")
      .agg(max($"score").as("score"))
    val expected = windowed(bestPerId.withColumn("g", lit("g")), 9)
      .select("id", "score")
    for (layout <- Seq(churn, churn.repartition(17), churn.coalesce(1))) {
      val got = layout
        .agg(TopK.topKDistinct($"score", $"id", 9).as("top"))
        .select(explode($"top").as("t"))
        .select($"t.id".as("id"), $"t.score".as("score"))
      got.except(expected).count() shouldBe 0
      expected.except(got).count() shouldBe 0
    }
  }

  test("top_k is callable from SQL via GraftExtensions") {
    // shared test context exists, so builder withExtensions would be
    // skipped — register the same builder on a child session's registry
    // (identical resolution path to injectFunction)
    val sql = spark.newSession()
    sql.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k", graft.plans.GraftExtensions.topKExpr, "built-in")
    val rows = sql.sql(
      """WITH scores AS (
        |  SELECT id, concat('g', id % 4) AS g,
        |         cast(id * 37 % 11 AS double) AS score
        |  FROM range(1, 101))
        |SELECT g, t.id, t.score
        |FROM (SELECT g, top_k(score, id, 3) AS top FROM scores GROUP BY g)
        |LATERAL VIEW explode(top) AS t""".stripMargin).collect()
    rows.length shouldBe 12 // 4 groups x 3
  }
}
