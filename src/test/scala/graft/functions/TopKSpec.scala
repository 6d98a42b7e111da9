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

  test("buffer-level property: random streams, merge trees, and serialize round-trips equal brute force") {
    // Drives the DistinctTopKBuffer's cached-worst logic directly
    // (no Spark job per trial, so hundreds of adversarial cases run
    // in milliseconds): tiny score domain forces constant ties — the
    // (score desc, id asc) tie-eviction is the subtle path — and each
    // trial splits the stream into a random merge tree with
    // serialize/deserialize round-trips at random points, the shape
    // map-side partial aggregation actually produces.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val r = new scala.util.Random(407)
    for (trial <- 1 to 200) withClue(s"trial=$trial: ") {
      val k = 1 + r.nextInt(8)
      val agg = TopKDistinctAggregate(
        BoundReference(0, DoubleType, nullable = true),
        BoundReference(1, LongType, nullable = true), k)
      val n = 1 + r.nextInt(120)
      val stream = (1 to n).map(_ =>
        (r.nextInt(6).toDouble, r.nextInt(25).toLong))
      // random merge tree: split into 1-6 chunks, each folded into its
      // own buffer (some round-tripped through bytes), then merged
      val chunks = stream.grouped(1 + r.nextInt(math.max(n / 2, 1)))
        .toSeq
      val bufs = chunks.map { ch =>
        var b = agg.createAggregationBuffer()
        ch.foreach { case (s, i) => agg.update(b, InternalRow(s, i)) }
        if (r.nextBoolean()) b = agg.deserialize(agg.serialize(b))
        b
      }
      val merged = bufs.reduce { (a, b) => agg.merge(a, b) }
      val got = agg.eval(merged).asInstanceOf[GenericArrayData].array
        .map { row =>
          val ir = row.asInstanceOf[InternalRow]
          (ir.getDouble(0), ir.getLong(1))
        }.toSeq
      val expect = stream.groupBy(_._2).view
        .mapValues(_.map(_._1).max).toSeq
        .map { case (i, s) => (s, i) }
        .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
        .take(k)
      got shouldBe expect
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
