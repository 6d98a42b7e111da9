package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation ops: the distributed shard prefix-sum must be bit-identical
  * to the global-window definition under hostile layouts (groups
  * spanning partitions, partitions holding several groups), sampling
  * must be layout-independent, and the profile must count exactly.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map { i =>
      (i.toLong, Seq("en", "fr", "de")(i % 3), "w " * (i % 40 + 1))
    }.toDF("doc_id", "lang", "text")
      .withColumn("tok", graft.ops.TextOps.tokenCountWs(col("text")))

  test("assignShards equals the global-window definition across layouts") {
    val docs = corpus(500)
    val reference = docs.withColumn("shard",
      expr("(sum(tok) over (partition by lang order by doc_id) - tok) div 100"))
      .select("doc_id", "shard")
    // 4 shuffle partitions for 3 groups x 500 rows: groups both share
    // partitions and span several — the layouts the offsets must survive.
    for (layout <- Seq(docs, docs.repartition(7), docs.coalesce(1))) {
      val got = Curation.assignShards(layout, col("lang"), col("doc_id"),
        col("tok"), 100L).select("doc_id", "shard")
      got.except(reference).count() shouldBe 0
      reference.except(got).count() shouldBe 0
    }
  }

  test("assignShards: no document exceeds its shard boundary start") {
    val docs = corpus(200)
    val shards = Curation.assignShards(docs, col("lang"), col("doc_id"),
      col("tok"), 100L)
    // exclusive prefix sum => every shard's first doc starts under budget*(shard+1)
    val starts = shards.groupBy("lang", "shard").agg(count(lit(1)).as("n"))
    starts.filter($"n" === 0).count() shouldBe 0
    // shards are contiguous per group: max(shard)+1 == distinct shard count
    val byLang = shards.groupBy("lang")
      .agg(max("shard").as("mx"), countDistinct("shard").as("nd"))
    byLang.filter($"mx" + 1 =!= $"nd").count() shouldBe 0
  }

  test("sampleByHash is layout-independent and close to pct") {
    val docs = corpus(1000)
    val a = Curation.sampleByHash(docs, col("doc_id"), 0.2).select("doc_id")
    val b = Curation.sampleByHash(docs.repartition(13), col("doc_id"), 0.2)
      .select("doc_id")
    a.except(b).count() shouldBe 0
    b.except(a).count() shouldBe 0
    val n = a.count()
    assert(n > 120 && n < 280, s"sample of 1000 at 20% was $n")
  }

  test("sampleStratified returns at most k per stratum, deterministically") {
    val docs = corpus(300)
    val s1 = Curation.sampleStratified(docs, Seq("lang"), col("doc_id"), 7)
    s1.groupBy("lang").count().filter($"count" > 7).count() shouldBe 0
    val s2 = Curation.sampleStratified(docs.repartition(5), Seq("lang"),
      col("doc_id"), 7)
    s1.select("doc_id").except(s2.select("doc_id")).count() shouldBe 0
  }

  test("profileColumns counts exactly and approves the approx check") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a"))
    ).toDF("id", "s")
    val p = Curation.profileColumns(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    p("id").getLong(1) shouldBe 4    // n_rows
    p("id").getLong(2) shouldBe 0    // n_nulls
    p("id").getLong(3) shouldBe 4    // n_distinct
    p("s").getLong(2) shouldBe 1
    p("s").getLong(3) shouldBe 2
    p("s").getBoolean(4) shouldBe true
    p("s").getString(5) shouldBe "a" // min_value
    p("s").getString(6) shouldBe "b" // max_value
  }

  test("writeShards lays out one directory per shard with ordered rows") {
    val docs = corpus(200)
    val shards = Curation.assignShards(docs, col("lang"), col("doc_id"),
      col("tok"), 100L)
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Curation.writeShards(shards, out, Seq("doc_id"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard="))
    dirs.length shouldBe shards.select("shard").distinct().count()
    val back = spark.read.parquet(out)
    back.count() shouldBe 200
    back.select("doc_id").except(docs.select("doc_id")).count() shouldBe 0
  }
}
