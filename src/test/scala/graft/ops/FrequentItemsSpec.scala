package graft.ops

import graft.SparkSpec
import graft.functions.FrequentItems.mgSketch
import org.apache.spark.sql.functions._

/** Misra–Gries sketch + heavy-hitters composition: the MG guarantee
  * (every item above N/(capacity+1) survives the sketch whatever the
  * merge order), exactness of the recount under a capacity SMALLER than
  * the distinct count (compaction genuinely exercised), layout
  * independence, and the boilerplate-line rewrite end to end.
  */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish: item i appears ~1000/i times; 200 distinct, N ≈ 5878.
  private def zipf = (1 to 200).flatMap { i =>
    Seq.fill(1000 / i)(f"item$i%03d")
  }.toDF("item")

  test("mgSketch undercounts by at most N/(capacity+1) for every kept item") {
    val df = zipf.repartition(13)
    val n = df.count()
    val cap = 32
    val sketch = df.agg(mgSketch(col("item"), cap).as("s"))
      .selectExpr("explode(s) as e").select("e.item", "e.count")
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("item").count().as[(String, Long)].collect().toMap
    val bound = n / (cap + 1)
    // every item above the band is present...
    exact.filter(_._2 > bound).keys.foreach { k =>
      assert(sketch.contains(k), s"$k above error band but missing")
    }
    // ...and no kept count exceeds truth or undershoots past the band
    sketch.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k overcounted: $c > ${exact(k)}")
      assert(c >= exact(k) - bound, s"$k undercut past the MG bound")
    }
  }

  test("sketch survives shuffle serialization of keys past the 64 KiB writeUTF limit") {
    // minified-JS / base64-blob shape: single items whose UTF-8 form
    // exceeds 65535 bytes (writeUTF's hard cap). repartition forces the
    // partial buffers through serialize/deserialize.
    val big = "x" * 70000
    val other = "y" * 70001
    val df = (Seq.fill(5)(big) ++ Seq.fill(3)(other)).toDF("item")
      .repartition(7)
    val got = df.agg(mgSketch(col("item"), 8).as("s"))
      .selectExpr("explode(s) as e").select("e.item", "e.count")
      .as[(String, Long)].collect().toMap
    got shouldBe Map(big -> 5L, other -> 3L)
  }

  test("heavyHitters is exact with capacity far below the distinct count") {
    val df = zipf
    val exact = df.groupBy("item").count().filter(col("count") >= 50)
      .as[(String, Long)].collect().toMap
    for (layout <- Seq(df, df.repartition(17), df.coalesce(1))) {
      val got = Curation.heavyHitters(layout, "item", 50L, capacity = 128)
        .as[(String, Long)].collect().toMap
      got shouldBe exact
    }
  }

  test("heavyHitters refuses a threshold inside the sketch error band") {
    val e = intercept[IllegalArgumentException] {
      Curation.heavyHitters(zipf, "item", 2L, capacity = 16)
    }
    e.getMessage should include("error band")
  }

  test("stripBoilerplateLines removes exactly the frequent lines, keeps order and blanks") {
    val docs = (1 to 40).map { i =>
      val body = s"body-$i-a\nbody-$i-b"
      (i.toLong, s"HEADER\n$body\n\nFOOTER-${i % 2}")
    }.toDF("doc_id", "text")
    // HEADER in 40 docs, FOOTER-0/1 in 20 each, bodies unique
    val out = Curation.stripBoilerplateLines(docs, "text", "doc_id",
      minDocs = 15L, capacity = 64).orderBy("doc_id")
    val first = out.filter(col("doc_id") === 1L)
      .select("text", "n_lines_removed").as[(String, Long)].head()
    first._1 shouldBe "body-1-a\nbody-1-b\n" // blank line kept, order kept
    first._2 shouldBe 2L                      // HEADER + FOOTER gone
    out.agg(sum("n_lines_removed")).as[Long].head() shouldBe 80L
  }

  test("pairEval canonicalizes unordered pairs and handles empty sides") {
    val pred = Seq((1L, 2L), (2L, 1L), (3L, 4L), (5L, 6L))
      .toDF("doc_a", "doc_b") // (1,2) duplicated in both orders
    val truth = Seq((2L, 1L), (4L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val m = Dedup.pairEval(pred, truth).head()
    m.getAs[Long]("n_pred") shouldBe 3L
    m.getAs[Long]("n_truth") shouldBe 3L
    m.getAs[Long]("n_tp") shouldBe 2L
    m.getAs[Double]("precision") shouldBe (2.0 / 3.0) +- 1e-12
    m.getAs[Double]("recall") shouldBe (2.0 / 3.0) +- 1e-12
    val empty = Dedup.pairEval(pred.limit(0), truth).head()
    empty.getAs[Double]("precision") shouldBe 0.0
    empty.getAs[Double]("f1") shouldBe 0.0
  }

  test("stripBoilerplateLines with no frequent lines is the identity") {
    val docs = (1 to 5).map(i => (i.toLong, s"only-$i\nline-$i"))
      .toDF("doc_id", "text")
    val out = Curation.stripBoilerplateLines(docs, "text", "doc_id",
      minDocs = 3L, capacity = 64)
    out.filter(col("n_lines_removed") =!= 0L).count() shouldBe 0L
    out.select("doc_id", "text").as[(Long, String)].collect().sorted shouldBe
      (1 to 5).map(i => (i.toLong, s"only-$i\nline-$i"))
  }
}
