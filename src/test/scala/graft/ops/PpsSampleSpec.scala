package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Systematic PPS sampling: the draw count is exactly n, the multiset
  * is layout-independent (the prefix sum may not depend on partition
  * layout), a heavyweight row draws multiple times, and the ill-posed
  * n > W case fails loudly.
  */
class PpsSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1 to 300).map { i =>
    (i.toLong, (i % 17) + 1L) // weights 1..17, W = 300*9 = 2700
  }.toDF("id", "wt")

  test("sum of n_draws is exactly n, layout-independent") {
    val base = Curation.ppsSample(corpus, "id", col("wt"), 40L)
      .select("id", "n_draws").as[(Long, Long)].collect().toMap
    base.values.sum shouldBe 40L
    for (layout <- Seq(corpus.repartition(11), corpus.coalesce(1))) {
      val got = Curation.ppsSample(layout, "id", col("wt"), 40L)
        .select("id", "n_draws").as[(Long, Long)].collect().toMap
      got shouldBe base
    }
  }

  test("a row heavier than the step draws multiple times") {
    val df = ((1 to 50).map(i => (i.toLong, 1L)) :+ (99L, 1000L))
      .toDF("id", "wt") // W=1050, n=10 -> step=105; the heavy row ~9-10 draws
    val out = Curation.ppsSample(df, "id", col("wt"), 10L)
      .select("id", "n_draws").as[(Long, Long)].collect().toMap
    out.values.sum shouldBe 10L
    out(99L) should be >= 9L
  }

  test("mixtureSample apportions draws by largest remainder and samples per source") {
    val df = (1 to 300).map { i =>
      (i.toLong, s"s${i % 3}", (i % 7) + 1L)
    }.toDF("id", "source", "wt")
    // equal thirds of 10 -> floors 3/3/3, one remainder bumped to the
    // lexicographically-first source among equal fractions: s0 gets 4
    val out = Curation.mixtureSample(df, "source", "id", col("wt"),
        Map("s0" -> 1.0 / 3, "s1" -> 1.0 / 3, "s2" -> 1.0 / 3), 10L)
      .groupBy("source").agg(sum("n_draws").as("n"))
      .as[(String, Long)].collect().toMap
    out shouldBe Map("s0" -> 4L, "s1" -> 3L, "s2" -> 3L)
  }

  test("mixtureSample normalizes shares that do not sum to 1") {
    val df = (1 to 200).map(i => (i.toLong, s"s${i % 2}", 2L))
      .toDF("id", "source", "wt")
    val out = Curation.mixtureSample(df, "source", "id", col("wt"),
        Map("s0" -> 3.0, "s1" -> 1.0), 8L) // 3:1 -> 6/2
      .groupBy("source").agg(sum("n_draws").as("n"))
      .as[(String, Long)].collect().toMap
    out shouldBe Map("s0" -> 6L, "s1" -> 2L)
  }

  test("takeTokenBudget fills each source to at least its budget, straddler included") {
    val df = (1 to 100).map(i => (i.toLong, s"s${i % 2}", 10L))
      .toDF("id", "source", "wt") // each source: 50 docs x 10 tokens
    val out = Curation.takeTokenBudget(df, "source", "id", col("wt"),
        Map("s0" -> 95L, "s1" -> 200L))
      .groupBy("source").agg(count(lit(1)).as("n"),
        max("tokens_before").as("maxtb"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // s0: kept while tokens_before < 95 -> 10 docs (the 10th starts at
    // 90 < 95 and straddles to 100); s1: 20 docs fill exactly 200
    out("s0") shouldBe ((10L, 90L))
    out("s1") shouldBe ((20L, 190L))
  }

  test("n exceeding total weight raises instead of returning empty") {
    val df = Seq((1L, 2L), (2L, 3L)).toDF("id", "wt") // W = 5
    val e = intercept[Exception] {
      Curation.ppsSample(df, "id", col("wt"), 10L).collect()
    }
    e.getMessage should include("exceeds total weight")
  }
}
