package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two tables bucketed on the key needs no Exchange") {
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", buckets = 4)
    Bucketing.writeBucketed(right, "bkt_right", "k", buckets = 4)

    // hint merge so broadcast can't mask the comparison: a sort-merge
    // join over matching buckets reads co-located and skips the shuffle
    val joined = spark.table("bkt_left").hint("merge")
      .join(spark.table("bkt_right"), Seq("k"))
    joined.count() shouldBe 500L

    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "Exchange hashpartitioning"

    // contrast: the same join on plain parquet shuffles both sides
    val plainDir = java.nio.file.Files.createTempDirectory("plain")
    left.write.mode("overwrite").parquet(s"$plainDir/l")
    right.write.mode("overwrite").parquet(s"$plainDir/r")
    val plain = spark.read.parquet(s"$plainDir/l")
      .join(spark.read.parquet(s"$plainDir/r"), Seq("k"))
    // force non-broadcast so the exchange is observable
    val plainNoBc = spark.read.parquet(s"$plainDir/l").hint("merge")
      .join(spark.read.parquet(s"$plainDir/r"), Seq("k"))
    plainNoBc.count() shouldBe 500L
    plainNoBc.queryExecution.executedPlan.toString should
      include("Exchange hashpartitioning")
  }

  test("groupBy on the bucket key also avoids the shuffle") {
    val agg = spark.table("bkt_right").groupBy("k").agg(sum("rv"))
    agg.count() shouldBe 500L
    agg.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning"
  }
}
