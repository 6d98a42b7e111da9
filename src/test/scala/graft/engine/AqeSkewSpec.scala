package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PLANS.md leans on "AQE skew-split covers SMJ dims" for the temporal
  * joins' 100 TB story — this spec proves the claim actually fires:
  * under a hostile key distribution AQE must rewrite the sort-merge
  * join with skew=true splits at runtime.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "8")

    import s.implicits._
    // 90% of fact rows share one key; payload pads partition bytes
    val fact = s.range(0, 30000)
      .select(when($"id" % 10 === 0, $"id" % 50).otherwise(lit(777L)).as("k"),
        concat(lit("x"), lpad($"id".cast("string"), 64, "0")).as("payload"))
    val dim = s.range(0, 1000)
      .select(($"id" % 800).as("k"),
        concat(lit("d"), $"id".cast("string")).as("attr"))
    val joined = fact.join(dim, "k")
    joined.collect() // execute THIS plan (count() would plan a copy)
    val finalPlan = joined.queryExecution.executedPlan.toString
    finalPlan should include("skew=true")
  }
}
