package graft.engine

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning: when a partitioned fact joins a filtered
  * dim on the partition column, the fact scan must carry a runtime
  * `dynamicpruning` subquery — at 100 TB this is the difference
  * between scanning every date partition and scanning the few the dim
  * filter selects. The plan-level proof that graft's hive-style
  * partitioned layouts compose with Catalyst's DPP, plus a result
  * check that pruning loses no rows.
  */
class DppSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned fact scan gains a dynamicpruning filter from the dim side") {
    val dir = Files.createTempDirectory("dpp").toString
    (1 to 1000).map(i => (i.toLong, i % 20, i * 2L))
      .toDF("id", "part_key", "v")
      .write.mode("overwrite").partitionBy("part_key").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be file-backed: over a LocalRelation the optimizer
    // folds the filter away (ConvertToLocalRelation) and the DPP rule
    // no longer sees a selective predicate to reuse
    val dimDir = Files.createTempDirectory("dpp_dim").toString
    (0 until 20).map(k => (k, if (k < 3) "keep" else "drop"))
      .toDF("part_key", "flag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    val joined = fact.join(dim.filter($"flag" === "keep"), Seq("part_key"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n${plan.take(800)}")
    // correctness: pruning must not lose rows — 3 of 20 residues survive
    joined.count() shouldBe (1 to 1000).count(i => i % 20 < 3).toLong
  }
}
