package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Tables.load(spark, sfDir, "lineitem").cache()
    time("lineitem count")(li.count())
    time("countDistinct")(
      li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey"))).collect())
    time("approx_count_distinct rsd=0.01")(
      li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.01)).collect())
    time("percentile exact")(
      li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5d)")).collect())
    time("approx_percentile acc=10000")(
      li.groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_quantity, 0.5d, 10000)")).collect())
    time("all four together")(
      li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")),
          approx_count_distinct(col("l_orderkey"), 0.01),
          expr("percentile(l_quantity, 0.5d)"),
          expr("approx_percentile(l_quantity, 0.5d, 10000)")).collect())
    time("three sketches together (no distinct)")(
      li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.01),
          expr("percentile(l_quantity, 0.5d)"),
          expr("approx_percentile(l_quantity, 0.5d, 10000)")).collect())
    time("split: sketches JOIN distinct")(
      li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("h"),
          expr("percentile(l_quantity, 0.5d)").as("p"),
          expr("approx_percentile(l_quantity, 0.5d, 10000)").as("pa"))
        .join(li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_orderkey")).as("nd")), "l_returnflag")
        .collect())
    spark.stop()
  }
}
