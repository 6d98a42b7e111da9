package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet. `events.ts` is parquet TIMESTAMP(NANOS),
  * which Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]); we
  * read it as a raw long (legacy nanosAsLong) and truncate to
  * microseconds, which matches DuckDB's ns->us truncation exactly, so
  * oracle comparisons stay bit-identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read
          .parquet(s"$dir/events.parquet")
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        spark.read.parquet(s"$dir/$name.parquet")
    }
}
