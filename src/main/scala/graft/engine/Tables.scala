package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet. `events.ts` has shipped in two
  * encodings across driver testdata generations: TIMESTAMP(NANOS)
  * (which Spark's vectorized reader rejects, [PARQUET_TYPE_ILLEGAL] —
  * we read it as a raw long via legacy nanosAsLong and truncate to
  * microseconds, matching DuckDB's ns->us truncation exactly) and
  * plain TIMESTAMP(MICROS) (read natively). The loader sniffs the
  * resolved schema rather than assuming a generation.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(s"$dir/events.parquet")
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => // NANOS generation
            df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case org.apache.spark.sql.types.TimestampNTZType =>
            // MICROS generation arrives as NTZ; downstream ops
            // (unix_micros, windows) expect TIMESTAMP. Session tz is
            // pinned UTC, so the cast is value-neutral and matches
            // DuckDB's reading of the same file.
            df.withColumn("ts",
              col("ts").cast(org.apache.spark.sql.types.TimestampType))
          case _ => df
        }
      case _ =>
        spark.read.parquet(s"$dir/$name.parquet")
    }
}
