package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ZValue

/** Multi-dimensional data layout for scan pruning.
  *
  * Z-order clustering: range-partition on the Morton interleave of two
  * filter columns, sort within partitions by it, and write. Each output
  * file then covers a small rectangle of (x, y) space, so parquet
  * min/max footer stats prune files for predicates on EITHER column —
  * a single-column sort gives that for one dimension only. This is the
  * standard curve-clustering technique (Z-order/Hilbert) used by lake
  * formats; the curve value is computed by the codegen'd
  * `functions.ZValue`, the layout is pure `repartitionByRange` +
  * `sortWithinPartitions` (one range-exchange, sampled bounds, no
  * driver work).
  */
object Layout {

  /** Cluster `df` on the Z-curve of (xCol, yCol). Keys are masked to
    * the low `bits` bits — pre-scale real domains into [0, 2^bits).
    */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String,
                   bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    val z = ZValue.zValue(col(xCol), col(yCol), bits)
    val withZ = df.withColumn("__z", z)
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions("__z").drop("__z")
  }

  /** Write a Z-ordered parquet table (the pruning benefit materializes
    * in the footer stats of each written file).
    */
  def zorderWrite(df: DataFrame, path: String, xCol: String, yCol: String,
                  bits: Int = 16, numPartitions: Int = 0): Unit =
    zorderLayout(df, xCol, yCol, bits, numPartitions)
      .write.mode("overwrite").parquet(path)

  /** Locality diagnostic: per physical partition, the span of each
    * dimension (what footer-stat pruning sees). Sum of spans ≪ domain ×
    * partitions is the property Z-ordering buys.
    */
  def localityReport(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.withColumn("__pid", spark_partition_id())
      .groupBy("__pid")
      .agg(count(lit(1)).as("n_rows"),
        (max(col(xCol)) - min(col(xCol))).as("x_span"),
        (max(col(yCol)) - min(col(yCol))).as("y_span"))
}
