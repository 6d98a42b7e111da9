package graft.engine

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * equi-joins and aggregations on the bucket key run with NO Exchange.
  *
  * The 100 TB pattern for the warehouse's hot join keys (trade_id between
  * trades/holdings/dim_trade; account_id between facts and dim_account):
  * land both sides bucketed on the key and every downstream join is
  * co-located — the shuffle is paid once at ingest, not per query.
  */
object Bucketing {

  /** Write as a bucketed, in-bucket-sorted parquet table registered in
    * the session catalog. Read back with `spark.table(name)`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
