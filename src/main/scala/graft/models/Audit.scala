package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse audit checks — the dbt-test / TPC-DI-audit analog the
  * reference leaves unimplemented (README.md:325 lists audit queries as
  * future work; its only shipped test is fact_trade uniqueness,
  * tests/fact_trade__unique_trade.sql).
  *
  * Each check returns the VIOLATING rows (empty = pass), so checks
  * compose into gates the same way dbt tests do. All are single
  * aggregates or anti-joins — partial-aggregated, broadcast-friendly,
  * scale-shaped like the models they audit.
  */
object Audit {

  /** Rows where any of `cols` is null. */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(c => col(c).isNull).reduce(_ || _))

  /** Key tuples appearing more than once. */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Child rows whose `childKey` resolves to no parent (`parentKey`) —
    * dbt's `relationships` test. Null child keys are exempt (dbt
    * semantics: nullability is `not_null`'s job).
    */
  def relationships(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")

  /** Values outside [lo, hi] — dbt's accepted-range test. */
  def acceptedRange(df: DataFrame, c: String, lo: Double,
                    hi: Double): DataFrame =
    df.filter(col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** One row per table: name + row count (the TPC-DI batch-audit row
    * count report).
    */
  def rowCounts(tables: Map[String, DataFrame]): DataFrame = {
    val dfs = tables.toSeq.sortBy(_._1).map { case (name, df) =>
      df.agg(count(lit(1)).as("n_rows")).select(lit(name).as("table"),
        col("n_rows"))
    }
    dfs.reduce(_ unionByName _)
  }

  /** Batch-continuity audit for an SCD2 dimension after an incremental
    * batch apply (the TPC-DI audit-phase invariants, applied to
    * [[Warehouse.applyBatch2]]'s output): one row per check with its
    * violation count —
    *
    *  - `one_current_per_entity`: exactly one `is_current` version per
    *    entity (counts entities violating it);
    *  - `no_version_overlap`: within an entity ordered by
    *    effective_timestamp, each version ends before the next begins;
    *  - `current_is_open`: every current version carries the sentinel
    *    end timestamp.
    *
    * One window pass keyed by the entity — the dimension's own
    * partitioning, no extra shuffle shape.
    */
  def scd2Continuity(dim: DataFrame, idCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCols.map(col): _*)
      .orderBy(col("effective_timestamp"), col("end_timestamp"))
    val v = dim.withColumn("__next_eff",
      lead(col("effective_timestamp"), 1).over(w))
    def cnt(name: String, violations: org.apache.spark.sql.Column) =
      v.agg(sum(when(violations, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(name).as("check"),
          coalesce(col("n_violations"), lit(0L)).as("n_violations"))
    val oneCurrent = dim.groupBy(idCols.map(col): _*)
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("__n_cur"))
      .agg(sum(when(col("__n_cur") =!= 1L, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("one_current_per_entity").as("check"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
    oneCurrent
      .unionByName(cnt("no_version_overlap",
        col("__next_eff").isNotNull && col("end_timestamp") >= col("__next_eff")))
      .unionByName(cnt("current_is_open",
        col("is_current") &&
          col("end_timestamp") =!= lit(graft.engine.Scd2.SentinelEnd).cast("timestamp")))
  }
}
