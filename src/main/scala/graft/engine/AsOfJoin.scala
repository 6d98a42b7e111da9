package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-past) join: each fact row picks the single dim row
  * with the greatest timestamp <= the fact timestamp, per key.
  *
  * The reference expresses its as-of semantics as interval containment
  * against SCD2 [effective, end] windows (SURVEY §2.3 J4); this operator
  * covers the raw-changelog case where no end_timestamp exists — the
  * classic operator Spark lacks natively.
  *
  * Implementation is the scale-correct union+carry-forward plan, NOT a
  * range join: tag both sides, union on (key, ts), sort within key, and
  * carry the last dim row forward with an ignore-nulls window — one
  * shuffle on the key, no quadratic candidate pairs, immune to the
  * BNLJ degeneration a pure `fact.ts >= dim.ts` join invites.
  */
object AsOfJoin {

  /** @param fact     left side; every row is kept (left-join semantics)
    * @param dim      right side changelog
    * @param key      join key name present on both sides
    * @param factTs   event-time column name on fact
    * @param dimTs    event-time column name on dim
    * @param payload  dim columns to attach (as-of values)
    *
    * Ties (dim.ts == fact.ts) match, like BETWEEN's inclusive lower
    * bound; among same-ts dim rows the last by `dimTs` ordering wins.
    */
  def asOfJoin(fact: DataFrame, dim: DataFrame, key: String,
               factTs: String, dimTs: String,
               payload: Seq[String]): DataFrame = {
    val factCols = fact.columns
    // tag: dim rows sort before fact rows at equal ts so they are visible
    // to facts at the same instant (inclusive as-of)
    val dimSide = dim.select(
      (col(key).as("__k") +: col(dimTs).as("__ts").cast("timestamp") +:
        lit(0).as("__side") +:
        payload.map(c => col(c).as(s"__p_$c")) ++:
        factCols.map(c => lit(null).cast(fact.schema(c).dataType).as(c))): _*)
    val factSide = fact.select(
      (col(key).as("__k") +: col(factTs).as("__ts").cast("timestamp") +:
        lit(1).as("__side") +:
        payload.map(c => lit(null).cast(dim.schema(c).dataType).as(s"__p_$c")) ++:
        factCols.map(col)): _*)
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(dimSide.unionByName(factSide)) { (df, c) =>
      df.withColumn(s"__p_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(factCols.map(col) ++ payload.map(c => col(s"__p_$c").as(c)): _*)
  }
}
