package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal ("between effective and end") join — the reference's
  * signature operator, appearing 13 times (SURVEY §2.3 J4/J10; canonical
  * site models/silver/cash_transactions.sql:13-20).
  *
  * Shape: equi-join on the business key plus an inclusive
  * `fact.ts BETWEEN dim.effective AND dim.end` range predicate. Catalyst
  * extracts the equi conjunct for a hash/sort-merge join and applies the
  * range as a post-join filter, so the plan shuffles only on the key —
  * the right plan at 100 TB as long as the equi key is present. Dims that
  * fit in memory should be passed through `broadcast(...)` by the caller.
  */
object TemporalJoin {

  def temporalJoin(fact: DataFrame, dim: DataFrame,
                   factKey: Column, dimKey: Column, factTs: Column,
                   joinType: String = "inner",
                   eff: Column = null, end: Column = null): DataFrame = {
    val effC = Option(eff).getOrElse(dim("effective_timestamp"))
    val endC = Option(end).getOrElse(dim("end_timestamp"))
    fact.join(dim, factKey === dimKey && factTs.between(effC, endC), joinType)
  }

  /** Dual-key fallback variant (J5/J6: models/silver/financials.sql:20-26,
    * securities.sql:40-46): left-join the dim twice on alternative keys,
    * then `coalesce` the matched attributes. Returns (joined, pickFirst)
    * where attributes from the first match win.
    *
    * @param attrs dim attribute names to surface as coalesce(first, second)
    */
  def dualKeyTemporalJoin(fact: DataFrame, dim: DataFrame,
                          key1: (Column, DataFrame => Column),
                          key2: (Column, DataFrame => Column),
                          factTs: Column,
                          attrs: Seq[String]): DataFrame = {
    val d1 = dim.columns.foldLeft(dim)((d, c) => d.withColumnRenamed(c, s"__k1_$c"))
    val d2 = dim.columns.foldLeft(dim)((d, c) => d.withColumnRenamed(c, s"__k2_$c"))
    val j = fact
      .join(d1, key1._1 === key1._2(d1) &&
        factTs.between(d1("__k1_effective_timestamp"), d1("__k1_end_timestamp")), "left")
      .join(d2, key2._1 === key2._2(d2) &&
        factTs.between(d2("__k2_effective_timestamp"), d2("__k2_end_timestamp")), "left")
    val coalesced = attrs.foldLeft(j) { (df, a) =>
      df.withColumn(a, coalesce(col(s"__k1_$a"), col(s"__k2_$a")))
    }
    coalesced.drop(coalesced.columns.filter(_.startsWith("__k")): _*)
  }
}
