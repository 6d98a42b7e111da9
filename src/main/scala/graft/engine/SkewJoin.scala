package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * At 100 TB a temporal/equi join on a power-law key (one hot account,
  * one hot symbol) puts the hot key's entire fact volume in one shuffle
  * partition. AQE's skew-join split handles sort-merge cases
  * (spark.sql.adaptive.skewJoin.*); this helper is the explicit variant
  * for when the dim side is small enough to replicate: fact rows get a
  * uniform salt in [0, salts), the dim side is exploded ×salts, and the
  * join key becomes (key, salt) — the hot key fans out over `salts`
  * partitions at the cost of a `salts`× dim replication.
  */
object SkewJoin {

  /** @param fact    big, possibly skewed side (gets the random salt).
    *                 Must be the preserved side: only `inner` and `left`
    *                 joinTypes are accepted — the dim side is replicated
    *                 ×salts, so a right/full outer join would emit each
    *                 unmatched dim row once per salt replica.
    * @param dim     replicated side (exploded ×salts)
    * @param factKey equi key on fact
    * @param dimKey  equi key on dim
    * @param salts   fan-out factor for hot keys
    * @param extra   optional extra join predicate (e.g. temporal BETWEEN)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: Column, dimKey: Column, salts: Int,
                 joinType: String = "inner",
                 extra: Column = lit(true), seed: Long = 7L): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left only (got $joinType): the dim side " +
        "is replicated, so outer-preserving it would duplicate unmatched rows")
    val salted = fact.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated,
        factKey === dimKey && salted("__salt") === replicated("__salt") && extra,
        joinType)
      .drop("__salt")
  }
}
