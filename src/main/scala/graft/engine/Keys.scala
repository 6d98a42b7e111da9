package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Surrogate-key generation.
  *
  * Re-expresses dbt_utils.generate_surrogate_key (reference:
  * models/gold/dim_account.sql:2 et al.; macro expansion =
  * `md5(concat_ws('-', coalesce(cast(c as varchar), '<null sentinel>'), ...))`).
  */
object Keys {
  val NullSentinel = "_dbt_utils_surrogate_key_null_"

  /** md5 over '-'-joined stringified columns, null-safe. */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*))
}
