package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic aggregation helpers. Double sums depend on partitioning
  * and reduce order; at 100 TB that means re-runs and retries produce
  * different last-ulp results (and fail any exact-compare gate). For
  * fixed-decimal business data we instead sum exactly in decimal
  * (associative, order-independent) and convert once at the end.
  */
object Determinism {

  /** Exact, order-independent sum of a fixed-decimal numeric column.
    * `scale` must cover the input's decimal places (default 8). */
  def exactSum(c: Column, scale: Int = 8): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Order-independent mean: exact decimal sum, then ONE double divide. */
  def deterministicMean(c: Column, scale: Int = 8): Column =
    exactSum(c, scale) / count(c)
}
