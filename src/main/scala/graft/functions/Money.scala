package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic money arithmetic.
  *
  * All price-ish columns in the corpus carry exactly 2 decimal places, so
  * casting to DecimalType is lossless. Summing decimals instead of doubles
  * makes the aggregate independent of partitioning / partial-agg order —
  * the same value on 1 core or 1000 executors — and bit-identical to the
  * DuckDB oracle (which also sums decimals exactly). The final cast back
  * to double is a single deterministic IEEE rounding in both engines.
  *
  * Precision budget: money is dec(12,2) (max ~1e10), rate factors dec(4,2);
  * money*(1±rate)*(1±rate) = (12,2)*(5,2)*(5,2) → dec(24,6), and sum adds
  * 10 digits of headroom → dec(34,6): no overflow, no scale truncation,
  * exact at 100 TB row counts.
  */
object Money {
  private val M = DecimalType(12, 2) // money columns
  private val R = DecimalType(4, 2)  // rates in [0,1] with 2dp

  def money(c: Column): Column = c.cast(M)
  def rate(c: Column): Column = c.cast(R)

  /** Exact decimal sum of a 2dp column, returned as double. */
  def sumMoney(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** l_extendedprice * (1 - l_discount), exact decimal. */
  def discPrice(price: Column, discount: Column): Column =
    money(price) * (lit(1) - rate(discount))

  /** l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    discPrice(price, discount) * (lit(1) + rate(tax))

  /** Exact revenue aggregate as double. */
  def sumRevenue(price: Column, discount: Column): Column =
    sum(discPrice(price, discount)).cast(DoubleType)

  /** Per-row revenue in 1e-4 currency units as a primitive long:
    * round(price*100) * (100 - round(discount*100)). Both factors are
    * exact integers (the inputs carry exactly 2 decimal places), so the
    * product is the exact scaled revenue — the same rational value
    * [[discPrice]] computes, in a long-backed column.
    */
  def revenueUnits(price: Column, discount: Column): Column =
    round(price * lit(100)).cast("long") * (lit(100L) - round(discount * lit(100)).cast("long"))

  /** Exact revenue aggregate as double via the scaled-long fast path.
    *
    * Semantically identical to [[sumRevenue]]: the long sum is exact, it
    * converts to double losslessly while below 2^53 (≈9.2e14 scaled units
    * = 9.2e10 currency — far above any per-group revenue at 100 TB; NOT
    * safe for one global ungrouped total at extreme scale, use
    * [[sumRevenue]] there), and the single division by 1e4 is the same
    * correctly-rounded IEEE result as casting the exact decimal sum.
    * Verified value-identical to the decimal path on every sf0.1 group.
    *
    * Why it exists: sum(decimal) above 18 digits of precision keeps its
    * aggregation buffer as a JVM object, so every partial-agg update
    * allocates. Through a count-distinct expand (q01: per-(part, order)
    * partials) that is an allocation storm — observed 10×+ wall-clock
    * and multi-second GC pauses at sf0.1. The long buffer stays primitive
    * through whole-stage codegen in both the expand and final stages.
    */
  def sumRevenueFast(price: Column, discount: Column): Column =
    (sum(revenueUnits(price, discount)).cast(DoubleType) / lit(10000.0))
}
