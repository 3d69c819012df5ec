package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join: for each left row, the latest right row with
  * `rightTime <= leftTime` within the same key — an operator Spark lacks
  * natively.
  *
  * Implementation is compositional (SURVEY.md §7.3 preference (a)): tag
  * both sides, union, and carry the right side's values forward with a
  * `last(_, ignoreNulls)` running window ordered by (time, side) — right
  * rows sort before left rows at equal timestamps, so `<=` semantics hold.
  * Cost: ONE shuffle on the key (the union's window), versus a range-join
  * explosion (`left × right` per key) for the naive inequality join. At
  * 100 TB both sides stream through a single hash partitioning; state per
  * key inside the window is O(1) (just the carried values).
  */
object AsOfJoin {

  /** Columns of `right` other than key/time are carried onto matching
    * left rows (null when no right row precedes the left row — LEFT
    * as-of semantics).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val carried = right.columns.filterNot(c => key.contains(c) || c == rightTime)
    val rTagged = right.select(
      key.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side"), col(rightTime).as("_r_time")) ++
        carried.map(c => col(c).as(s"_r_$c")): _*)
    val lTagged = left.select(
      key.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side"), lit(null).cast(rTagged.schema("_r_time").dataType).as("_r_time")) ++
        carried.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")) ++
        left.columns.filterNot(c => key.contains(c) || c == leftTime).map(col): _*)

    // Total order: ties on (_t, _side) — multiple right rows with the
    // same (key, time) — are broken by the carried right columns, so the
    // surviving match is deterministic across runs and partitionings.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_t") +: col("_side") +: carried.sorted.map(c => col(s"_r_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val unioned = rTagged
      .unionByName(lTagged, allowMissingColumns = true)
      .select(
        (key.map(col) ++ Seq(col("_t"), col("_side")) ++
          left.columns.filterNot(c => key.contains(c) || c == leftTime).map(col) ++
          Seq(last(col("_r_time"), ignoreNulls = true).over(w).as(s"asof_$rightTime")) ++
          carried.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))): _*)

    unioned.filter(col("_side") === 1)
      .withColumnRenamed("_t", leftTime)
      .drop("_side")
  }
}
