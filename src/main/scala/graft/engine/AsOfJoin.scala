package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series operator Spark's built-in joins lack
  * (DuckDB spells it `ASOF JOIN`): for each left row, attach the right
  * row with the greatest `rightTime <= leftTime` for the same key.
  *
  * Spark-first composition (preference (a) of the custom-operator ladder:
  * built-ins CAN express the semantics): tag both sides, union, one
  * window pass filling right-payload columns with `last(_, ignoreNulls)`
  * over `(key, time, side)` order, keep left rows. Cost: ONE shuffle on
  * the key + an in-partition sort — linear in rows, no range-join pair
  * explosion, skew-safe under AQE. A custom `SparkPlan` would save only
  * the union overhead; this plan already scales.
  *
  * Contract: right must be unique per (key, time) — pre-aggregate ties
  * (e.g. `max_by`) or matching is ambiguous (same as DuckDB ASOF).
  * Left/right payload column names must be disjoint.
  */
object AsOfJoin {

  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String): DataFrame =
    asOf(left, right, leftKey, leftTime, rightKey, rightTime, forward = false)

  /** Forward as-of: attach the right row with the SMALLEST
    * `rightTime >= leftTime` — "the next event after" (DuckDB spells it
    * `ASOF JOIN … ON right.t >= left.t`). Identical one-shuffle window
    * plan as [[leftAsOf]]; only the in-partition sort direction flips.
    */
  def leftAsOfForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String): DataFrame =
    asOf(left, right, leftKey, leftTime, rightKey, rightTime, forward = true)

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      forward: Boolean): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == rightKey || c == rightTime).toSeq

    val taggedLeft = rightPayload
      .foldLeft(
        left
          .withColumn("__k", col(leftKey))
          .withColumn("__t", col(leftTime))
          .withColumn("__side", lit(1))) { (df, c) =>
        df.withColumn(c, lit(null).cast(right.schema(c).dataType))
      }

    val taggedRight = left.columns.toSeq
      .foldLeft(
        right
          .withColumn("__k", col(rightKey))
          .withColumn("__t", col(rightTime))
          .withColumn("__side", lit(0))
          .drop(rightKey, rightTime)) { (df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val cols = (left.columns.toSeq ++ rightPayload ++ Seq("__k", "__t", "__side")).distinct
    val unioned = taggedLeft.select(cols.map(col): _*).unionByName(taggedRight.select(cols.map(col): _*))

    // right rows (side 0) sort before left rows at equal time ⇒ "at or
    // before" (backward) / "at or after" (forward) semantics;
    // last(ignoreNulls) carries the nearest qualifying payload
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__k", "__t", "__side")
  }
}
