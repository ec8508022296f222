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
  * window pass filling a single right-payload STRUCT with
  * `last(_, ignoreNulls)` over `(key, time, side)` order (one struct, not
  * per-column fills — the nearest right row must travel as a unit), keep
  * left rows. Cost: ONE shuffle on
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
    // All right payload rides in ONE struct so the nearest right ROW is
    // carried as a unit: per-column last(ignoreNulls) would resurrect an
    // OLDER row's value wherever the nearest row's field is genuinely
    // NULL, fabricating a combined row that never existed (e.g. a
    // purchase_id from one purchase with the p_cents of another). The
    // struct is non-null exactly on right rows, so ignoreNulls selects
    // the nearest right row and its NULL fields stay NULL — DuckDB ASOF
    // row semantics. Fields forced nullable so the left side's NULL
    // struct casts cleanly.
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(nullable = true)))

    val taggedLeft = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))

    val taggedRight = left.columns.toSeq
      .foldLeft(
        right
          .withColumn("__k", col(rightKey))
          .withColumn("__t", col(rightTime))
          .withColumn("__side", lit(0))
          .withColumn("__p", struct(rightPayload.map(col): _*))
          // a right row with an undefined key or time is never "at or
          // before/after" anything (SQL join semantics: NULL matches
          // nothing) — without this filter a NULL-time right row sorts
          // to one end of the partition and leaks its payload
          .filter(col("__k").isNotNull && col("__t").isNotNull)
          .drop(rightKey +: rightTime +: rightPayload: _*)) { (df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val cols = (left.columns.toSeq ++ Seq("__k", "__t", "__side", "__p")).distinct
    val unioned = taggedLeft.select(cols.map(col): _*).unionByName(taggedRight.select(cols.map(col): _*))

    // right rows (side 0) sort before left rows at equal time ⇒ "at or
    // before" (backward) / "at or after" (forward) semantics;
    // last(ignoreNulls) carries the nearest qualifying payload struct.
    // Left rows with NULL key/time get NO match outright — NULLs sort to
    // a deterministic end of the partition (FIRST under asc, LAST under
    // desc), so under forward order an unguarded NULL-time left row
    // would otherwise swallow the smallest-time right row's payload.
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn(
      "__p",
      when(col("__k").isNotNull && col("__t").isNotNull,
        last(col("__p"), ignoreNulls = true).over(w)))
    val unpacked = rightPayload.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("__p").getField(c))
    }
    unpacked.filter(col("__side") === 1).drop("__k", "__t", "__side", "__p")
  }
}
