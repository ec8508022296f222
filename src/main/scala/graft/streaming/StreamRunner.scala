package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.{RefPipelines, Stages}

/** The reference `main()` rebuilt (SURVEY.md §3.1,
  * `spark_streaming.py:340-360`): ONE typed source stream fans out into
  * SIX concurrent streaming queries, each with its own checkpoint dir and
  * a shared `foreachBatch` sink; detectors additionally alert.
  *
  * Semantics preserved (SURVEY.md §2.9):
  *  - append output mode on ALL queries — windowed aggregations emit each
  *    window exactly once, only after the 60-minute watermark passes its
  *    end (finalized windows);
  *  - detectors and the full-table copy carry NO watermark — every row,
  *    however late, is processed;
  *  - at-least-once into sinks (append per epoch, no dedup);
  *  - per-query checkpoints ⇒ each query re-reads the source with its own
  *    offsets.
  *
  * Detector analogs on the events stream: the duration detector becomes a
  * value-range violation (F1), the fee detector a discrepancy between
  * `value` and the payload's claimed amount `props.k` (F2) — same derived
  * column + violation-filter + count + alert shape as
  * `spark_streaming.py:155-239`.
  */
final class StreamRunner(
    spark: SparkSession,
    sink: BatchSink,
    alerter: Alerter,
    checkpointRoot: String,
    watermark: String = "60 minutes",
    trigger: Option[Trigger] = None,
    // dimension snapshot for the stream-static lookup join; the env var
    // is the fallback, not the only channel — StreamMain passes its
    // [dimDir] argument through here
    dimDir: String = sys.env.getOrElse("GRAFT_DIM_DIR", "/root/testdata/sf0.001")) {

  /** foreachBatch writer shared by all queries (K2). The reference
    * computes each detector batch twice (count + write, no cache —
    * SURVEY.md §3.2); we persist the batch once instead: same results,
    * one plan execution.
    */
  private def sinkTo(table: String, alertOnRows: Boolean = false)(df: DataFrame): StreamingQuery = {
    val base = df.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointRoot/$table")
    trigger
      .fold(base)(base.trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (alertOnRows) {
          batch.persist()
          try {
            val n = batch.count()
            sink.write(batch, epochId, table)
            // alert AFTER the write lands: a failed write replays the
            // whole epoch, and alerting first would send one alert per
            // retry (a crash between write and alert can still repeat
            // the alert on replay — the at-least-once contract)
            if (n > 0) alerter.alert(s"$table violations", s"epoch $epochId: $n rows")
          } finally {
            // unpersist on the failure path too, or every retry pins
            // another orphaned cached batch in executor storage
            batch.unpersist()
            ()
          }
        } else sink.write(batch, epochId, table)
      }
      .queryName(table)
      .start()
  }

  /** Detector 1 analog: value outside [lo, hi] (reference
    * `spark_streaming.py:155-193`).
    */
  def abnormalValue(events: DataFrame, lo: Double = 1.0, hi: Double = 120.0): DataFrame =
    events
      .filter(Stages.rangeViolation(col("value"), lo, hi))
      .select(
        col("event_id"),
        col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_time"),
        round(col("value"), 2).as("value"))

  /** Detector 2 analog: payload-claimed amount vs actual value
    * discrepancy-or-null (reference `spark_streaming.py:196-239`).
    */
  def abnormalDiscrepancy(events: DataFrame, threshold: Double = 100.0): DataFrame =
    events
      .withColumn(
        "caculated_value",
        // try_cast: a non-numeric claimed amount must flow through the
        // discrepancy-or-null predicate as NULL (the reference's
        // non-ANSI semantics) — a plain cast under this build's ANSI
        // default would throw on the first dirty record and crash-loop
        // the detector from its checkpoint
        get_json_object(col("props"), "$.k").try_cast(org.apache.spark.sql.types.DoubleType))
      .filter(Stages.discrepancyOrNull(col("value"), col("caculated_value"), threshold))
      .select(
        col("event_id"),
        col("user_id"),
        round(col("value"), 2).as("value"),
        col("caculated_value"))

  private def watermarked(events: DataFrame): DataFrame =
    events.withWatermark("ts", watermark)

  /** Start all six queries (the reference's fan-out, `:348-353`). */
  def startAll(events: DataFrame): Seq[StreamingQuery] = Seq(
    sinkTo("events_full")(RefPipelines.fullTable(events)),
    sinkTo("abnormal_value", alertOnRows = true)(abnormalValue(events)),
    sinkTo("abnormal_discrepancy", alertOnRows = true)(abnormalDiscrepancy(events)),
    sinkTo("avg_revenue_per_hour")(RefPipelines.hourlyAvgRevenue(watermarked(events))),
    sinkTo("trip_count_per_hour")(RefPipelines.hourlyTripCount(watermarked(events))),
    sinkTo("trip_count_by_borough")(
      RefPipelines.hourlyCountByLookup(
        watermarked(events),
        graft.engine.Tables.nation(spark, dimDir))))

  /** Block until termination (reference `:355-360`). */
  def awaitAll(queries: Seq[StreamingQuery]): Unit = queries.foreach(_.awaitTermination())
}
