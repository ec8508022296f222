package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.RefPipelines

/** Observability side of the watermark contract: the engine's own
  * progress metrics must account for the rows the watermark discards —
  * the streaming twin of the batch `latenessAudit` report.
  */
class WatermarkMetricsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, hour: Int, min: Int, value: Double): Ev =
    Ev(id, java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00"),
      id % 25, "purchase", value, s"""{"k": ${value.toInt}}""")

  test("numRowsDroppedByWatermark counts exactly the late rows the windows never saw") {
    val input = MemoryStream[Ev]
    val agg = RefPipelines.hourlyAvgRevenue(input.toDF().withWatermark("ts", "60 minutes"))
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("wm_metrics")
      .option("checkpointLocation", Files.createTempDirectory("graft-wm").toString)
      .start()
    try {
      // establish event time up to 05:00 → watermark 04:00
      input.addData(ev(1, 0, 10, 10.0), ev(2, 5, 0, 20.0))
      q.processAllAvailable()

      // three stragglers behind the watermark, one on-time row
      input.addData(ev(3, 1, 30, 5.0), ev(4, 2, 45, 5.0), ev(5, 3, 15, 5.0), ev(6, 5, 30, 30.0))
      q.processAllAvailable()

      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsDroppedByWatermark)
        .sum
      assert(dropped == 3L, s"expected exactly the 3 late rows, saw $dropped")

      // and the dropped rows must not have opened/weighted any window:
      // finalize everything and check hour-1..3 windows never appear
      input.addData(ev(7, 9, 0, 1.0))
      q.processAllAvailable()
      val hours = spark.table("wm_metrics").collect().map(_.getAs[String]("hour")).toSet
      assert(!hours.contains("01:00:00") && !hours.contains("02:00:00") && !hours.contains("03:00:00"),
        s"late rows materialized windows: $hours")
    } finally q.stop()
  }
}
