package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Stateful

/** [[Stateful.patternMatchStream]]: the sliding integer-distance emission,
  * ring-buffer state carrying ACROSS micro-batches, and per-key isolation.
  */
class PatternStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, sec: Int, v: Double, typ: String = "purchase"): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"), id, typ, v, "{}")

  test("emits exact sliding distances; ring state survives the batch boundary") {
    val input = MemoryStream[Ev]
    // pattern = [100, 200, 300] cents
    val hits = Stateful.patternMatchStream(spark, input.toDF(), Seq(100L, 200L, 300L))
    val q = hits.writeStream.outputMode("append").format("memory")
      .queryName("pattern_hits")
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("pm").toString)
      .start()
    try {
      // batch 1: values 1.00, 2.00 — window never fills, nothing emits
      input.addData(ev(1, 1, 1.0), ev(2, 2, 2.0))
      q.processAllAvailable()
      assert(spark.table("pattern_hits").count() == 0)

      // batch 2: 3.00 completes [100,200,300] → dist 0; then 4.00 slides
      // to [200,300,400] → (100²+100²+100²)=30000
      input.addData(ev(3, 3, 3.0), ev(4, 4, 4.0))
      q.processAllAvailable()
      val out = spark.table("pattern_hits").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("dist2")).toMap
      assert(out == Map(3L -> 0L, 4L -> 30000L))

      // batch 3: another type has its OWN ring — no cross-key leakage
      input.addData(ev(5, 5, 3.0, typ = "view"))
      q.processAllAvailable()
      assert(spark.table("pattern_hits").count() == 2, "foreign key emitted from a 1-deep ring")
    } finally q.stop()
  }
}
