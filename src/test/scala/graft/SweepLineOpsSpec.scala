package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Round-3 continuation: interval union, sweep-line concurrency, local
  * peaks — brute-force recomputation on sf0.001.
  */
class SweepLineOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def eventTimes: Seq[(Long, Long, Long)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), expr("CAST(ts AS LONG)").as("s"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Long]("s")))
      .toSeq

  test("intervalUnion merges overlapping per-user activity windows") {
    val got = Analytics.intervalUnion(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_islands"), r.getAs[Long]("covered_sec"), r.getAs[Long]("longest_sec")))
      .toMap
    for ((u, es) <- eventTimes.groupBy(_._1)) {
      val ivs = es.map(e => (e._3 - 900, e._3 + 900)).sortBy(identity)
      // merge
      val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
        case (acc @ ((s0, e0) :: t), (s, e)) if s <= e0 => (s0, math.max(e0, e)) :: t
        case (acc, iv) => iv :: acc
      }.reverse
      val (n, cov, longest) = got(u)
      assert(n == merged.length.toLong, u)
      assert(cov == merged.map { case (s, e) => e - s }.sum, u)
      assert(longest == merged.map { case (s, e) => e - s }.max, u)
    }
    // somewhere in the corpus two activity windows actually merged
    val totalEvents = eventTimes.length.toLong
    assert(got.values.map(_._1).sum < totalEvents, "no interval ever merged")
  }

  test("peakConcurrency equals a direct per-day sweep") {
    val got = Analytics.peakConcurrency(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("peak_concurrency"), r.getAs[Long]("n_points")))
      .toMap
    val pts = eventTimes.flatMap { case (_, id, s) =>
      Seq((s / 86400, s - 900, 1L, id), (s / 86400, s + 900, -1L, id))
    }
    for ((d, ps) <- pts.groupBy(_._1)) {
      val ordered = ps.sortBy(p => (p._2, p._3, p._4))
      val running = ordered.scanLeft(0L)((acc, p) => acc + p._3).tail
      assert(got(d) == ((running.max, ps.length.toLong)), d)
    }
    assert(got.keySet == pts.map(_._1).toSet)
    assert(got.values.exists(_._1 > 1L), "some day should see true concurrency")
  }

  test("localPeaks flags strict maxima over two neighbors each side") {
    val got = Analytics.localPeaks(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("hour") -> r.getAs[Long]("cnt"))
      .toMap
    val series = eventTimes.map(_._3 / 3600)
      .groupBy(identity).toSeq.map { case (h, rs) => (h, rs.length.toLong) }
      .sortBy(_._1)
    val expected = series.indices.flatMap { i =>
      if (i >= 2 && i + 2 < series.length) {
        val c = series(i)._2
        if (c > series(i - 1)._2 && c > series(i - 2)._2 &&
          c > series(i + 1)._2 && c > series(i + 2)._2)
          Some(series(i)._1 -> c)
        else None
      } else None
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty, "the fixture series should contain peaks")
  }
}
