package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Round-3 continuation: rolling median/p90, log₂ histogram, velocity
  * burst screen, quartile segment shift, inter-arrival stats —
  * brute-force recomputation on sf0.001.
  */
class BurstOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  // interpolated percentile in the WEIGHTED two-product form
  // lo·(hi_pos−pos) + hi·(pos−lo_pos) — bit-identical to both Spark's
  // percentile and DuckDB's quantile_cont (the lerp form differs in ulps)
  private def pct(sorted: Seq[Long], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo).toDouble
    else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }

  test("rollingMedian matches a sliding-frame percentile recomputation") {
    val got = Analytics.rollingMedian(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("hour") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("med"), r.getAs[Double]("p90")))
      .toMap
    val series = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS LONG) div 3600").as("h")).collect()
      .map(_.getAs[Long]("h"))
      .groupBy(identity).toSeq.map { case (h, rs) => (h, rs.length.toLong) }
      .sortBy(_._1)
    series.zipWithIndex.foreach { case ((h, cnt), i) =>
      val frame = series.slice(math.max(0, i - 23), i + 1).map(_._2).sorted
      assert(got(h)._1 == cnt, h)
      assert(got(h)._2 == pct(frame, 0.5), h)
      assert(got(h)._3 == pct(frame, 0.9), h)
    }
  }

  test("logHistogram bins by bit length of the cents value") {
    val got = Analytics.logHistogram(Tables.lineitem(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"),
          r.getAs[Long]("sum_cents")))
      .toMap
    val cents = Tables.lineitem(spark, sfDir)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c")).collect()
      .map(_.getAs[Long]("c"))
    val expected = cents.groupBy(c => (63 - java.lang.Long.numberOfLeadingZeros(c)).toLong)
      .map { case (b, cs) => b -> (cs.length.toLong, cs.min, cs.max, cs.sum) }
    assert(got == expected)
    // every bin's extrema live inside the power-of-two span
    for ((b, (_, lo, hi, _)) <- got) {
      assert(lo >= (1L << b) && hi < (1L << (b + 1)), b)
    }
  }

  test("velocityScreen reports each user's max trailing-day burst") {
    val got = Analytics.velocityScreen(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("max_burst"), r.getAs[Long]("flagged")))
      .toMap
    val byUser = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("s")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s")))
      .groupBy(_._1)
    for ((u, rows) <- byUser) {
      val ts = rows.map(_._2).sorted
      val burst = ts.map(t => ts.count(x => x >= t - 86399 && x <= t).toLong).max
      assert(got(u) == ((ts.length.toLong, burst, if (burst >= 8) 1L else 0L)), u)
    }
    assert(got.values.exists(_._3 == 1L), "some user should be flagged")
    assert(got.values.exists(_._3 == 0L), "not every user should be flagged")
  }

  test("segmentShift matrix counts week0 -> week3 quartile migrations") {
    val got = Analytics.segmentShift(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("q_from"), r.getAs[Long]("q_to")) -> r.getAs[Long]("n_users"))
      .toMap
    val weekly = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG) div 604800").as("w"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => ((r.getAs[Long]("user_id"), r.getAs[Long]("w")), r.getAs[Long]("c")))
      .groupBy(_._1).map { case ((u, w), rs) => (u, w, rs.map(_._2).sum) }.toSeq
    val w0 = weekly.map(_._2).min
    def quartiles(week: Long): Map[Long, Long] = {
      val rows = weekly.filter(_._2 == week).sortBy(r => (r._3, r._1))
      val n = rows.length
      // ntile(4): first (n mod 4) buckets get ceil(n/4) rows
      rows.zipWithIndex.map { case ((u, _, _), i) =>
        val q = n % 4
        val big = n / 4 + 1
        val tile =
          if (i < q * big) i / big + 1
          else q + (i - q * big) / (n / 4) + 1
        u -> tile.toLong
      }.toMap
    }
    val (from, to) = (quartiles(w0), quartiles(w0 + 3))
    val expected = from.keySet.intersect(to.keySet).toSeq
      .map(u => (from(u), to(u)))
      .groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    assert(got == expected)
    assert(got.values.sum > 0)
  }

  test("interArrival percentiles match per-user-type gap recomputation") {
    val got = Analytics.interArrival(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Long]("min_gap"), r.getAs[Double]("p50_gap"),
          r.getAs[Double]("p90_gap"), r.getAs[Long]("max_gap")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("CAST(ts AS LONG)").as("s"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("event_id"), r.getAs[Long]("s")))
    val gaps = rows.groupBy(r => (r._1, r._2)).values.flatMap { series =>
      val sorted = series.toSeq.sortBy(r => (r._4, r._3))
      sorted.zip(sorted.tail).map { case (a, b) => (a._2, b._4 - a._4) }
    }.toSeq
    for ((t, g) <- gaps.groupBy(_._1)) {
      val vs = g.map(_._2).sorted
      val (n, mn, p50, p90, mx) = got(t)
      assert(n == vs.length.toLong, t)
      assert(mn == vs.min && mx == vs.max, t)
      assert(p50 == pct(vs, 0.5) && p90 == pct(vs, 0.9), t)
    }
  }
}
