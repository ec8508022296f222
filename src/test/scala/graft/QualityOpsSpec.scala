package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Round-3 data-quality batch: the multi-rule audit, the
  * watermark-lateness report, Tukey IQR fences, equal-frequency decile
  * stats, and the Lorenz curve — each checked against a brute-force
  * driver-side recomputation on sf0.001.
  */
class QualityOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def eventRows =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"), col("event_type"),
        expr("CAST(ts AS LONG)").as("ts_sec"),
        col("value"), col("props"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("ts_sec"), r.getAs[Double]("value"), r.getAs[String]("props")))

  test("ruleViolations emits one row per rule with exact counts") {
    val got = Relational.ruleViolations(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_violations"), r.getAs[Long]("n_rows"), r.getAs[Double]("violation_rate")))
      .toMap
    val rows = eventRows
    val n = rows.length.toLong
    val expected = Map(
      "null_value" -> rows.count(_._1 % 7 == 0).toLong,
      "out_of_range" -> rows.count(r => r._4 < 0.05 || r._4 > 400.0).toLong,
      "unknown_type" -> rows.count(r => !Set("click", "view", "purchase", "signup")(r._2)).toLong,
      "stale_ts" -> rows.count(_._3 < 1704153600L).toLong,
      "malformed_props" -> rows.count(r => !r._5.matches("\\{\"k\": [0-9]+\\}")).toLong)
    assert(got.keySet == expected.keySet)
    for ((rule, exp) <- expected) {
      assert(got(rule)._1 == exp, rule)
      assert(got(rule)._2 == n)
      assert(got(rule)._3 == exp.toDouble / n)
    }
    // at least one rule actually fires on the fixture, or the audit is untestable
    assert(expected.values.sum > 0)
  }

  test("latenessAudit matches a sequential watermark replay") {
    val got = Analytics.latenessAudit(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_late"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("max_late_sec"), r.getAs[Long]("late_sec_sum")))
      .toMap
    val rows = eventRows.map { r =>
      val shift =
        if (r._1 % 13 == 0) 21600L else if (r._1 % 97 == 0) 86400L else 0L
      r.copy(_3 = r._3 - shift)
    }
    val batchMax = rows.groupBy(_._1 / 250).map { case (b, rs) => b -> rs.map(_._3).max }
    val sortedBatches = batchMax.keys.toSeq.sorted
    val watermark: Map[Long, Option[Long]] = sortedBatches.zipWithIndex.map { case (b, i) =>
      b -> (if (i == 0) None else Some(sortedBatches.take(i).map(batchMax).max))
    }.toMap
    val late = rows.map { r =>
      val wm = watermark(r._1 / 250)
      (r._2, wm.map(w => math.max(w - r._3, 0L)).getOrElse(0L))
    }
    val expected = late.groupBy(_._1).map { case (t, rs) =>
      val ls = rs.map(_._2)
      t -> (rs.length.toLong, ls.count(_ > 3600L).toLong, ls.count(_ > 7200L).toLong, ls.max, ls.sum)
    }
    assert(got == expected)
    // the fixture must exercise actual lateness for the audit to mean anything
    assert(got.values.map(_._2).sum > 0)
  }

  test("iqrOutliers flags exactly the rows outside the Tukey fences") {
    val got = Analytics.iqrOutliers(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_outliers"), r.getAs[Long]("outlier_cents"),
          r.getAs[Double]("q1"), r.getAs[Double]("q3")))
      .toMap
    // interpolated percentile in the weighted two-product form both
    // Spark percentile and DuckDB quantile_cont evaluate
    def pct(sorted: Array[Long], q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) sorted(lo).toDouble
      else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
    }
    val byType = eventRows.groupBy(_._2)
    for ((t, rs) <- byType) {
      val cents = rs.map(r => math.round(r._4 * 100))
      val sorted = cents.sorted
      val (q1, q3) = (pct(sorted, 0.25), pct(sorted, 0.75))
      val (lo, hi) = (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
      val out = cents.filter(c => c < lo || c > hi)
      val (gn, gout, gcents, gq1, gq3) = got(t)
      assert(gn == rs.length.toLong, t)
      assert(gout == out.length.toLong, t)
      assert(gcents == out.sum, t)
      assert(gq1 == q1 && gq3 == q3, t)
    }
  }

  test("decileStats buckets are the arithmetic equal-frequency partition of the rank") {
    val got = Analytics.decileStats(Tables.orders(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"),
          r.getAs[Long]("decile_cents")))
      .toMap
    val cents = Tables.orders(spark, sfDir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"), col("o_orderkey"))
      .collect()
      .map(r => (r.getAs[Long]("c"), r.getAs[Long]("o_orderkey")))
      .sorted
    val n = cents.length.toLong
    val expected = cents.zipWithIndex
      .map { case ((c, _), i) => (i.toLong * 10 / n + 1, c) }
      .groupBy(_._1)
      .map { case (d, rs) =>
        val cs = rs.map(_._2)
        d -> (rs.length.toLong, cs.min, cs.max, cs.sum)
      }
    assert(got == expected)
    assert(got.keySet == (1L to 10L).toSet)
    // equal-frequency: bucket sizes differ by at most one
    val sizes = got.values.map(_._1)
    assert(sizes.max - sizes.min <= 1)
  }

  test("lorenzCurve cumulative shares are monotone and end at exactly 1.0") {
    val rows = Analytics.lorenzCurve(Tables.events(spark, sfDir)).orderBy("decile").collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last == 1.0)
    // bucket totals agree with a per-user brute force
    val users = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("c")))
      .groupBy(_._1).map { case (u, rs) => (rs.map(_._2).sum, u) }
      .toArray.sorted
    val n = users.length.toLong
    val expected = users.zipWithIndex
      .map { case ((x, _), i) => (i.toLong * 10 / n + 1, x) }
      .groupBy(_._1).map { case (d, rs) => d -> (rs.length.toLong, rs.map(_._2).sum) }
    val gotBuckets = rows
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("decile_cents")))
      .toMap
    assert(gotBuckets == expected)
  }
}
