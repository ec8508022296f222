package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Cointegration, Mahalanobis outliers, weekly DTW — driver recomputation
  * on sf0.001.
  */
class CointMahalDtwSpec extends AnyFunSuite {
  import SparkTestSession._

  private def daily(): IndexedSeq[(Long, Long, Long)] =
    // (d, purchase cents, clicks)
    Tables.events(spark, sfDir)
      .selectExpr(
        "CAST(ts AS LONG) div 86400 AS d",
        "CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0L END AS p",
        "CASE WHEN event_type = 'click' THEN 1L ELSE 0L END AS c")
      .groupBy("d").sum("p", "c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
      .toIndexedSeq

  test("cointegration DF-t on residuals matches driver two-stage fit") {
    val ds = daily()
    val n = ds.length
    val xs = ds.map(_._3.toDouble); val ys = ds.map(_._2.toDouble)
    val mx = xs.sum / n; val my = ys.sum / n
    val cxx = xs.map(v => v * v).sum / n - mx * mx
    val cxy = xs.zip(ys).map { case (a, b) => a * b }.sum / n - mx * my
    val beta = cxy / cxx
    val alpha = my - beta * mx
    val es = ds.map { case (_, y, x) => math.round(y - (alpha + beta * x)) }
    val pairs = ds.zip(ds.tail).zipWithIndex.collect {
      case (((d1, _, _), (d2, _, _)), i) if d2 == d1 + 1 => (es(i).toDouble, (es(i + 1) - es(i)).toDouble)
    }
    val np = pairs.length
    val ml = pairs.map(_._1).sum / np; val md = pairs.map(_._2).sum / np
    val rxx = pairs.map(p => p._1 * p._1).sum / np - ml * ml
    val rxy = pairs.map(p => p._1 * p._2).sum / np - ml * md
    val ryy = pairs.map(p => p._2 * p._2).sum / np - md * md
    val g = rxy / rxx
    val t = g / math.sqrt(((ryy - g * rxy) * np / (np - 2)) / (np * rxx))
    val row = Analytics.cointegration(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_pairs") == np.toLong)
    assert(math.abs(row.getAs[Double]("coint_beta") - beta) < 1e-9 * math.abs(beta))
    assert(math.abs(row.getAs[Double]("eg_t_stat") - t) < 1e-6 * math.abs(t))
  }

  test("mahalanobisOutliers ranks the driver's top-10 squared distances") {
    val ds = daily()
    val n = ds.length
    val xs = ds.map(_._3.toDouble); val ys = ds.map(_._2.toDouble)
    val mx = xs.sum / n; val my = ys.sum / n
    val cxx = xs.map(v => v * v).sum / n - mx * mx
    val cxy = xs.zip(ys).map { case (a, b) => a * b }.sum / n - mx * my
    val cyy = ys.map(v => v * v).sum / n - my * my
    val det = cxx * cyy - cxy * cxy
    val scored = ds.map { case (d, y, x) =>
      val dx = x - mx; val dy = y - my
      (d, (cyy * dx * dx - 2 * cxy * dx * dy + cxx * dy * dy) / det)
    }
    val top = scored.sortBy { case (d, m) => (-m, d) }.take(10)
    val rows = Analytics.mahalanobisOutliers(Tables.events(spark, sfDir)).orderBy("rank").collect()
    assert(rows.length == 10)
    for ((row, i) <- rows.zipWithIndex) {
      assert(row.getAs[Long]("day_epoch") == top(i)._1, s"rank ${i + 1}")
      assert(math.abs(row.getAs[Double]("md2") - top(i)._2) < 1e-9 * top(i)._2.max(1e-9))
    }
  }

  test("dtwWeekly equals the classic quadratic DP on the per-mille profiles") {
    val prof = Tables.events(spark, sfDir)
      .selectExpr(
        "(CAST(ts AS LONG) div 86400) % 7 AS r",
        "CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0L END AS pa",
        "CASE WHEN event_type = 'click' THEN CAST(round(value * 100) AS BIGINT) ELSE 0L END AS pb")
      .groupBy("r").sum("pa", "pb")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val ta = prof.map(_._2).sum; val tb = prof.map(_._3).sum
    val as = prof.map(p => p._2 * 1000 / ta)
    val bs = prof.map(p => p._3 * 1000 / tb)
    val n = as.length
    val inf = 1000000000L
    val dp = Array.fill(n + 1, n + 1)(inf)
    dp(0)(0) = 0L
    for (i <- 1 to n; j <- 1 to n)
      dp(i)(j) = math.abs(as(i - 1) - bs(j - 1)) +
        Seq(dp(i - 1)(j - 1), dp(i - 1)(j), dp(i)(j - 1)).min
    val row = Analytics.dtwWeekly(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_buckets") == n.toLong)
    assert(row.getAs[Long]("dtw_permille") == dp(n)(n))
  }
}
