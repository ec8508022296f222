package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Hodges–Lehmann pseudo-median, rescaled-range R/S, Friedman/Page block
  * rank tests — brute-force driver recomputation on sf0.001.
  */
class HlRsFriedmanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def dailyCents(): IndexedSeq[(Long, Long)] =
    Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .toIndexedSeq

  test("hodgesLehmann equals the exact median of all Walsh averages") {
    val ys = dailyCents().map(_._2)
    val sums = for (i <- ys.indices; j <- i until ys.length) yield ys(i) + ys(j)
    val sorted = sums.sorted
    val m = sorted.length
    val v1 = sorted((m + 1) / 2 - 1)
    val v2 = sorted((m + 2) / 2 - 1)
    val row = Analytics.hodgesLehmann(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == ys.length.toLong)
    assert(row.getAs[Long]("m_pairs") == m.toLong)
    assert(row.getAs[Long]("hl_x4") == v1 + v2)
    assert(math.abs(row.getAs[Double]("hl_dollars") - (v1 + v2) / 400.0) < 1e-9)
  }

  test("rescaledRange matches a driver fold over the prefix deviations") {
    val ys = dailyCents().map(_._2)
    val n = ys.length.toLong
    val t = ys.sum
    val prefixes = ys.scanLeft(0L)(_ + _).tail
    val zs = prefixes.zipWithIndex.map { case (p, i) => n * p - (i + 1) * t }
    val rScaled = math.max(zs.max, 0L) - math.min(zs.min, 0L)
    val sxx = ys.map(y => y * y).sum
    val sigma = math.sqrt(sxx.toDouble / n - (t.toDouble / n) * (t.toDouble / n))
    val row = Analytics.rescaledRange(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("r_scaled") == rScaled)
    assert(math.abs(row.getAs[Double]("sigma") - sigma) < 1e-9 * sigma)
    // R = rScaled / n (z is the n-scaled centred prefix sum), R/S = R/sigma
    assert(math.abs(row.getAs[Double]("rs_stat") - rScaled.toDouble / n / sigma) < 1e-9 * (rScaled.toDouble / n / sigma))
  }

  test("friedmanPage ranks complete blocks and recovers the integer rank sums") {
    val cells = Tables.events(spark, sfDir)
      .selectExpr(
        "CAST(ts AS LONG) div 86400 AS d",
        "event_type",
        "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d", "event_type").sum("c")
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
      .toMap
    val types = cells.keys.map(_._2).toSeq.distinct.sorted
    val k = types.length
    val days = cells.keys.map(_._1).toSeq.distinct
      .filter(d => types.forall(t => cells.contains((d, t))))
    val rj = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (d <- days) {
      val ordered = types.map(t => (cells((d, t)), t)).sorted
      for ((tup, idx) <- ordered.zipWithIndex) rj(tup._2) += (idx + 1).toLong
    }
    val n = days.length.toLong
    val sumR2 = types.map(t => rj(t) * rj(t)).sum
    val pageL = types.zipWithIndex.map { case (t, i) => (i + 1).toLong * rj(t) }.sum
    val expectStat =
      (12L * sumR2).toDouble / (n * k * (k + 1)).toDouble - (3L * n * (k + 1)).toDouble
    val row = Analytics.friedmanPage(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_blocks") == n)
    assert(row.getAs[Long]("k_treatments") == k.toLong)
    assert(row.getAs[Long]("sum_r2") == sumR2)
    assert(row.getAs[Long]("page_l") == pageL)
    assert(math.abs(row.getAs[Double]("friedman_stat") - expectStat) < 1e-9)
  }
}
