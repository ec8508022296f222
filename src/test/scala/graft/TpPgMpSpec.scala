package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Turning points, periodogram at period 7, matrix profile — driver
  * recomputation on sf0.001.
  */
class TpPgMpSpec extends AnyFunSuite {
  import SparkTestSession._

  private def daily(): IndexedSeq[(Long, Long)] =
    Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .toIndexedSeq

  test("turningPoints counts strict local extrema with exact null moments") {
    val ys = daily().map(_._2)
    val t = (1 until ys.length - 1).count(i =>
      (ys(i) - ys(i - 1)) * (ys(i + 1) - ys(i)) < 0).toLong
    val n = ys.length.toLong
    val row = Analytics.turningPoints(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("t_stat") == t)
    val e = 2.0 * (n - 2) / 3.0
    assert(math.abs(row.getAs[Double]("e_t") - e) < 1e-12)
    assert(math.abs(row.getAs[Double]("z") - (t - e) / math.sqrt((16.0 * n - 29) / 90.0)) < 1e-9)
  }

  test("periodogram7 equals the driver DFT at the weekly frequency") {
    val ds = daily()
    val n = ds.length
    var a = 0.0; var b = 0.0
    for ((d, y) <- ds) {
      val r = (d % 7).toInt
      a += y.toDouble * Analytics.cos7(r).toDouble
      b += y.toDouble * Analytics.sin7(r).toDouble
    }
    val row = Analytics.periodogram7(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == n.toLong)
    assert(math.abs(row.getAs[Double]("a_re") - a) < math.abs(a).max(1.0) * 1e-9)
    assert(math.abs(row.getAs[Double]("b_im") - b) < math.abs(b).max(1.0) * 1e-9)
    val p7 = (a * a + b * b) / n
    assert(math.abs(row.getAs[Double]("power7") - p7) < math.abs(p7) * 1e-9)
    val mean = ds.map(_._2).sum.toDouble / n
    val css = ds.map(x => x._2.toDouble * x._2).sum - mean * ds.map(_._2).sum.toDouble
    assert(math.abs(row.getAs[Double]("share7") - p7 / css) < 1e-9)
  }

  test("matrixProfile nearest matches agree with the brute-force z-norm distances") {
    val ys = daily().map(_._2)
    val n = ys.length
    val wins = (0 to n - 5).map(i => ys.slice(i, i + 5))
    def stats(w: Seq[Long]): (Double, Double) = {
      val m = w.sum.toDouble / 5.0
      (m, math.sqrt(w.map(x => x.toDouble * x).sum / 5.0 - m * m))
    }
    def d2(i: Int, j: Int): Double = {
      val (mi, si) = stats(wins(i)); val (mj, sj) = stats(wins(j))
      val dot = wins(i).zip(wins(j)).map { case (x, y) => x * y }.sum.toDouble
      10.0 * (1.0 - ((dot / 5.0 - mi * mj) / (si * sj)))
    }
    val rows = Analytics.matrixProfile(Tables.events(spark, sfDir)).orderBy("day_idx").collect()
    assert(rows.length == wins.length)
    for (row <- rows) {
      val i = row.getAs[Long]("day_idx").toInt - 1
      val candidates = wins.indices.filter(j => math.abs(j - i) > 2)
      val best = candidates.minBy(j => (d2(i, j), j))
      assert(row.getAs[Long]("match_idx").toInt - 1 == best, s"window $i")
      val expDist = math.sqrt(math.max(d2(i, best), 0.0))
      assert(math.abs(row.getAs[Double]("mp_dist") - expDist) < 1e-9)
    }
  }
}
