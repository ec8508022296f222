package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Round-3 continuation: Theil's U, segmented regression, cross-correlation
  * ladder — brute-force recomputation on sf0.001.
  */
class TheilSegCcfSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val hourly = Tables.events(spark, sfDir)
    .select(expr("CAST(ts AS LONG) div 3600").as("h"),
      expr("CAST(round(value * 100) AS BIGINT)").as("c"))
    .collect().map(x => (x.getLong(0), x.getLong(1)))
    .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  test("theilU compares seasonal-naive to persistence squared errors") {
    val r = Analytics.theilU(Tables.events(spark, sfDir)).collect().head
    val evals = hourly.keys.toSeq
      .filter(h => hourly.contains(h - 168) && hourly.contains(h - 1))
      .map(h => (hourly(h), hourly(h - 168), hourly(h - 1)))
    val ses = evals.map(t => (t._1 - t._2) * (t._1 - t._2)).sum
    val sep = evals.map(t => (t._1 - t._3) * (t._1 - t._3)).sum
    assert(r.getAs[Long]("n_eval") == evals.length)
    assert(r.getAs[Long]("se_seasonal") == ses)
    assert(r.getAs[Long]("se_persist") == sep)
    assert(math.abs(r.getAs[Double]("theil_u") - math.sqrt(ses.toDouble / sep)) < 1e-12)
  }

  test("segmentedRegression fits independent slopes around the median quantity") {
    val r = Analytics.segmentedRegression(Tables.lineitem(spark, sfDir)).collect().head
    val data = Tables.lineitem(spark, sfDir)
      .select(expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100").as("y"))
      .collect().map(t => (t.getLong(0), t.getLong(1)))
    val sorted = data.map(_._1).sorted
    val split = sorted(((sorted.length + 1) / 2 - 1).toInt)
    assert(r.getAs[Long]("x_split") == split)
    def slope(g: Array[(Long, Long)]): Double = {
      val n = g.length.toDouble
      val sx = g.map(_._1).sum.toDouble
      val sy = g.map(_._2).sum.toDouble
      val sxy = g.map(t => t._1 * t._2).sum.toDouble
      val sxx = g.map(t => t._1 * t._1).sum.toDouble
      (sxy / n - (sx / n) * (sy / n)) / (sxx / n - (sx / n) * (sx / n))
    }
    val lo = data.filter(_._1 <= split)
    val hi = data.filter(_._1 > split)
    assert(r.getAs[Long]("n_lo") == lo.length && r.getAs[Long]("n_hi") == hi.length)
    assert(math.abs(r.getAs[Double]("slope_lo") - slope(lo)) < 1e-6)
    assert(math.abs(r.getAs[Double]("slope_hi") - slope(hi)) < 1e-6)
    assert(math.abs(r.getAs[Double]("slope_diff") -
      (slope(hi) - slope(lo))) < 1e-6)
  }

  test("crossCorrelationLadder is the normalized integer cross-product per lag") {
    val rows = Analytics.crossCorrelationLadder(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("lag") -> (r.getAs[Long]("n_pairs"), r.getAs[Double]("ccf")))
      .toMap
    def daily(t: String) = Tables.events(spark, sfDir)
      .filter(col("event_type") === t)
      .select(expr("CAST(ts AS LONG) div 86400").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def demean(m: Map[Long, Long]): Map[Long, Long] = {
      val (n, s) = (m.size, m.values.sum)
      m.view.mapValues(y => n * y - s).toMap
    }
    val (ea, eb) = (demean(daily("purchase")), demean(daily("click")))
    val saa = ea.values.map(v => v * v).sum.toDouble
    val sbb = eb.values.map(v => v * v).sum.toDouble
    (-3L to 3L).foreach { lag =>
      val pairs = ea.keys.toSeq.filter(d => eb.contains(d + lag))
        .map(d => ea(d) * eb(d + lag))
      assert(rows(lag)._1 == pairs.length, s"lag $lag")
      assert(math.abs(rows(lag)._2 - pairs.sum.toDouble / math.sqrt(saa * sbb)) < 1e-12)
      assert(math.abs(rows(lag)._2) <= 1.0 + 1e-9)
    }
    assert(rows.size == 7)
  }
}
