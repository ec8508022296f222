package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Round-3 continuation: ACF ladder, skewness/kurtosis, weighted OLS —
  * brute-force recomputation on sf0.001.
  */
class AcfSkewWlsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("acfLadder is the integer-demeaned autocorrelation at each lag") {
    val rows = Analytics.acfLadder(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("lag") -> (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf")))
      .toMap
    val daily = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS LONG) div 86400").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = daily.size
    val s = daily.values.sum
    val e = daily.view.mapValues(y => n * y - s).toMap
    val see = e.values.map(v => v * v).sum
    (1L to 7L).foreach { lag =>
      val pairs = e.keys.toSeq.filter(d => e.contains(d + lag)).map(d => e(d) * e(d + lag))
      assert(rows(lag)._1 == pairs.length, s"lag $lag")
      assert(math.abs(rows(lag)._2 - pairs.sum.toDouble / see) < 1e-12, s"lag $lag")
      assert(math.abs(rows(lag)._2) <= 1.0 + 1e-9)
    }
    assert(rows.size == 7)
  }

  test("skewKurtosis matches the central-moment formulas per type") {
    val rows = Analytics.skewKurtosis(Tables.events(spark, sfDir)).collect()
    val data = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(x => (x.getString(0), math.round(x.getDouble(1)).toDouble))
    rows.foreach { r =>
      val g = data.filter(_._1 == r.getAs[String]("event_type")).map(_._2)
      val n = g.length.toDouble
      val mu = g.sum / n
      val m2 = g.map(y => (y - mu) * (y - mu)).sum / n
      val m3 = g.map(y => math.pow(y - mu, 3)).sum / n
      val m4 = g.map(y => math.pow(y - mu, 4)).sum / n
      assert(r.getAs[Long]("n") == g.length)
      assert(math.abs(r.getAs[Double]("mean_dollars") - mu) < 1e-9)
      assert(math.abs(r.getAs[Double]("skewness") - m3 / (m2 * math.sqrt(m2))) < 1e-6)
      assert(math.abs(r.getAs[Double]("excess_kurtosis") - (m4 / (m2 * m2) - 3)) < 1e-6)
    }
    assert(rows.length == 5)
    // dollar values are right-skewed (lognormal-ish fixture)
    assert(rows.forall(_.getAs[Double]("skewness") > 0))
  }

  test("weightedLinreg solves the weighted normal equations") {
    val r = Analytics.weightedLinreg(Tables.lineitem(spark, sfDir)).collect().head
    val data = Tables.lineitem(spark, sfDir)
      .select(expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100").as("y"))
      .collect().map(t => (t.getLong(0).toDouble, t.getLong(1).toDouble))
    val sw = data.map(_._1).sum
    val mx = data.map(t => t._1 * t._1).sum / sw
    val my = data.map(t => t._1 * t._2).sum / sw
    val varX = data.map(t => t._1 * t._1 * t._1).sum / sw - mx * mx
    val cov = data.map(t => t._1 * t._1 * t._2).sum / sw - mx * my
    val slope = cov / varX
    val intercept = my - slope * mx
    assert(r.getAs[Long]("n") == data.length)
    assert(r.getAs[Long]("sw") == sw.toLong)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-6)
    assert(math.abs(r.getAs[Double]("intercept") - intercept) < 1e-3)
    // the fixture draws price independent of quantity, so the weighted
    // fit must land near the unweighted one (both ~flat), not explode
    assert(math.abs(r.getAs[Double]("slope")) < 1e3)
    assert(r.getAs[Double]("intercept") > 0)
  }
}
