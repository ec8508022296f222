package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Dickey–Fuller, Granger F, mediation decomposition — driver
  * recomputation on sf0.001.
  */
class AdfGrangerMediationSpec extends AnyFunSuite {
  import SparkTestSession._

  private def dailySeries(): IndexedSeq[(Long, Long, Long, Long)] =
    // (d, purchase cents, clicks, views)
    Tables.events(spark, sfDir)
      .selectExpr(
        "CAST(ts AS LONG) div 86400 AS d",
        "CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0L END AS p",
        "CASE WHEN event_type = 'click' THEN 1L ELSE 0L END AS c",
        "CASE WHEN event_type = 'view' THEN 1L ELSE 0L END AS v")
      .groupBy("d").sum("p", "c", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
      .toIndexedSeq

  private def dailyRevenue(): IndexedSeq[(Long, Long)] =
    Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .toIndexedSeq

  test("dickeyFuller gamma and t-stat match the driver OLS") {
    val ds = dailyRevenue()
    val pairs = ds.zip(ds.tail).collect {
      case ((d1, y1), (d2, y2)) if d2 == d1 + 1 => (y1.toDouble, (y2 - y1).toDouble)
    }
    val n = pairs.length
    val mx = pairs.map(_._1).sum / n
    val my = pairs.map(_._2).sum / n
    val cxx = pairs.map(p => p._1 * p._1).sum / n - mx * mx
    val cxy = pairs.map(p => p._1 * p._2).sum / n - mx * my
    val cyy = pairs.map(p => p._2 * p._2).sum / n - my * my
    val gamma = cxy / cxx
    val s2 = (cyy - gamma * cxy) * n / (n - 2)
    val t = gamma / math.sqrt(s2 / (n * cxx))
    val row = Analytics.dickeyFuller(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_pairs") == n.toLong)
    assert(math.abs(row.getAs[Double]("gamma") - gamma) < 1e-9 * math.abs(gamma))
    assert(math.abs(row.getAs[Double]("t_stat") - t) < 1e-6 * math.abs(t))
    // a mean-reverting synthetic daily sum should give gamma < 0
    assert(row.getAs[Double]("gamma") < 0)
  }

  test("grangerF matches driver restricted/unrestricted RSS") {
    val ds = dailySeries()
    val triples = ds.zip(ds.tail).collect {
      case ((d1, p1, c1, _), (d2, p2, _, _)) if d2 == d1 + 1 =>
        (p1.toDouble, c1.toDouble, p2.toDouble)
    }
    val n = triples.length
    def mean(f: ((Double, Double, Double)) => Double) = triples.map(f).sum / n
    val ml = mean(_._1); val mx = mean(_._2); val my = mean(_._3)
    val cll = mean(t => t._1 * t._1) - ml * ml
    val clx = mean(t => t._1 * t._2) - ml * mx
    val cxx = mean(t => t._2 * t._2) - mx * mx
    val cly = mean(t => t._1 * t._3) - ml * my
    val cxy = mean(t => t._2 * t._3) - mx * my
    val cyy = mean(t => t._3 * t._3) - my * my
    val det = cll * cxx - clx * clx
    val b1 = (cly * cxx - cxy * clx) / det
    val b2 = (cll * cxy - clx * cly) / det
    val rssU = cyy - b1 * cly - b2 * cxy
    val rssR = cyy - cly * cly / cll
    val f = (rssR - rssU) * (n - 3) / rssU
    val row = Analytics.grangerF(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_triples") == n.toLong)
    assert(math.abs(row.getAs[Double]("b_lag") - b1) < 1e-6 * math.max(1.0, math.abs(b1)))
    assert(math.abs(row.getAs[Double]("b_click") - b2) < 1e-6 * math.max(1.0, math.abs(b2)))
    assert(math.abs(row.getAs[Double]("f_stat") - f) < 1e-6 * math.max(1.0, math.abs(f)))
    assert(rssU <= rssR + 1e-9) // adding a regressor can only reduce RSS
  }

  test("mediation satisfies total = direct + indirect exactly") {
    val row = Analytics.mediation(Tables.events(spark, sfDir)).collect().head
    val total = row.getAs[Double]("total_effect")
    val direct = row.getAs[Double]("direct_effect")
    val indirect = row.getAs[Double]("indirect_effect")
    assert(math.abs(total - (direct + indirect)) < 1e-9 * math.max(1.0, math.abs(total)))
    // cross-check a_path against a driver OLS of views on clicks
    val ds = dailySeries()
    val n = ds.length
    val mx = ds.map(_._3.toDouble).sum / n
    val mm = ds.map(_._4.toDouble).sum / n
    val cxx = ds.map(t => t._3.toDouble * t._3).sum / n - mx * mx
    val cxm = ds.map(t => t._3.toDouble * t._4).sum / n - mx * mm
    assert(math.abs(row.getAs[Double]("a_path") - cxm / cxx) < 1e-9)
  }
}
