package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** PACF (Durbin–Levinson) and Ljung–Box — recomputed on sf0.001 from a
  * driver-side ACF over the daily series.
  */
class PacfLjungSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val daily: Seq[(Long, Long)] =
    Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .toSeq

  private def acf(maxLag: Int): (Long, Array[Double]) = {
    val n = daily.length.toLong
    val s = daily.map(_._2).sum
    val e = daily.map { case (d, y) => (d, n * y - s) }.toMap
    val see = e.values.map(v => v.toDouble * v).sum
    val r = (1 to maxLag).map { k =>
      val num = e.collect { case (d, v) if e.contains(d + k) => v.toDouble * e(d + k) }.sum
      num / see
    }.toArray
    (n, r)
  }

  test("pacf matches the Durbin–Levinson recursion over the driver ACF") {
    val (_, r) = acf(3)
    val p2 = (r(1) - r(0) * r(0)) / (1.0 - r(0) * r(0))
    val p21 = r(0) * (1.0 - p2)
    val p3 = (r(2) - p21 * r(1) - p2 * r(0)) / (1.0 - p21 * r(0) - p2 * r(1))
    val row = Analytics.pacf(Tables.events(spark, sfDir)).collect().head
    assert(math.abs(row.getAs[Double]("pacf1") - r(0)) < 1e-9)
    assert(math.abs(row.getAs[Double]("pacf2") - p2) < 1e-9)
    assert(math.abs(row.getAs[Double]("pacf3") - p3) < 1e-9)
  }

  test("ljungBox matches n(n+2) sum rk^2/(n-k) over the driver ACF") {
    val (n, r) = acf(7)
    val q = n.toDouble * (n + 2) *
      r.zipWithIndex.map { case (rk, i) => rk * rk / (n - (i + 1)) }.sum
    val row = Analytics.ljungBox(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(math.abs(row.getAs[Double]("q_lb") - q) < 1e-6)
  }
}
