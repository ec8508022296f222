package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Round-3 continuation: log-rank test, Durbin–Watson, Cook's distance —
  * brute-force recomputation on sf0.001.
  */
class LogrankDwCooksSpec extends AnyFunSuite {
  import SparkTestSession._

  test("logRankTest O-E and variance follow the hypergeometric per-day terms") {
    val r = Analytics.logRankTest(Tables.events(spark, sfDir)).collect().head
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("long").as("s"), col("event_type"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val maxS = evs.map(_._2).max
    val users = evs.groupBy(_._1).map { case (_, g) =>
      val (f, l) = (g.map(_._2).min, g.map(_._2).max)
      val grpA = 100L * g.count(_._3 == "error") >= 25L * g.size
      ((l - f) / 86400, l >= maxS - 86400, grpA)
    }.toSeq
    val (na, nb) = (users.count(_._3), users.count(!_._3))
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    val days = users.map(_._1).distinct.sorted
    var (oeSum, vSum, oa) = (0L, 0L, 0L)
    days.foreach { t =>
      val atRisk = users.filter(_._1 >= t)
      val (n1, n2) = (atRisk.count(_._3).toDouble, atRisk.count(!_._3).toDouble)
      val da = users.count(u => u._1 == t && !u._2 && u._3)
      val db = users.count(u => u._1 == t && !u._2 && !u._3)
      if (da + db > 0 && n1 + n2 > 1) {
        val d = (da + db).toDouble
        oa += da
        oeSum += math.round((da - d * n1 / (n1 + n2)) * 1e6)
        vSum += math.round(d * (n1 / (n1 + n2)) * (n2 / (n1 + n2)) *
          ((n1 + n2 - d) / (n1 + n2 - 1)) * 1e6)
      }
    }
    assert(r.getAs[Long]("o_a") == oa)
    assert(math.abs(r.getAs[Double]("o_minus_e") - oeSum / 1e6) < 1e-9)
    assert(math.abs(r.getAs[Double]("variance") - vSum / 1e6) < 1e-9)
    assert(math.abs(r.getAs[Double]("chi2") -
      (oeSum / 1e6) * (oeSum / 1e6) / (vSum / 1e6)) < 1e-9)
  }

  test("durbinWatson is the ratio of squared residual diffs to squared residuals") {
    val r = Analytics.durbinWatson(Tables.events(spark, sfDir)).collect().head
    val hours = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS LONG) div 3600").as("h"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val h0 = hours.map(_._1).min
    val xs = hours.map { case (h, c) => ((h - h0).toDouble, c.toDouble) }
    assert(r.getAs[Long]("n_hours") == xs.length)
    val n = xs.length
    val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val sxy = xs.map(t => t._1 * t._2).sum
    val sxx = xs.map(t => t._1 * t._1).sum
    val varX = sxx / n - (sx / n) * (sx / n)
    val slope = (sxy / n - (sx / n) * (sy / n)) / varX
    val intercept = sy / n - slope * (sx / n)
    val es = xs.map { case (x, y) => math.round(y - (slope * x + intercept)) }
    val sdd = es.zip(es.drop(1)).map { case (a, b) => (b - a) * (b - a) }.sum
    val see = es.map(e => e * e).sum
    assert(math.abs(r.getAs[Double]("dw") - sdd.toDouble / see) < 1e-12)
    // DW lives in [0, 4]
    assert(r.getAs[Double]("dw") > 0 && r.getAs[Double]("dw") < 4)
  }

  test("cooksDistanceTopK ranks by the leverage-weighted squared residual") {
    val rows = Analytics.cooksDistanceTopK(Tables.lineitem(spark, sfDir)).collect()
    assert(rows.length == 20)
    val data = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100").as("y"))
      .collect().map(t => (t.getLong(0), t.getInt(1), t.getAs[Long]("x"), t.getAs[Long]("y")))
    val n = data.length.toDouble
    val sx = data.map(_._3).sum.toDouble
    val sy = data.map(_._4).sum.toDouble
    val sxy = data.map(t => t._3 * t._4).sum.toDouble
    val sxx = data.map(t => t._3 * t._3).sum.toDouble
    val syy = data.map(t => t._4 * t._4).sum.toDouble
    val varX = sxx / n - (sx / n) * (sx / n)
    val varY = syy / n - (sy / n) * (sy / n)
    val cov = sxy / n - (sx / n) * (sy / n)
    val slope = cov / varX
    val intercept = sy / n - slope * (sx / n)
    val s2 = (varY - cov * cov / varX) * n / (n - 2)
    val scored = data.map { case (ok, ln, x, y) =>
      val e = y.toDouble - (slope * x + intercept)
      val h = 1.0 / n + (x - sx / n) * (x - sx / n) / (n * varX)
      (ok, ln, e * e / (2 * s2) * h / ((1 - h) * (1 - h)))
    }.sortBy(t => (-t._3, t._1, t._2)).take(20)
    rows.zip(scored).foreach { case (r, (ok, ln, d)) =>
      assert(r.getAs[Long]("l_orderkey") == ok && r.getAs[Int]("l_linenumber") == ln)
      assert(math.abs(r.getAs[Double]("cooks_d") - d) < 1e-9 * math.max(1.0, d))
    }
    // top D dominates the median row's influence
    assert(rows.head.getAs[Double]("cooks_d") > 0)
  }
}
