package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** VAR(1), total-variation distance, pinball loss — driver recomputation
  * on sf0.001.
  */
class VarTvPinballSpec extends AnyFunSuite {
  import SparkTestSession._

  test("var1 coefficients solve the two normal-equation systems") {
    val ds = Tables.events(spark, sfDir)
      .selectExpr(
        "CAST(ts AS LONG) div 86400 AS d",
        "CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0L END AS p",
        "CASE WHEN event_type = 'click' THEN 1L ELSE 0L END AS c")
      .groupBy("d").sum("p", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val triples = ds.zip(ds.tail).collect {
      case ((d1, y1, x1), (d2, y2, x2)) if d2 == d1 + 1 =>
        (y1.toDouble, x1.toDouble, y2.toDouble, x2.toDouble)
    }
    val n = triples.length
    def mean(f: ((Double, Double, Double, Double)) => Double) = triples.map(f).sum / n
    val ml = mean(_._1); val mx = mean(_._2); val my = mean(_._3); val mz = mean(_._4)
    val cll = mean(t => t._1 * t._1) - ml * ml
    val clx = mean(t => t._1 * t._2) - ml * mx
    val cxx = mean(t => t._2 * t._2) - mx * mx
    val cyl = mean(t => t._1 * t._3) - ml * my
    val cyx = mean(t => t._2 * t._3) - mx * my
    val czl = mean(t => t._1 * t._4) - ml * mz
    val czx = mean(t => t._2 * t._4) - mx * mz
    val det = cll * cxx - clx * clx
    val a11 = (cyl * cxx - cyx * clx) / det
    val a12 = (cll * cyx - clx * cyl) / det
    val a21 = (czl * cxx - czx * clx) / det
    val a22 = (cll * czx - clx * czl) / det
    val row = Analytics.var1(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_triples") == n.toLong)
    for ((name, v) <- Seq("a11" -> a11, "a12" -> a12, "a21" -> a21, "a22" -> a22))
      assert(math.abs(row.getAs[Double](name) - v) < 1e-9 * math.max(1.0, math.abs(v)), name)
    val tr = a11 + a22; val dA = a11 * a22 - a12 * a21
    val disc = tr * tr - 4 * dA
    val radius =
      if (disc >= 0)
        math.max(math.abs((tr + math.sqrt(disc)) / 2), math.abs((tr - math.sqrt(disc)) / 2))
      else math.sqrt(dA)
    assert(math.abs(row.getAs[Double]("spectral_radius") - radius) < 1e-9)
    assert(row.getAs[Boolean]("stable") == (radius < 1.0))
  }

  test("tvDistance equals the exact rational half-L1 between hour profiles") {
    val hs = Tables.events(spark, sfDir)
      .filter("event_type IN ('purchase', 'click')")
      .selectExpr("(CAST(ts AS LONG) div 3600) % 24 AS h", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val c1 = hs.filter(_._2 == "purchase").groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val c2 = hs.filter(_._2 == "click").groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1 = c1.values.sum; val n2 = c2.values.sum
    val num = (c1.keySet ++ c2.keySet).toSeq
      .map(h => math.abs(c1.getOrElse(h, 0L) * n2 - c2.getOrElse(h, 0L) * n1)).sum
    val row = Analytics.tvDistance(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n1") == n1)
    assert(row.getAs[Long]("n2") == n2)
    assert(row.getAs[Long]("tv_num") == num)
    val tv = num.toDouble / (2.0 * n1 * n2)
    assert(math.abs(row.getAs[Double]("tv") - tv) < 1e-12)
    assert(tv >= 0.0 && tv <= 1.0)
  }

  test("pinballLoss is the exact tau=0.9 asymmetric score of seasonal-naive") {
    val ds = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val losses = ds.toSeq.flatMap { case (d, f) =>
      ds.get(d + 7).map { y => if (y >= f) 9 * (y - f) else f - y }
    }
    val row = Analytics.pinballLoss(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_eval") == losses.length.toLong)
    assert(row.getAs[Long]("loss10_total") == losses.sum)
    assert(math.abs(
      row.getAs[Double]("mean_pinball_dollars") - losses.sum.toDouble / losses.length / 1000.0) < 1e-9)
  }
}
