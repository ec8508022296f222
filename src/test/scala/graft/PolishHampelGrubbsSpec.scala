package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Median polish, Hampel filter, Grubbs statistic — driver recomputation
  * on sf0.001.
  */
class PolishHampelGrubbsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def dailyCents(): IndexedSeq[(Long, Long)] =
    Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .toIndexedSeq

  private def lowerMedL(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s((s.length + 1) / 2 - 1)
  }

  test("medianPolish effects match a driver two-iteration sweep") {
    val cells = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((d, y) <- dailyCents()) cells((d % 7, d / 7)) = y
    val a = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val b = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val r = cells.clone()
    for (_ <- 1 to 2) {
      for (i <- r.keys.map(_._1).toSeq.distinct) {
        val m = lowerMedL(r.collect { case ((ii, _), v) if ii == i => v }.toSeq)
        for (k <- r.keys.toSeq if k._1 == i) r(k) -= m
        a(i) += m
      }
      for (j <- r.keys.map(_._2).toSeq.distinct) {
        val m = lowerMedL(r.collect { case ((_, jj), v) if jj == j => v }.toSeq)
        for (k <- r.keys.toSeq if k._2 == j) r(k) -= m
        b(j) += m
      }
    }
    val rows = Analytics.medianPolish(Tables.events(spark, sfDir)).collect()
    val gotRow = rows.filter(_.getString(0) == "row_dow").map(r2 => (r2.getLong(1), r2.getLong(2))).toMap
    val gotCol = rows.filter(_.getString(0) == "col_week").map(r2 => (r2.getLong(1), r2.getLong(2))).toMap
    assert(gotRow == a.toMap)
    assert(gotCol == b.toMap)
  }

  test("hampelFilter rolling medians and MADs are the exact frame order stats") {
    val ys = dailyCents().map(_._2)
    val rows = Analytics.hampelFilter(Tables.events(spark, sfDir)).orderBy("day_epoch").collect()
    assert(rows.length == ys.length)
    for ((row, k) <- rows.zipWithIndex) {
      val frame = ys.slice(math.max(0, k - 3), math.min(ys.length, k + 4))
      val med = lowerMedL(frame)
      val mad = lowerMedL(frame.map(y => math.abs(y - med)))
      assert(row.getAs[Long]("med7") == med, s"day $k median")
      assert(row.getAs[Long]("mad7") == mad, s"day $k mad")
      assert(row.getAs[Boolean]("is_outlier") == (math.abs(ys(k) - med) > 3 * mad))
    }
  }

  test("grubbsOutlier picks the max studentized deviation day") {
    val ds = dailyCents()
    val n = ds.length
    val mean = ds.map(_._2).sum.toDouble / n
    // SAMPLE standard deviation (n−1), the denominator Grubbs' G is
    // defined with — the published critical values assume it
    val sigma = math.sqrt(
      (ds.map(x => x._2.toDouble * x._2).sum / n - mean * mean) * n / (n - 1.0))
    val (dTop, yTop) = ds.minBy { case (d, y) => (-math.abs(y - mean), d) }
    val row = Analytics.grubbsOutlier(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == n.toLong)
    assert(row.getAs[Long]("day_epoch") == dTop)
    assert(row.getAs[Long]("y_cents") == yTop)
    assert(math.abs(row.getAs[Double]("grubbs_g") - math.abs(yTop - mean) / sigma) < 1e-9)
  }
}
