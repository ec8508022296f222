package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Round-3 model-eval + time-series batch: Bollinger bands, truncated
  * EWMA, windowed dedup, seasonal anomalies, calibration curve, and
  * binned rank-sum AUC — brute-force recomputation on sf0.001.
  */
class SeriesOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def hourlySeries: Seq[(Long, Long, Long)] =
    Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS LONG) div 3600").as("h"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("h"), r.getAs[Long]("c")))
      .groupBy(_._1).toSeq
      .map { case (h, rs) => (h, rs.map(_._2).sum, rs.length.toLong) }
      .sortBy(_._1)

  test("bollingerBands: ma/sd equal the trailing-24 sufficient-stat closed form") {
    val got = Analytics.bollingerBands(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("hour") ->
        (r.getAs[Long]("cents"), r.getAs[Long]("n_win"), r.getAs[Double]("ma"),
          r.getAs[Double]("sd"), r.getAs[Long]("signal")))
      .toMap
    val series = hourlySeries.map(t => (t._1, t._2))
    series.zipWithIndex.foreach { case ((h, c), i) =>
      val frame = series.slice(math.max(0, i - 23), i + 1).map(_._2)
      val n = frame.length.toDouble
      val (s, ss) = (frame.sum.toDouble, frame.map(x => x * x).sum.toDouble)
      val ma = s / n
      val sd = math.sqrt(ss / n - (s / n) * (s / n))
      val (gc, gn, gma, gsd, gsig) = got(h)
      assert(gc == c && gn == frame.length.toLong, h)
      assert(math.abs(gma - ma) < 1e-6 && math.abs(gsd - sd) < 1e-6, h)
      val expSig = if (c > ma + 2 * sd) 1L else if (c < ma - 2 * sd) -1L else 0L
      assert(gsig == expSig, h)
    }
    assert(got.values.exists(_._5 != 0L), "bands should be breached somewhere")
  }

  test("ewmaSeries equals the truncated halving kernel") {
    val got = Analytics.ewmaSeries(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("hour") -> (r.getAs[Long]("cnt"), r.getAs[Double]("ewma")))
      .toMap
    val counts = hourlySeries.map(t => (t._1, t._3))
    val weights = Seq(1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125)
    counts.zipWithIndex.foreach { case ((h, cnt), i) =>
      val terms = (0 to 5).flatMap { k =>
        if (i - k >= 0) Some(weights(k) * counts(i - k)._2) else None
      }
      val den = (0 to 5).flatMap(k => if (i - k >= 0) Some(weights(k)) else None).sum
      val expected = terms.sum / den
      assert(got(h)._1 == cnt, h)
      assert(math.abs(got(h)._2 - expected) < 1e-9, h)
    }
  }

  test("eventDedup keeps one row per (user, type, hour) cell") {
    val got = Relational.eventDedup(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_raw"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped")))
      .toMap
    val cells = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("CAST(ts AS LONG) div 3600").as("h"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Long]("h")))
    for ((t, rows) <- cells.groupBy(_._2)) {
      val kept = rows.distinct.length.toLong
      assert(got(t) == ((rows.length.toLong, kept, rows.length - kept)), t)
    }
  }

  test("seasonalAnomaly flags exactly the hours at >= 1.5x their dow/hod cell mean") {
    val got = Analytics.seasonalAnomaly(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("hour_epoch") -> r.getAs[Double]("ratio"))
      .toMap
    val hourly = hourlySeries.map(t => (t._1, t._3))
    val cells = hourly.groupBy { case (h, _) => ((h / 24 + 4) % 7, h % 24) }
    val expected = hourly.flatMap { case (h, cnt) =>
      val cell = cells(((h / 24 + 4) % 7, h % 24))
      val ratio = cnt.toDouble * cell.length / cell.map(_._2).sum
      if (ratio >= 1.5) Some(h -> ratio) else None
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (h, r) => assert(math.abs(got(h) - r) < 1e-12, h) }
    assert(got.nonEmpty, "fixture should contain seasonal anomalies")
  }

  test("calibration bins partition the corpus and AUC matches a direct rank computation") {
    val scored = Tables.events(spark, sfDir)
      .select(expr("(event_id % 1000003) * 2654435761 % 1000").as("s"),
        (col("event_type") === "purchase").cast("long").as("pos"))
      .collect()
      .map(r => (r.getAs[Long]("s"), r.getAs[Long]("pos")))
    val cal = Analytics.calibrationCurve(Tables.events(spark, sfDir)).collect()
    assert(cal.map(_.getAs[Long]("n")).sum == scored.length.toLong)
    for (row <- cal) {
      val bin = row.getAs[Long]("bin")
      val inBin = scored.filter(_._1 / 100 == bin)
      assert(row.getAs[Long]("n") == inBin.length.toLong, bin)
      assert(row.getAs[Long]("n_pos") == inBin.map(_._2).sum, bin)
      assert(row.getAs[Double]("pos_rate") ==
        inBin.map(_._2).sum.toDouble / inBin.length, bin)
    }
    // AUC: P(random pos scores above random neg, ties count half)
    val pos = scored.filter(_._2 == 1L).map(_._1)
    val neg = scored.filter(_._2 == 0L).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expectedAuc = wins / (pos.length.toDouble * neg.length.toDouble)
    val aucRow = Analytics.aucRankSum(Tables.events(spark, sfDir)).collect().head
    assert(aucRow.getAs[Long]("n_pos") == pos.length.toLong)
    assert(aucRow.getAs[Long]("n_neg") == neg.length.toLong)
    assert(math.abs(aucRow.getAs[Double]("auc") - expectedAuc) < 1e-12)
  }
}
