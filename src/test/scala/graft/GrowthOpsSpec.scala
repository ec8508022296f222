package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Round-3 continuation: Pareto concentration, growth accounting, CUPED
  * readout — brute-force recomputation on sf0.001.
  */
class GrowthOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("paretoParts cumulative shares at the canonical ranks") {
    val got = Relational.paretoParts(Tables.lineitem(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("rank") ->
        (r.getAs[Long]("l_partkey"), r.getAs[Long]("cents"), r.getAs[Long]("cum_cents"),
          r.getAs[Double]("cum_share")))
      .toMap
    val revenue = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("c")))
      .groupBy(_._1).map { case (p, rs) => (p, rs.map(_._2).sum) }
      .toSeq.sortBy { case (p, c) => (-c, p) }
    val total = revenue.map(_._2).sum
    val expectedRanks = Seq(1, 5, 10, 20, 50, 100).filter(_ <= revenue.length)
    assert(got.keySet == expectedRanks.map(_.toLong).toSet)
    for (k <- expectedRanks) {
      val cum = revenue.take(k).map(_._2).sum
      val (p, c, gc, share) = got(k.toLong)
      assert(p == revenue(k - 1)._1 && c == revenue(k - 1)._2, k)
      assert(gc == cum, k)
      assert(share == cum.toDouble / total, k)
    }
    // concentration is real: top-20 holds a strictly larger share than 20/N
    val n = revenue.length
    if (n > 100) assert(got(20L)._4 > 20.0 / n)
  }

  test("growthAccounting classifies weekly actives and churn exactly") {
    val got = Analytics.growthAccounting(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("week") ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned")))
      .toMap
    val activity = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG) div 604800").as("w"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("w")))
      .distinct
    val byWeek = activity.groupBy(_._2).map { case (w, rs) => w -> rs.map(_._1).toSet }
    val firstOf = activity.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    // only OBSERVED weeks: the engine clips the week+1 shift's phantom
    // trailing week (max_week+1 would hold only the final week's actives
    // as "churn" — never observed, so it must not be reported)
    val maxWeek = byWeek.keySet.max
    assert(!got.contains(maxWeek + 1), "phantom post-window week must be clipped")
    val weeks = (byWeek.keySet ++ byWeek.keySet.map(_ + 1)).filter(_ <= maxWeek)
    for (w <- weeks) {
      val cur = byWeek.getOrElse(w, Set.empty)
      val prev = byWeek.getOrElse(w - 1, Set.empty)
      val nNew = cur.count(firstOf(_) == w).toLong
      val nRet = (cur intersect prev).size.toLong
      val nRes = cur.count(u => !prev(u) && firstOf(u) < w).toLong
      val nChu = (prev diff cur).size.toLong
      if (cur.nonEmpty || prev.nonEmpty) {
        assert(got(w) == ((nNew, nRet, nRes, nChu)), w)
      }
    }
    assert(got.values.exists(_._2 > 0L), "retention should occur")
    // NOTE: no in-window churn assertion on the sf fixture — every
    // active user there stays active through the final observed week, so
    // the only nonzero "churn" the old code reported was the phantom
    // post-window week this test now pins as clipped; the synthetic case
    // below exercises the nonzero n_churned path the fixture can't
  }

  test("growthAccounting reports nonzero in-window churn on synthetic activity") {
    // weeks of activity: w0 = {1,2,3}; w1 = {1,2} (3 churns in w1);
    // w2 = {1,3} (2 churns in w2, 3 resurrects). maxWeek = 2, so the
    // phantom week 3 (which would book users 1 and 3 as churned) is
    // clipped — in-window churn is observed at weeks 1 AND 2.
    val wk = 604800L
    val rows = Seq(
      (1L, 0L * wk + 10L), (2L, 0L * wk + 20L), (3L, 0L * wk + 30L),
      (1L, 1L * wk + 10L), (2L, 1L * wk + 20L),
      (1L, 2L * wk + 10L), (3L, 2L * wk + 30L))
    import spark.implicits._
    val events = rows.toDF("user_id", "ts")
    val got = Analytics.growthAccounting(events).collect()
      .map(r => r.getAs[Long]("week") ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned")))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L), "phantom week 3 must be clipped")
    assert(got(0L) == ((3L, 0L, 0L, 0L)))
    assert(got(1L) == ((0L, 2L, 0L, 1L)), "user 3 churns in week 1")
    assert(got(2L) == ((0L, 1L, 1L, 1L)), "user 2 churns, user 3 resurrects")
    assert(got.values.map(_._4).sum == 2L, "in-window churn must be nonzero")
  }

  test("cupedReport theta and variance reduction from exact sufficient stats") {
    val row = Analytics.cupedReport(Tables.events(spark, sfDir)).collect().head
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG) div 604800").as("w"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("w"), r.getAs[Long]("c")))
    val w0 = rows.map(_._2).min
    val perUser = rows.groupBy(_._1).map { case (_, rs) =>
      (rs.filter(r => r._2 - w0 <= 1).map(_._3).sum,
        rs.filter(r => r._2 - w0 >= 3 && r._2 - w0 <= 4).map(_._3).sum)
    }.toSeq
    val n = perUser.length.toDouble
    val (sx, sy) = (perUser.map(_._1).sum.toDouble, perUser.map(_._2).sum.toDouble)
    val sxy = perUser.map(p => p._1 * p._2).sum.toDouble
    val sxx = perUser.map(p => p._1 * p._1).sum.toDouble
    val syy = perUser.map(p => p._2 * p._2).sum.toDouble
    val (vx, vy) = (sxx / n - (sx / n) * (sx / n), syy / n - (sy / n) * (sy / n))
    val cov = sxy / n - (sx / n) * (sy / n)
    assert(row.getAs[Long]("n_users") == perUser.length.toLong)
    assert(math.abs(row.getAs[Double]("theta") - cov / vx) < 1e-9)
    val corr = cov / math.sqrt(vx * vy)
    assert(math.abs(row.getAs[Double]("corr_xy") - corr) < 1e-9)
    assert(math.abs(row.getAs[Double]("var_reduction") - corr * corr) < 1e-9)
    assert(row.getAs[Double]("var_reduction") >= 0.0 &&
      row.getAs[Double]("var_reduction") < 1.0)
  }
}
