package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Forecast reconciliation, bandit replay, event study — driver
  * recomputation on sf0.001.
  */
class ReconBanditEventSpec extends AnyFunSuite {
  import SparkTestSession._

  test("forecastReconciliation coherence gaps sum to zero across types") {
    val rows = Analytics.forecastReconciliation(Tables.events(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    // top-down allocations redistribute exactly the bottom-up total
    assert(math.abs(rows.map(_.getAs[Double]("coherence_gap")).sum) < 1e-6)
    assert(math.abs(rows.map(_.getAs[Double]("hist_share")).sum - 1.0) < 1e-9)
    // driver recomputation of one type's bottom-up forecast
    val t = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "event_type", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d", "event_type").sum("c")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val dmax = t.keys.map(_._1).max
    val types = t.keys.map(_._2).toSeq.distinct
    for (row <- rows) {
      val ty = row.getString(0)
      val bu = ((dmax - 6) to dmax)
        .flatMap(d => if (t.contains((d, ty))) t.get((d - 7, ty)) else None).sum
      assert(row.getAs[Long]("bu_forecast") == bu, s"type $ty")
    }
    assert(types.nonEmpty)
  }

  test("banditReplay replays the greedy cross-multiplied policy") {
    val ds = Tables.events(spark, sfDir)
      .selectExpr(
        "CAST(ts AS LONG) div 86400 AS d",
        "CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0L END AS p",
        "CASE WHEN event_type = 'click' THEN CAST(round(value * 100) AS BIGINT) ELSE 0L END AS c")
      .groupBy("d").sum("p", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var (np, sp, nc, sc, reward, pullsP) = (0L, 0L, 0L, 0L, 0L, 0L)
    for ((_, rp, rc) <- ds) {
      if (sp * nc >= sc * np) { np += 1; sp += rp; reward += rp; pullsP += 1 }
      else { nc += 1; sc += rc; reward += rc }
    }
    val row = Analytics.banditReplay(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == ds.length.toLong)
    assert(row.getAs[Long]("pulls_purchase") == pullsP)
    assert(row.getAs[Long]("reward_cents") == reward)
    val best = math.max(ds.map(_._2).sum, ds.map(_._3).sum)
    assert(row.getAs[Long]("best_fixed_cents") == best)
    assert(row.getAs[Long]("regret_cents") == best - reward)
  }

  test("eventStudy anchors on the exact peak day with a disjoint baseline") {
    val ds = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val peak = ds.minBy { case (d, y) => (-y, d) }._1
    val base = ds.filter(t => math.abs(t._1 - peak) > 3)
    val baseMean = base.map(_._2).sum.toDouble / base.length
    val rows = Analytics.eventStudy(Tables.events(spark, sfDir)).orderBy("offset_days").collect()
    assert(rows.length == ds.count(t => math.abs(t._1 - peak) <= 3))
    for (row <- rows) {
      val off = row.getAs[Long]("offset_days")
      val y = ds.find(_._1 == peak + off).get._2
      assert(row.getAs[Long]("y_cents") == y, s"offset $off")
      assert(math.abs(row.getAs[Double]("baseline_cents") - baseMean) < 1e-9)
    }
    assert(rows.map(_.getAs[Long]("offset_days")).contains(0L))
  }
}
