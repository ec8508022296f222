package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Feature AUC battery, ROC points, perceptron fold — driver
  * recomputation on sf0.001.
  */
class AucRocPerceptronSpec extends AnyFunSuite {
  import SparkTestSession._

  private def users(): Seq[(Long, Long, Long, Long)] = {
    val base = Tables.events(spark, sfDir)
      .selectExpr(
        "user_id",
        "CASE WHEN event_type = 'click' THEN 1L ELSE 0L END AS c",
        "CASE WHEN event_type = 'view' THEN 1L ELSE 0L END AS v",
        "CASE WHEN event_type = 'error' THEN 1L ELSE 0L END AS e",
        "CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0L END AS s")
      .groupBy("user_id")
      .agg(
        org.apache.spark.sql.functions.sum("c"),
        org.apache.spark.sql.functions.sum("v"),
        org.apache.spark.sql.functions.sum("e"),
        org.apache.spark.sql.functions.sum("s"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val spends = base.map(_._4).sorted
    val med = spends((spends.length + 1) / 2 - 1)
    base.map(t => (t._1, t._2, t._3, if (t._4 > med) 1L else 0L))
  }

  test("featureAuc equals the brute-force pairwise comparison per feature") {
    val us = users()
    def auc(f: ((Long, Long, Long, Long)) => Long): (Long, Double) = {
      val pos = us.filter(_._4 == 1L).map(f)
      val neg = us.filter(_._4 == 0L).map(f)
      var u2 = 0L
      for (a <- pos; b <- neg) {
        if (a > b) u2 += 2 else if (a == b) u2 += 1
      }
      (u2, u2.toDouble / (2.0 * pos.size * neg.size))
    }
    val rows = Analytics.featureAuc(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getString(0), (r.getAs[Long]("u2"), r.getAs[Double]("auc")))).toMap
    val (uc, ac) = auc(_._1)
    assert(rows("clicks")._1 == uc)
    assert(math.abs(rows("clicks")._2 - ac) < 1e-12)
    val (uv, _) = auc(_._2)
    assert(rows("views")._1 == uv)
    val (ue, _) = auc(_._3)
    assert(rows("errors")._1 == ue)
  }

  test("rocPoints TPR/FPR are monotone non-increasing in the threshold") {
    val rows = Analytics.rocPoints(Tables.events(spark, sfDir)).orderBy("threshold").collect()
    assert(rows.length == 20)
    val us = users()
    for (row <- rows) {
      val t = row.getAs[Long]("threshold")
      val tp = us.count(u => u._1 >= t && u._4 == 1L).toLong
      val fp = us.count(u => u._1 >= t && u._4 == 0L).toLong
      assert(row.getAs[Long]("tp") == tp, s"t=$t")
      assert(row.getAs[Long]("fp") == fp, s"t=$t")
    }
    val tprs = rows.map(_.getAs[Double]("tpr"))
    assert(tprs.zip(tprs.tail).forall { case (a, b) => a >= b - 1e-12 })
  }

  test("perceptronWeekend replays the driver mistake-driven fold") {
    val ds = Tables.events(spark, sfDir)
      .selectExpr(
        "CAST(ts AS LONG) div 86400 AS d",
        "CASE WHEN event_type = 'click' THEN 1L ELSE 0L END AS c",
        "CASE WHEN event_type = 'view' THEN 1L ELSE 0L END AS v")
      .groupBy("d").sum("c", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var (w1, w2, b, mist) = (0L, 0L, 0L, 0L)
    for ((d, x1, x2) <- ds) {
      val y = if (d % 7 == 5 || d % 7 == 6) 1L else -1L
      if (y * (w1 * x1 + w2 * x2 + b) <= 0) {
        w1 += y * x1; w2 += y * x2; b += y; mist += 1
      }
    }
    val row = Analytics.perceptronWeekend(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == ds.length.toLong)
    assert(row.getAs[Long]("w1") == w1)
    assert(row.getAs[Long]("w2") == w2)
    assert(row.getAs[Long]("b") == b)
    assert(row.getAs[Long]("n_mistakes") == mist)
  }
}
