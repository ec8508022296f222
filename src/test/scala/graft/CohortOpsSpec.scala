package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.similarity.Similarity

/** Round-3 continuation: cohort LTV curve, EWMA forecast anomalies,
  * quantized label centroids, DAU/WAU stickiness — brute-force
  * recomputation on sf0.001.
  */
class CohortOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ltvCurve accumulates cohort spend across week offsets") {
    val got = Analytics.ltvCurve(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("week_cents"), r.getAs[Long]("cum_cents"),
          r.getAs[Double]("ltv_cents")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG) div 86400").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"), r.getAs[Long]("c")))
    val day0 = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    val cohortSizes = day0.values.groupBy(_ / 7).map { case (w, ds) => w -> ds.size.toLong }
    val weekly = rows
      .map(r => ((day0(r._1) / 7, (r._2 - day0(r._1)) / 7), r._3))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sum }
    for (((cw, wo), (n, wc, cum, ltv)) <- got) {
      assert(n == cohortSizes(cw), (cw, wo))
      assert(wc == weekly((cw, wo)), (cw, wo))
      val expCum = weekly.filter { case ((c, o), _) => c == cw && o <= wo }.values.sum
      assert(cum == expCum, (cw, wo))
      assert(ltv == expCum.toDouble / cohortSizes(cw), (cw, wo))
    }
    assert(got.keySet == weekly.keySet)
    // cumulative is monotone within each cohort
    for ((cw, entries) <- got.groupBy(_._1._1)) {
      val cums = entries.toSeq.sortBy(_._1._2).map(_._2._3)
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, cw)
    }
  }

  test("ewmaAnomaly predicts from prior hours only and flags x2 deviations") {
    val got = Analytics.ewmaAnomaly(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("hour") ->
        (r.getAs[Long]("cnt"), Option(r.get(r.fieldIndex("pred"))).map(_.asInstanceOf[Double]),
          r.getAs[Long]("flag")))
      .toMap
    val series = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS LONG) div 3600").as("h")).collect()
      .map(_.getAs[Long]("h"))
      .groupBy(identity).toSeq.map { case (h, rs) => (h, rs.length.toLong) }
      .sortBy(_._1)
    val weights = Seq(1.0, 0.5, 0.25, 0.125, 0.0625)
    series.zipWithIndex.foreach { case ((h, cnt), i) =>
      val lags = (1 to 5).flatMap(k => if (i - k >= 0) Some(series(i - k)._2) else None)
      val expectedPred =
        if (lags.isEmpty) None
        else Some(
          lags.zip(weights).map { case (v, w) => w * v }.sum /
            lags.indices.map(weights(_)).sum)
      val (gc, gp, gf) = got(h)
      assert(gc == cnt, h)
      (gp, expectedPred) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) < 1e-9, h)
          val ratio = cnt.toDouble / a
          assert(gf == (if (ratio >= 2.0 || ratio <= 0.5) 1L else 0L), h)
        case (None, None) => assert(gf == 0L, h)
        case other => fail(s"pred mismatch at $h: $other")
      }
    }
  }

  test("labelCentroids quantized sums are exact per (label, dim)") {
    val got = Similarity.labelCentroids(Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("dim")) ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("milli_sum"), r.getAs[Double]("centroid_milli")))
      .toMap
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("label"), r.getSeq[Float](r.fieldIndex("embedding"))))
    val expected = vecs.flatMap { case (l, e) =>
      e.zipWithIndex.map { case (v, i) =>
        ((l, i + 1L), math.round(v.toDouble * 1000))
      }
    }.groupBy(_._1).map { case (k, rs) =>
      k -> (rs.length.toLong, rs.map(_._2).sum)
    }
    assert(got.size == expected.size)
    for ((k, (n, s)) <- expected) {
      val (gn, gs, gc) = got(k)
      assert(gn == n && gs == s, k)
      assert(gc == s.toDouble / n, k)
    }
  }

  test("stickiness divides DAU by trailing-7-day WAU") {
    val got = Analytics.stickiness(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"), r.getAs[Double]("stickiness")))
      .toMap
    val activity = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG) div 86400").as("day"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
      .distinct
    val days = activity.map(_._2).distinct
    for (d <- days) {
      val dau = activity.count(_._2 == d).toLong
      val wau = activity.filter(a => a._2 >= d - 6 && a._2 <= d).map(_._1).distinct.length.toLong
      assert(got(d) == ((dau, wau, dau.toDouble / wau)), d)
      assert(wau >= dau, d)
    }
    assert(got.keySet == days.toSet)
  }
}
