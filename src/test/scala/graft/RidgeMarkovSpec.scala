package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Round-3 continuation: closed-form ridge, Markov stationary vector,
  * watermark recommendation — brute-force recomputation on sf0.001.
  */
class RidgeMarkovSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("ridgeRegression solves the penalized normal equations") {
    val row = Analytics.ridgeRegression(Tables.events(spark, sfDir)).collect().head
    val rows = Tables.events(spark, sfDir)
      .select(
        expr("CAST(hour(ts) AS BIGINT)").as("x1"),
        expr("(CAST(ts AS LONG) div 86400 + 3) % 7 + 1").as("x2"),
        expr("CAST(round(value * 100) AS BIGINT)").as("y"))
      .collect()
      .map(r => (r.getAs[Long]("x1"), r.getAs[Long]("x2"), r.getAs[Long]("y")))
    val n = rows.length.toDouble
    val lam = 1000.0
    val a = rows.map(r => r._1 * r._1).sum + lam
    val b = rows.map(r => r._1 * r._2).sum.toDouble
    val c = rows.map(_._1).sum.toDouble
    val e = rows.map(r => r._2 * r._2).sum + lam
    val f = rows.map(_._2).sum.toDouble
    val r1 = rows.map(r => r._1 * r._3).sum.toDouble
    val r2 = rows.map(r => r._2 * r._3).sum.toDouble
    val r3 = rows.map(_._3).sum.toDouble
    def det3(m: Array[Double]): Double =
      m(0) * (m(4) * m(8) - m(5) * m(7)) - m(1) * (m(3) * m(8) - m(5) * m(6)) +
        m(2) * (m(3) * m(7) - m(4) * m(6))
    val det = det3(Array(a, b, c, b, e, f, c, f, n))
    val coefHour = det3(Array(r1, b, c, r2, e, f, r3, f, n)) / det
    val coefDow = det3(Array(a, r1, c, b, r2, f, c, r3, n)) / det
    val intercept = det3(Array(a, b, r1, b, e, r2, c, f, r3)) / det
    assert(row.getAs[Long]("n") == rows.length.toLong)
    assert(math.abs(row.getAs[Double]("coef_hour") - coefHour) < 1e-9)
    assert(math.abs(row.getAs[Double]("coef_dow") - coefDow) < 1e-9)
    assert(math.abs(row.getAs[Double]("intercept") - intercept) < 1e-9)
    // residual sanity: solution satisfies the penalized normal equations
    val lhs1 = a * coefHour + b * coefDow + c * intercept
    assert(math.abs(lhs1 - r1) < 1e-6 * math.abs(r1))
  }

  test("markovStationary matches two quantized transition-power steps") {
    val got = Analytics.markovStationary(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("stationary_milli"))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("s"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type")))
    val pairs: Seq[(String, String)] = rows.groupBy(_._1).values.toSeq.flatMap { es =>
      val ord: Seq[String] = es.sortBy(e => (e._2, e._3)).map(_._4).toSeq
      ord.sliding(2).filter(_.length == 2).map(w => (w(0), w(1))).toSeq
    }
    val cnt = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val tot = pairs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val ppm = cnt.map { case ((p, c), n) => (p, c) -> rnd(1000000.0 * n / tot(p)) }
    val types = rows.map(_._4).distinct.sorted
    def step(v: Map[String, Long]): Map[String, Long] = {
      val w = types.map(c =>
        c -> types.map(p => ppm.getOrElse((p, c), 0L) * v.getOrElse(p, 0L)).sum).toMap
      val mx = w.values.map(math.abs).max
      w.map { case (t, x) => t -> rnd(1000.0 * x / mx) }
    }
    val v2 = step(step(types.map(_ -> 1000L).toMap))
    val succ = pairs.map(_._2).distinct.toSet
    assert(got.keySet == succ)
    succ.foreach(t => assert(got(t) == v2(t), s"type $t"))
  }

  test("watermarkReco percentiles and drop rate match the lateness stream") {
    val row = Analytics.watermarkReco(Tables.events(spark, sfDir)).collect().head
    val evs = Tables.events(spark, sfDir)
      .select(col("event_id"), expr("CAST(ts AS LONG)").as("s"))
      .collect()
      .map { r =>
        val id = r.getAs[Long]("event_id")
        val adj = if (id % 13 == 0) 21600L else if (id % 97 == 0) 86400L else 0L
        (id / 250, r.getAs[Long]("s") - adj)
      }
    val batchMax = evs.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).max }
    val batches = batchMax.keys.toSeq.sorted
    val wm = batches.zipWithIndex.map { case (b, i) =>
      b -> (if (i == 0) None else Some(batches.take(i).map(batchMax).max))
    }.toMap
    val late = evs.map { case (b, ts) => wm(b).map(w => math.max(w - ts, 0L)).getOrElse(0L) }
    def pct(q: Double): Double = {
      val sorted = late.sorted
      val pos = q * (sorted.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      if (lo == hi) sorted(lo).toDouble
      else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
    }
    assert(row.getAs[Long]("n_events") == late.length.toLong)
    assert(math.abs(row.getAs[Double]("p50_sec") - pct(0.5)) < 1e-9)
    assert(math.abs(row.getAs[Double]("p90_sec") - pct(0.9)) < 1e-9)
    val reco = pct(0.99)
    assert(math.abs(row.getAs[Double]("reco_watermark_sec") - reco) < 1e-9)
    val dropped = late.count(_.toDouble > reco).toLong
    assert(row.getAs[Long]("n_dropped_at_reco") == dropped)
  }
}
