package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Round-3 continuation: one-way ANOVA, Welch's t, Poisson bootstrap —
  * brute-force recomputation on sf0.001.
  */
class AnovaWelchBootSpec extends AnyFunSuite {
  import SparkTestSession._

  private def cents(v: Double): Long = math.round(v * 100)

  private lazy val events = Tables.events(spark, sfDir)
    .select("event_id", "event_type", "value").collect()
    .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
      cents(r.getAs[Double]("value"))))

  test("anovaByType matches the textbook decomposition") {
    val r = Analytics.anovaByType(Tables.events(spark, sfDir)).collect().head
    val groups = events.groupBy(_._2).view.mapValues(_.map(_._3.toDouble)).toMap
    val all = events.map(_._3.toDouble)
    val grand = all.sum / all.length
    val ssb = groups.values.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.values.flatMap(g => g.map(x => math.pow(x - g.sum / g.length, 2))).sum
    assert(r.getAs[Long]("n") == all.length)
    assert(r.getAs[Long]("k") == 5)
    assert(math.abs(r.getAs[Double]("ssb") - ssb) / ssb < 1e-9)
    assert(math.abs(r.getAs[Double]("ssw") - ssw) / ssw < 1e-9)
    val f = (ssb / 4.0) / (ssw / (all.length - 5.0))
    assert(math.abs(r.getAs[Double]("f_stat") - f) / f < 1e-9)
    assert(math.abs(r.getAs[Double]("eta2") - ssb / (ssb + ssw)) < 1e-9)
  }

  test("welchTTest matches the two-sample formulas") {
    val r = Analytics.welchTTest(Tables.events(spark, sfDir)).collect().head
    val a = events.filter(_._2 == "purchase").map(_._3.toDouble)
    val b = events.filter(_._2 == "view").map(_._3.toDouble)
    def stats(g: Array[Double]) = {
      val m = g.sum / g.length
      (g.length, m, g.map(x => (x - m) * (x - m)).sum / (g.length - 1))
    }
    val (n1, m1, v1) = stats(a)
    val (n2, m2, v2) = stats(b)
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(math.abs(r.getAs[Double]("mean1") - m1 / 100.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("mean2") - m2 / 100.0) < 1e-6)
    val se2 = v1 / n1 + v2 / n2
    val t = (m1 - m2) / math.sqrt(se2)
    val df = se2 * se2 / (math.pow(v1 / n1, 2) / (n1 - 1) + math.pow(v2 / n2, 2) / (n2 - 1))
    assert(math.abs(r.getAs[Double]("t_stat") - t) / math.abs(t) < 1e-9)
    assert(math.abs(r.getAs[Double]("df") - df) / df < 1e-9)
  }

  test("poissonBootstrap multiplicities follow the hash thresholds") {
    val rows = Analytics.poissonBootstrap(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("resample") ->
        (r.getAs[Long]("n_eff"), r.getAs[Long]("s_cents")))
      .toMap
    assert(rows.size == 20)
    def mult(id: Long, r: Int): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(s"${id}_$r".getBytes)
        .map("%02x".format(_)).mkString.substring(0, 8)
      val h = java.lang.Long.parseLong(hex, 16)
      val t = Analytics.PoissonThresholds
      t.indexWhere(h < _) match { case -1 => t.length.toLong; case k => k.toLong }
    }
    for (r <- Seq(0, 7, 19)) {
      val ms = events.map(e => (mult(e._1, r), e._3))
      assert(rows(r.toLong) == ((ms.map(_._1).sum, ms.map(t => t._1 * t._2).sum)), s"resample $r")
    }
    // resample sizes concentrate around n (Poisson(1) sum ≈ n ± ~3√n)
    val n = events.length
    rows.values.foreach { case (ne, _) =>
      assert(math.abs(ne - n) < 5 * math.sqrt(n.toDouble) + 10, s"n_eff $ne vs $n")
    }
  }
}
