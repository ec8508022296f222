package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Graph, Tables}

/** Round-3 continuation: degree assortativity, partial correlation,
  * intraclass correlation — brute-force recomputation on sf0.001.
  */
class AssortPartialIccSpec extends AnyFunSuite {
  import SparkTestSession._

  test("degreeAssortativity is the Pearson r of endpoint degrees") {
    val r = Graph.degreeAssortativity(Tables.lineitem(spark, sfDir)).collect().head
    val baskets = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val edges = baskets.toSeq
      .flatMap(ps => for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toDouble).toMap
    val xs = edges.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val n = xs.length
    assert(r.getAs[Long]("n") == n)
    val (mx, my) = (xs.map(_._1).sum / n, xs.map(_._2).sum / n)
    val cov = xs.map(t => (t._1 - mx) * (t._2 - my)).sum / n
    val vx = xs.map(t => (t._1 - mx) * (t._1 - mx)).sum / n
    val vy = xs.map(t => (t._2 - my) * (t._2 - my)).sum / n
    val expected = cov / math.sqrt(vx * vy)
    assert(math.abs(r.getAs[Double]("assortativity") - expected) < 1e-9)
    assert(math.abs(r.getAs[Double]("assortativity")) <= 1.0)
  }

  test("partialCorrelation removes the weekday component") {
    val r = Analytics.partialCorrelation(Tables.events(spark, sfDir)).collect().head
    val rows = Tables.events(spark, sfDir)
      .select(
        expr("CAST(hour(ts) AS BIGINT)").as("x"),
        expr("(CAST(ts AS LONG) div 86400 + 3) % 7 + 1").as("z"),
        expr("CAST(round(value * 100) AS BIGINT)").as("y"))
      .collect().map(t => (t.getLong(0).toDouble, t.getLong(1).toDouble, t.getLong(2).toDouble))
    def corr(f: ((Double, Double, Double)) => Double, g: ((Double, Double, Double)) => Double) = {
      val n = rows.length
      val (ma, mb) = (rows.map(f).sum / n, rows.map(g).sum / n)
      val cov = rows.map(t => (f(t) - ma) * (g(t) - mb)).sum / n
      val va = rows.map(t => math.pow(f(t) - ma, 2)).sum / n
      val vb = rows.map(t => math.pow(g(t) - mb, 2)).sum / n
      cov / math.sqrt(va * vb)
    }
    val rxy = corr(_._1, _._3)
    val rxz = corr(_._1, _._2)
    val ryz = corr(_._3, _._2)
    assert(math.abs(r.getAs[Double]("r_xy") - rxy) < 1e-9)
    assert(math.abs(r.getAs[Double]("r_xz") - rxz) < 1e-9)
    assert(math.abs(r.getAs[Double]("r_yz") - ryz) < 1e-9)
    val expected = (rxy - rxz * ryz) / math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(r.getAs[Double]("r_xy_given_z") - expected) < 1e-9)
  }

  test("intraclassCorrelation matches the unequal-size ANOVA estimator") {
    val r = Analytics.intraclassCorrelation(Tables.events(spark, sfDir)).collect().head
    val groups = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2)).toSeq
    val k = groups.length
    val n = groups.map(_.length).sum
    assert(r.getAs[Long]("k") == k && r.getAs[Long]("n") == n)
    // same centi-quantized per-group term the engine defines
    val ssbCenti = groups.map { g =>
      val (sg, ng) = (g.sum.toDouble, g.length.toDouble)
      math.round((sg / ng) * (sg / ng) * ng / 100.0)
    }.sum
    val s = groups.flatten.sum.toDouble
    val q = groups.flatten.map(c => c.toDouble * c).sum
    val ssb = ssbCenti * 100.0 - (s / n) * s
    val ssw = q - ssbCenti * 100.0
    val kBar = (n - groups.map(g => g.length.toLong * g.length).sum.toDouble / n) / (k - 1)
    val msb = ssb / (k - 1)
    val msw = ssw / (n - k)
    val icc = (msb - msw) / (msb + (kBar - 1) * msw)
    assert(math.abs(r.getAs[Double]("msb") - msb) / msb < 1e-9)
    assert(math.abs(r.getAs[Double]("msw") - msw) / msw < 1e-9)
    assert(math.abs(r.getAs[Double]("icc1") - icc) < 1e-9)
    assert(r.getAs[Double]("icc1") > -1.0 && r.getAs[Double]("icc1") < 1.0)
  }
}
