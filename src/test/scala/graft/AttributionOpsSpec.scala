package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Round-3 continuation: drift bins, linear attribution, ship-latency
  * SLA — brute-force recomputation on sf0.001.
  */
class AttributionOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("driftBins chi-square homogeneity cells are exact") {
    val got = Analytics.driftBins(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("e_a"),
          r.getAs[Double]("contrib")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS LONG) div 86400").as("day"),
        expr("least(CAST(round(value * 100) AS BIGINT) div 5000, 9)").as("bin"))
      .collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("bin")))
    val split = rows.map(_._1).min + 15
    val byBin = rows.groupBy(_._2)
    val ta = rows.count(_._1 < split).toLong
    val tb = rows.count(_._1 >= split).toLong
    assert(got.keySet == byBin.keySet)
    for ((bin, rs) <- byBin) {
      val na = rs.count(_._1 < split).toLong
      val nb = rs.count(_._1 >= split).toLong
      val (gna, gnb, gea, gcontrib) = got(bin)
      assert(gna == na && gnb == nb, bin)
      val ea = (na + nb).toDouble * ta / (ta + tb)
      val eb = (na + nb).toDouble * tb / (ta + tb)
      assert(math.abs(gea - ea) < 1e-9, bin)
      val contrib = (na - ea) * (na - ea) / ea + (nb - eb) * (nb - eb) / eb
      assert(math.abs(gcontrib - contrib) < 1e-9, bin)
    }
    assert(ta > 0 && tb > 0, "both periods must be populated")
  }

  test("linearAttribution splits purchase millicents across 7-day touches") {
    val got = Analytics.linearAttribution(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_touches"), r.getAs[Long]("attributed_milli")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("CAST(ts AS LONG)").as("s"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("s"), r.getAs[Long]("c")))
    val byUser = rows.groupBy(_._1)
    val contributions = rows.filter(_._3 == "purchase").flatMap { p =>
      val touches = byUser(p._1).filter(t => t._4 >= p._4 - 604800L && t._4 < p._4)
      val k = touches.length
      touches.map(t => (t._3, p._5 * 1000 / k))
    }
    val expected = contributions.groupBy(_._1)
      .map { case (t, rs) => t -> (rs.length.toLong, rs.map(_._2).sum) }
    assert(got == expected)
    assert(got.nonEmpty && got.values.map(_._1).sum > 0)
  }

  test("shipLatency percentiles per priority match a direct recomputation") {
    val got = Relational
      .shipLatency(Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Long]("n_lines"), r.getAs[Double]("p50_days"), r.getAs[Double]("p95_days"),
          r.getAs[Double]("p99_days"), r.getAs[Long]("max_days")))
      .toMap
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("CAST(o_orderdate AS LONG)").as("os"))
      .collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[String]("o_orderpriority"), r.getAs[Long]("os")))
      .toMap
    val days = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), expr("CAST(l_shipdate AS LONG)").as("ss"))
      .collect()
      .flatMap { r =>
        orders.get(r.getAs[Long]("l_orderkey")).map { case (pri, os) =>
          (pri, (r.getAs[Long]("ss") - os) / 86400)
        }
      }
    def pct(sorted: Seq[Long], q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) sorted(lo).toDouble
      else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
    }
    for ((pri, rs) <- days.groupBy(_._1)) {
      val vs = rs.map(_._2).sorted.toSeq
      val (n, p50, p95, p99, mx) = got(pri)
      assert(n == vs.length.toLong, pri)
      assert(p50 == pct(vs, 0.5) && p95 == pct(vs, 0.95) && p99 == pct(vs, 0.99), pri)
      assert(mx == vs.max, pri)
    }
  }
}
