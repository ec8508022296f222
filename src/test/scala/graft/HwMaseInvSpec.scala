package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Holt–Winters, MASE/WAPE, inventory plan — driver recomputation on
  * sf0.001.
  */
class HwMaseInvSpec extends AnyFunSuite {
  import SparkTestSession._

  private def daily(): IndexedSeq[(Long, Long)] =
    Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toIndexedSeq

  test("holtWinters equals a driver integer fold with calendar-keyed seasonals") {
    val ds = daily()
    var l = ds.head._2 * 4
    var b = 0L
    val s = Array.fill(7)(0L)
    for ((d, y) <- ds.tail) {
      val r = (d % 7).toInt
      val l2 = (2 * (y * 4 - s(r)) + 2 * (l + b)) / 4
      val b2 = (l2 - l + 3 * b) / 4
      s(r) = (2 * (y * 4 - l2) + 2 * s(r)) / 4
      l = l2; b = b2
    }
    val row = Analytics.holtWinters(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == ds.length.toLong)
    assert(row.getAs[Long]("level_q") == l)
    assert(row.getAs[Long]("trend_q") == b)
    assert(row.getAs[Long]("s0_q") == s(0))
    assert(row.getAs[Long]("s3_q") == s(3))
    assert(row.getAs[Long]("s6_q") == s(6))
    val f1 = (l + b + s(((ds.last._1 + 1) % 7).toInt)).toDouble / 400.0
    assert(math.abs(row.getAs[Double]("forecast1_dollars") - f1) < 1e-9)
  }

  test("maseWape ratios come from exact integer error sums") {
    val ds = daily().toMap
    val e7 = ds.toSeq.flatMap { case (d, f) => ds.get(d + 7).map(y => (y, f)) }
    val e1 = ds.toSeq.flatMap { case (d, f) => ds.get(d + 1).map(y => (y, f)) }
    val sae7 = e7.map { case (y, f) => math.abs(y - f) }.sum
    val sae1 = e1.map { case (y, f) => math.abs(y - f) }.sum
    val sy7 = e7.map(_._1).sum
    val row = Analytics.maseWape(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_eval") == e7.length.toLong)
    assert(row.getAs[Long]("sae7") == sae7)
    assert(row.getAs[Long]("sae1") == sae1)
    val mase = (sae7.toDouble / e7.length) / (sae1.toDouble / e1.length)
    assert(math.abs(row.getAs[Double]("mase") - mase) < 1e-9)
    assert(math.abs(row.getAs[Double]("wape") - sae7.toDouble / sy7) < 1e-12)
  }

  test("inventoryPlan ranks by total demand and applies the EOQ formulas") {
    val perDay = Tables.lineitem(spark, sfDir)
      .selectExpr("l_partkey", "CAST(l_shipdate AS DATE) AS day", "CAST(round(l_quantity) AS BIGINT) AS q")
      .groupBy("l_partkey", "day").sum("q")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val stats = perDay.groupBy(_._1).map { case (pk, qs) =>
      (pk, qs.length.toLong, qs.map(_._2).sum, qs.map(q => q._2 * q._2).sum)
    }.toSeq
    val top = stats.sortBy { case (pk, _, d, _) => (-d, pk) }.take(20)
    val rows = Relational.inventoryPlan(Tables.lineitem(spark, sfDir)).orderBy("rank").collect()
    assert(rows.length == 20)
    for ((row, i) <- rows.zipWithIndex) {
      val (pk, n, d, sq) = top(i)
      assert(row.getAs[Long]("l_partkey") == pk, s"rank ${i + 1}")
      assert(row.getAs[Long]("d_total") == d)
      val mu = d.toDouble / n
      val sigma = math.sqrt(sq.toDouble / n - mu * mu)
      assert(math.abs(row.getAs[Double]("eoq") - math.sqrt(2.0 * d * 100.0 / 20.0)) < 1e-9)
      assert(math.abs(row.getAs[Double]("safety_stock") - 1.6448536269514722 * sigma * 2.6457513110645907) < 1e-9)
      assert(math.abs(row.getAs[Double]("reorder_point") - (mu * 7.0 + 1.6448536269514722 * sigma * 2.6457513110645907)) < 1e-9)
    }
  }
}
