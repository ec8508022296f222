package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Round-3 continuation: price indices, quantile treatment effects,
  * seasonal-naive backtest — brute-force recomputation on sf0.001.
  */
class IndexQteBacktestSpec extends AnyFunSuite {
  import SparkTestSession._

  test("priceIndex satisfies the own-price identity and Fisher is the geometric mean") {
    val r = Relational.priceIndex(Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
      .collect().head
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("y")).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity").collect()
      .map(x => (orders(x.getLong(0)), x.getLong(1),
        math.round(x.getDouble(2) * 100), math.round(x.getDouble(3))))
    def agg(y: Int) = li.filter(_._1 == y).groupBy(_._2)
      .map { case (p, g) => p -> (g.map(_._3).sum, g.map(_._4).sum) }
    val (a0, a1) = (agg(1996), agg(1997))
    val common = a0.keySet intersect a1.keySet
    assert(r.getAs[Long]("n_parts") == common.size)
    val sc0 = common.toSeq.map(p => a0(p)._1).sum.toDouble
    val sc1 = common.toSeq.map(p => a1(p)._1).sum.toDouble
    val sp1q0 = common.toSeq.map { p =>
      math.round(a1(p)._1.toDouble / a1(p)._2 * a0(p)._2)
    }.sum.toDouble
    val sp0q1 = common.toSeq.map { p =>
      math.round(a0(p)._1.toDouble / a0(p)._2 * a1(p)._2)
    }.sum.toDouble
    assert(math.abs(r.getAs[Double]("laspeyres") - sp1q0 / sc0) < 1e-12)
    assert(math.abs(r.getAs[Double]("paasche") - sc1 / sp0q1) < 1e-12)
    assert(math.abs(r.getAs[Double]("fisher") -
      math.sqrt(sp1q0 / sc0 * (sc1 / sp0q1))) < 1e-12)
    // indices should be near 1 for a stationary price process
    assert(r.getAs[Double]("fisher") > 0.5 && r.getAs[Double]("fisher") < 2.0)
  }

  test("quantileTreatmentEffects deciles are the exact order statistics per arm") {
    val rows = Analytics.quantileTreatmentEffects(Tables.events(spark, sfDir)).collect()
    assert(rows.length == 9)
    def arm(u: Long): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(u.toString.getBytes)
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val vals = Tables.events(spark, sfDir).select("user_id", "value").collect()
      .map(x => (arm(x.getLong(0)), math.round(x.getDouble(1) * 100)))
    def decile(a: Long, d: Long): Long = {
      val sorted = vals.filter(_._1 == a).map(_._2).sorted
      val k = (d * sorted.length + 9) / 10
      sorted((k - 1).toInt)
    }
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert(r.getAs[Double]("q_a_dollars") == decile(0, d) / 100.0, s"decile $d arm a")
      assert(r.getAs[Double]("q_b_dollars") == decile(1, d) / 100.0, s"decile $d arm b")
      assert(r.getAs[Double]("shift_dollars") ==
        (decile(1, d) - decile(0, d)) / 100.0)
    }
    // deciles are monotone
    val qa = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Double]("q_a_dollars"))
    assert(qa.sliding(2).forall(s => s.head <= s.last))
  }

  test("seasonalNaiveBacktest scores only hours with a week-old ancestor") {
    val r = Analytics.seasonalNaiveBacktest(Tables.events(spark, sfDir)).collect().head
    val hourly = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS LONG) div 3600").as("h"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val evals = hourly.keys.toSeq.filter(h => hourly.contains(h - 168))
      .map { h =>
        val (y, f) = (hourly(h).toDouble, hourly(h - 168).toDouble)
        (math.round(1e6 * math.abs(y - f) / y),
          math.round(1e6 * 2.0 * math.abs(y - f) / (y + f)))
      }
    assert(r.getAs[Long]("n_eval") == evals.length)
    assert(math.abs(r.getAs[Double]("mape") -
      evals.map(_._1).sum.toDouble / evals.length / 1e6) < 1e-12)
    assert(math.abs(r.getAs[Double]("smape") -
      evals.map(_._2).sum.toDouble / evals.length / 1e6) < 1e-12)
    // sMAPE is bounded by 2
    assert(r.getAs[Double]("smape") > 0 && r.getAs[Double]("smape") < 2)
  }
}
