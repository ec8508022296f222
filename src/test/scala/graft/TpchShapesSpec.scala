package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Relational, Tables}

/** TPC-H Q7/Q8/Q14/Q19-shaped operators — driver recomputation and
  * physical-plan shape on sf0.001.
  */
class TpchShapesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def revUnits(price: Double, disc: Double): Long =
    math.round(price * 100) * (100 - math.round(disc * 100))

  test("nationTrade sums bilateral revenue by year") {
    val nations = Tables.nation(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val supp = Tables.supplier(spark, sfDir).collect()
      .map(r => (r.getLong(0), nations(r.getInt(2)))).toMap
    val cust = Tables.customer(spark, sfDir).collect()
      .map(r => (r.getLong(0), nations(r.getInt(2)))).toMap
    val ordCust = Tables.orders(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = scala.collection.mutable.Map.empty[(String, String, Long), Long]
    for (r <- Tables.lineitem(spark, sfDir)
        .selectExpr("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "year(l_shipdate) AS y")
        .collect()) {
      val sn = supp(r.getLong(1))
      val cn = cust(ordCust(r.getLong(0)))
      if (Set("NATION_18", "NATION_19")(sn) && Set("NATION_18", "NATION_19")(cn) && sn != cn) {
        val k = (sn, cn, r.getInt(4).toLong)
        expect(k) = expect.getOrElse(k, 0L) + revUnits(r.getDouble(2), r.getDouble(3))
      }
    }
    val got = Relational.nationTrade(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.supplier(spark, sfDir), Tables.nation(spark, sfDir), "NATION_18", "NATION_19")
      .collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)), r.getLong(3))).toMap
    assert(got == expect.toMap)
  }

  test("marketShare numerator never exceeds denominator and shares are in [0,1]") {
    val rows = Relational.marketShare(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.supplier(spark, sfDir), Tables.nation(spark, sfDir), Tables.region(spark, sfDir),
      "ASIA", "NATION_3")
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("num_units") <= r.getAs[Long]("den_units"))
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("promoShare matches a driver conditional aggregation") {
    val pType = Tables.part(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for (r <- Tables.lineitem(spark, sfDir)
        .selectExpr(
          "l_partkey", "l_extendedprice", "l_discount",
          "year(l_shipdate) * 100 + month(l_shipdate) AS m")
        .collect()) {
      val ru = revUnits(r.getDouble(1), r.getDouble(2))
      val promo = if (pType(r.getLong(0)) == "PROMO") ru else 0L
      val k = r.getInt(3).toLong
      val (p, t) = expect.getOrElse(k, (0L, 0L))
      expect(k) = (p + promo, t + ru)
    }
    val got = Relational.promoShare(Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect.toMap)
  }

  test("bracketRevenue matches driver OR-of-brackets filter and broadcasts part") {
    val parts = Tables.part(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getString(2), r.getInt(4)))).toMap
    var n = 0L; var rev = 0L
    for (r <- Tables.lineitem(spark, sfDir)
        .selectExpr("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .collect()) {
      val (brand, size) = parts(r.getLong(0))
      val q = r.getDouble(1)
      val hit =
        (brand == "Brand#1" && size >= 1 && size <= 15 && q >= 1 && q <= 20) ||
          (brand == "Brand#7" && size >= 5 && size <= 30 && q >= 10 && q <= 35) ||
          (brand == "Brand#13" && size >= 1 && size <= 50 && q >= 20 && q <= 50)
      if (hit) { n += 1; rev += revUnits(r.getDouble(2), r.getDouble(3)) }
    }
    val df = Relational.bracketRevenue(Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir))
    val row = df.collect().head
    assert(row.getAs[Long]("n_rows") == n)
    assert(row.getAs[Long]("rev_units") == rev)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "part side should broadcast")
  }
}
