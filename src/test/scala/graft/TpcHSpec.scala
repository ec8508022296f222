package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Tables, TpcH}

/** Brute-force recomputation of the TPC-H remainder block on sf0.001
  * (the DuckDB oracle is the cross-engine gate; these pin the SEMANTICS
  * against straight-line Scala so a bug can't hide in a mirrored SQL
  * mistake).
  */
class TpcHSpec extends AnyFunSuite {
  import SparkTestSession._

  private def day(ts: java.sql.Timestamp): Long = ts.getTime / 1000 / 86400

  private lazy val lines = Tables.lineitem(spark, sfDir)
    .select("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount",
      "l_shipdate", "l_returnflag", "l_partkey")
    .collect()
  private lazy val ordersRows = Tables.orders(spark, sfDir)
    .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus")
    .collect()

  test("Q6: filter+sum matches a straight-line recomputation") {
    val r = TpcH.forecastRevenueChange(Tables.lineitem(spark, sfDir), "1996-01-01", "1997-01-01")
      .head()
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val sel = lines.filter { x =>
      val sd = x.getAs[java.sql.Timestamp]("l_shipdate")
      val dp = math.round(x.getAs[Double]("l_discount") * 100)
      !sd.before(lo) && sd.before(hi) && dp >= 5 && dp <= 7 &&
        math.round(x.getAs[Double]("l_quantity")) < 24
    }
    val cents = sel.map(x =>
      math.round(x.getAs[Double]("l_extendedprice") * 100) *
        math.round(x.getAs[Double]("l_discount") * 100)).sum
    assert(r.getAs[Long]("n_lines") == sel.length)
    assert(math.abs(r.getAs[Double]("revenue") - cents / 10000.0) < 1e-9)
  }

  test("Q4: semi-join counts orders with ≥1 late line, never double-counts") {
    val rows = TpcH.orderPriorityCheck(
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir),
      "1996-01-01", "1996-04-01").collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("order_count")).toMap
    val lateByOrder = lines.groupBy(_.getAs[Long]("l_orderkey"))
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-04-01 00:00:00")
    val expected = ordersRows.filter { o =>
      val od = o.getAs[java.sql.Timestamp]("o_orderdate")
      !od.before(lo) && od.before(hi) &&
        lateByOrder.getOrElse(o.getAs[Long]("o_orderkey"), Array.empty[org.apache.spark.sql.Row])
          .exists(l => day(l.getAs[java.sql.Timestamp]("l_shipdate")) > day(od) + 30)
    }.groupBy(_.getAs[String]("o_orderpriority")).view.mapValues(_.length.toLong).toMap
    assert(rows == expected)
    assert(rows.values.sum > 0)
  }

  test("Q13: distribution covers every customer exactly once (0 bucket included)") {
    val dist = TpcH.customerDistribution(Tables.customer(spark, sfDir), Tables.orders(spark, sfDir))
      .collect().map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    val nCust = Tables.customer(spark, sfDir).count()
    assert(dist.values.sum == nCust)
    val perCust = ordersRows.filter(_.getAs[String]("o_orderpriority") != "1-URGENT")
      .groupBy(_.getAs[Long]("o_custkey")).view.mapValues(_.length.toLong).toMap
    val zero = nCust - perCust.size
    assert(dist.getOrElse(0L, 0L) == zero)
    val expected = perCust.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    expected.foreach { case (c, n) => assert(dist(c) == n, s"bucket $c") }
  }

  test("Q21: every reported supplier was the ONLY late supplier on each counted order") {
    val evid = lines.map { l =>
      val o = ordersRows.find(_.getAs[Long]("o_orderkey") == l.getAs[Long]("l_orderkey")).get
      (l.getAs[Long]("l_orderkey"), l.getAs[Long]("l_suppkey"),
        day(l.getAs[java.sql.Timestamp]("l_shipdate")) >
          day(o.getAs[java.sql.Timestamp]("o_orderdate")) + 90)
    }.distinct
    val byOrder = evid.groupBy(_._1)
    def numwait(supp: Long): Long = evid.count { case (ok, sk, late) =>
      sk == supp && late && {
        val others = byOrder(ok).filter(_._2 != supp)
        others.nonEmpty && !others.exists(_._3)
      }
    }.toLong
    val out = TpcH.suppliersKeptWaiting(
      Tables.supplier(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir), Tables.nation(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("numwait") == numwait(r.getAs[Long]("s_suppkey")),
        s"supplier ${r.getAs[Long]("s_suppkey")}")
    }
    // ranks descend by numwait
    val nw = out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("numwait"))
    assert(nw.zip(nw.tail).forall { case (a, b) => a >= b })
  }

  test("Q15: returns exactly the argmax supplier set") {
    val out = TpcH.topSupplier(
      Tables.supplier(spark, sfDir), Tables.lineitem(spark, sfDir),
      "1996-01-01", "1996-04-01").collect()
    assert(out.nonEmpty)
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-04-01 00:00:00")
    val rev = lines.filter { x =>
      val sd = x.getAs[java.sql.Timestamp]("l_shipdate"); !sd.before(lo) && sd.before(hi)
    }.groupBy(_.getAs[Long]("l_suppkey")).view.mapValues(_.map(x =>
      math.round(x.getAs[Double]("l_extendedprice") * 100) *
        (100 - math.round(x.getAs[Double]("l_discount") * 100))).sum).toMap
    val mx = rev.values.max
    assert(out.map(_.getAs[Long]("s_suppkey")).toSet == rev.filter(_._2 == mx).keySet)
    out.foreach(r => assert(math.abs(r.getAs[Double]("total_revenue") - mx / 10000.0) < 1e-9))
  }

  test("Q2: every reported supplier offers its part at the regional minimum cost") {
    val out = TpcH.minCostSupplier(
      Tables.part(spark, sfDir), Tables.supplier(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.region(spark, sfDir), Tables.lineitem(spark, sfDir)).collect()
    assert(out.nonEmpty)
    val offers = TpcH.supplyEvidence(Tables.lineitem(spark, sfDir))
      .join(Tables.supplier(spark, sfDir), col("ps_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.part(spark, sfDir).filter(col("p_type") === "ECONOMY"),
        col("ps_partkey") === col("p_partkey"))
      .select("ps_partkey", "ps_suppkey", "ps_cost_cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val minByPart = offers.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    out.foreach { r =>
      val (pk, cost) = (r.getAs[Long]("p_partkey"), r.getAs[Long]("ps_cost_cents"))
      assert(cost == minByPart(pk), s"part $pk: $cost vs min ${minByPart(pk)}")
    }
  }

  test("Q20: reported suppliers shipped >half their all-time promo-part qty in the year") {
    val out = TpcH.promoSupplyConcentration(
      Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir),
      Tables.supplier(spark, sfDir), Tables.nation(spark, sfDir)).collect()
    assert(out.nonEmpty)
    val promo = Tables.part(spark, sfDir).filter(col("p_name").contains("red"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    def qty(rows: Array[org.apache.spark.sql.Row]) = rows.map(x =>
      math.round(x.getAs[Double]("l_quantity"))).sum
    val bySuppPart = lines.groupBy(l => (l.getAs[Long]("l_suppkey"), l.getAs[Long]("l_partkey")))
    val expected = bySuppPart.collect {
      case ((sk, pk), rs) if promo(pk) && {
        val inYear = rs.filter { l =>
          val d = l.getAs[java.sql.Timestamp]("l_shipdate"); !d.before(lo) && d.before(hi)
        }
        2 * qty(inYear) > qty(rs)
      } => sk
    }.toSet
    assert(out.map(_.getAs[Long]("s_suppkey")).toSet == expected)
  }

  test("Q11: kept parts are exactly those above 2x the average nation value") {
    val out = TpcH.importantStock(
      Tables.lineitem(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.nation(spark, sfDir)).collect()
    assert(out.nonEmpty)
    val shares = out.map(_.getAs[Double]("value_share"))
    // every kept part exceeds 2/n of total, and shares are consistent
    val n = TpcH.supplyEvidence(Tables.lineitem(spark, sfDir))
      .join(Tables.supplier(spark, sfDir), col("ps_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select("ps_partkey").distinct().count()
    shares.foreach(s => assert(s > 2.0 / n))
  }

  test("physical plans keep the scale shapes: semi/anti joins, broadcasts, TakeOrdered") {
    def plan(q: String): String =
      SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
    val q4 = plan("q_tpch_q4")
    assert(q4.contains("LeftSemi"), "Q4 EXISTS must plan as a semi join")
    val q21 = plan("q_tpch_q21")
    // round-7 shape: the EXISTS/NOT EXISTS pair folds into one per-order
    // aggregate (distinct supplier / distinct late-supplier counts) whose
    // qualifying orders semi-join back — so the plan pins ONE semi join
    // and NO anti join (TpcH.suppliersKeptWaiting scaladoc)
    assert(q21.contains("LeftSemi") && !q21.contains("LeftAnti"),
      "Q21 must plan as per-order aggregate + semi join (no anti join)")
    val q22 = plan("q_tpch_q22")
    assert(q22.contains("LeftAnti"), "Q22 NOT EXISTS must plan as an anti join")
    val q9 = plan("q_tpch_q9")
    assert("BroadcastHashJoin".r.findAllIn(q9).size >= 3,
      "Q9's part/supplier/nation dimension legs must all broadcast")
    Seq("q_tpch_q10", "q_tpch_q18", "q_tpch_q2").foreach { q =>
      assert(plan(q).contains("TakeOrderedAndProject"),
        s"$q top-k must be a TakeOrdered, not a global sort")
    }
  }

  test("Q18/Q22 return rows at sf0.001 (threshold sanity for the rows>0 gate)") {
    assert(TpcH.largeVolumeCustomers(
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir)).count() > 0)
    assert(TpcH.globalSalesOpportunity(
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.nation(spark, sfDir)).count() > 0)
  }
}
