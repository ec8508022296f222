package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Joins, Tables}
import graft.text.TextAnalysis

/** Round 4: full-outer ledger reconciliation, KMV θ-sketch intersection,
  * Brier decomposition — brute-force recomputation on sf0.001.
  */
class ReconKmvBrierSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fullOuterActivity keeps every key from either side with zero-fill") {
    val rows = Joins.fullOuterActivity(
      Tables.orders(spark, sfDir), Tables.events(spark, sfDir)).collect()
    val oKeys = Tables.orders(spark, sfDir)
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val eKeys = Tables.events(spark, sfDir)
      .select(col("user_id")).collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("key")).toSet == (oKeys ++ eKeys))
    for (r <- rows) {
      val k = r.getAs[Long]("key")
      val side = r.getAs[String]("side")
      assert(side == (if (oKeys(k) && eKeys(k)) "both"
        else if (oKeys(k)) "orders_only" else "events_only"))
      if (!oKeys(k)) assert(r.getAs[Long]("n_orders") == 0L && r.getAs[Long]("order_cents") == 0L)
      if (!eKeys(k)) assert(r.getAs[Long]("n_events") == 0L)
      assert(r.getAs[Long]("n_orders") > 0L || r.getAs[Long]("n_events") > 0L)
    }
  }

  test("kmvIntersect estimates track the exact counts") {
    val row = TextAnalysis.kmvIntersect(Tables.documents(spark, sfDir)).collect().head
    val toks = Tables.documents(spark, sfDir)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.split("\\s+").distinct.map(t => (r.getString(0), t)))
      .distinct
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes).take(4).map("%02x".format(_)).mkString, 16)
    }
    val byH = toks.map { case (src, t) => (h32(t), src) }.groupBy(_._1)
    val nUnion = byH.size.toLong
    val nInter = byH.count(_._2.map(_._2).distinct.size == 2).toLong
    assert(row.getAs[Long]("n_union_exact") == nUnion)
    assert(row.getAs[Long]("n_inter_exact") == nInter)
    val theta = byH.keys.toSeq.sorted.take(64).max
    assert(row.getAs[Long]("theta") == theta)
    // the union estimate should be within 50% of truth at k=64
    val est = row.getAs[Double]("est_union")
    assert(est > nUnion * 0.5 && est < nUnion * 1.5)
    assert(row.getAs[Double]("est_inter") <= est)
  }

  test("brierDecomposition satisfies the Murphy identity with zero reliability") {
    val row = Analytics.brierDecomposition(Tables.events(spark, sfDir)).collect().head
    val events = Tables.events(spark, sfDir)
      .select(hour(col("ts")).as("hr"), (col("event_type") === "purchase").as("y"))
      .collect().map(r => (r.getInt(0), r.getBoolean(1)))
    val n = events.length.toDouble
    val ybar = events.count(_._2) / n
    val bins = events.groupBy(_._1)
    // in-sample predictor => brier = unc - res exactly (up to quantization)
    assert(math.abs(row.getAs[Double]("ybar") - ybar) < 1e-12)
    assert(math.abs(row.getAs[Double]("unc") - ybar * (1 - ybar)) < 1e-12)
    assert(math.abs(
      row.getAs[Double]("brier") - (row.getAs[Double]("unc") - row.getAs[Double]("res"))) < 1e-5)
    // direct recomputation of the resolution term
    val res = bins.values.map { xs =>
      val nk = xs.length.toDouble
      val pk = xs.count(_._2) / nk
      math.round(nk * (pk - ybar) * (pk - ybar) * 1e6)
    }.sum / 1e6 / n
    assert(math.abs(row.getAs[Double]("res") - res) < 1e-12)
    assert(row.getAs[Long]("n_bins") == bins.size.toLong)
  }
}
