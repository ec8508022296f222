package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Round-3 continuation: table diff, sampling accuracy, recency-decay
  * score — brute-force recomputation on sf0.001; plus the trending
  * plan-shape pin.
  */
class ReconcileOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("tableDiff classifies dropped, perturbed and identical keys exactly") {
    val row = Relational.tableDiff(Tables.orders(spark, sfDir)).collect().head
    val keys = Tables.orders(spark, sfDir).select("o_orderkey").collect()
      .map(_.getAs[Long]("o_orderkey"))
    val dropped = keys.count(_ % 101 == 0).toLong
    val perturbed = keys.count(k => k % 101 != 0 && k % 97 == 0).toLong
    val same = keys.length - dropped - perturbed
    assert(row.getAs[Long]("n_only_a") == dropped)
    assert(row.getAs[Long]("n_only_b") == 0L)
    assert(row.getAs[Long]("n_changed") == perturbed)
    assert(row.getAs[Long]("n_same") == same)
    assert(dropped > 0 && perturbed > 0, "the synthesized drift must be visible")
  }

  test("sampleAccuracy reports exact vs hash-sampled medians") {
    val got = Relational.sampleAccuracy(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("p50_full"), r.getAs[Long]("n_sample"),
          r.getAs[Double]("p50_sample"), r.getAs[Double]("abs_err")))
      .toMap
    def pct(sorted: Seq[Long], q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) sorted(lo).toDouble
      else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
    }
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"),
        // the engine's md5 sampling idiom (the multiplicative spelling
        // was a no-op mod 10 — a last-decimal-digit sample)
        expr("cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint) % 10").as("h"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("c"), r.getAs[Long]("h")))
    for ((t, rs) <- rows.groupBy(_._1)) {
      val full = rs.map(_._2).sorted.toSeq
      val sample = rs.filter(_._3 == 0L).map(_._2).sorted.toSeq
      val (n, pf, ns, psamp, err) = got(t)
      assert(n == rs.length.toLong && ns == sample.length.toLong, t)
      assert(pf == pct(full, 0.5), t)
      assert(psamp == pct(sample, 0.5), t)
      assert(err == math.abs(psamp - pf), t)
      assert(sample.nonEmpty, t)
    }
  }

  test("recencyScore halving weights accumulate as exact 32nds") {
    val got = Relational.recencyScore(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("score_32nds"), r.getAs[Double]("score")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("s"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s"), r.getAs[Long]("c")))
    val now = rows.map(_._2).max
    val expected = rows.groupBy(_._1).map { case (u, rs) =>
      val s32 = rs.map { case (_, s, c) =>
        val w = (now - s) / 604800
        if (w > 5) 0L else c * (32L >> w.toInt)
      }.sum
      u -> (rs.length.toLong, s32)
    }
    for ((u, (n, s32)) <- expected) {
      assert(got(u) == ((n, s32, s32.toDouble / 32.0)), u)
    }
    assert(got.size == expected.size)
    // decay must actually differentiate: newest-week events weigh 32x a 5-week-old one
    assert(expected.values.map(_._2).toSet.size > 1)
  }

  test("trendingParts plan prunes each week's ranking with WindowGroupLimit") {
    val p = Analytics.trendingParts(Tables.lineitem(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }
}
