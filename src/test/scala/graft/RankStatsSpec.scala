package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Round-3 continuation: Kendall τ-b, runs test, portable HyperLogLog —
  * brute-force recomputation on sf0.001.
  */
class RankStatsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def dailySeries(): Seq[(Long, Long, Long)] =
    Tables.events(spark, sfDir)
      .select(
        expr("CAST(ts AS DATE)").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"),
        col("user_id"))
      .groupBy("d")
      .agg(sum("c").as("x"), countDistinct("user_id").as("y"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay,
        r.getAs[Long]("x"), r.getAs[Long]("y")))
      .sortBy(_._1)
      .toSeq

  test("kendallTau matches the direct pairwise concordance count") {
    val row = Analytics.kendallTau(Tables.events(spark, sfDir)).collect().head
    val daily = dailySeries()
    var s = 0L
    var tx = 0L
    var ty = 0L
    var n0 = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      n0 += 1
      s += java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong *
        java.lang.Long.signum(daily(j)._3 - daily(i)._3).toLong
      if (daily(j)._2 == daily(i)._2) tx += 1
      if (daily(j)._3 == daily(i)._3) ty += 1
    }
    assert(row.getAs[Long]("n0") == n0)
    assert(row.getAs[Long]("s_stat") == s)
    assert(row.getAs[Long]("tx_pairs") == tx)
    assert(row.getAs[Long]("ty_pairs") == ty)
    val tau = s.toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    assert(math.abs(row.getAs[Double]("tau_b") - tau) < 1e-12)
  }

  test("runsTest counts sign runs around the median with equal days dropped") {
    val row = Analytics.runsTest(Tables.events(spark, sfDir)).collect().head
    val xs = dailySeries().map(_._2)
    val sorted = xs.sorted
    val pos = 0.5 * (sorted.length - 1)
    val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
    val med =
      if (lo == hi) sorted(lo).toDouble
      else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
    val signs = xs.filter(_.toDouble != med).map(x => if (x > med) 1 else 0)
    val n1 = signs.count(_ == 1).toLong
    val n2 = signs.count(_ == 0).toLong
    val r = if (signs.isEmpty) 0L
    else 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1)).toLong
    assert(row.getAs[Long]("n1") == n1)
    assert(row.getAs[Long]("n2") == n2)
    assert(row.getAs[Long]("r") == r)
    val nn = (n1 + n2).toDouble
    val mu = 2.0 * n1 * n2 / nn + 1.0
    val sigma = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn * nn * (nn - 1.0)))
    assert(math.abs(row.getAs[Double]("z") - (r.toDouble - mu) / sigma) < 1e-12)
  }

  test("hllDistinct registers and estimate match the per-key hash simulation") {
    val got = Analytics.hllDistinct(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_used"), r.getAs[Long]("n_exact"), r.getAs[Double]("hll_est")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("concat(CAST(user_id AS STRING), '-', CAST(CAST(ts AS DATE) AS STRING))").as("k"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("k")))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      md.reset()
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val regs = scala.collection.mutable.Map.empty[Long, Int]
      rs.foreach { case (_, k) =>
        val h = h32(k)
        val bucket = h >> 24
        val rem = h & 16777215L
        val rho = if (rem == 0) 25 else 1 + java.lang.Long.numberOfLeadingZeros(rem) - 40
        regs(bucket) = math.max(regs.getOrElse(bucket, 0), rho)
      }
      val sInt = regs.values.map(r => 1L << (25 - r)).sum +
        (256L - regs.size) * 33554432L
      val est = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 33554432.0 / sInt.toDouble
      val exact = rs.map(_._2).distinct.length.toLong
      val (gotUsed, gotExact, gotEst) = got(t)
      assert(gotUsed == regs.size.toLong, s"$t n_used")
      assert(gotExact == exact, s"$t n_exact")
      assert(math.abs(gotEst - est) < 1e-9, s"$t est")
    }
  }
}
