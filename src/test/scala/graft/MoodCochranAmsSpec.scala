package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Inference, Tables}
import graft.text.TextAnalysis

/** Mood's median test, Cochran's Q, AMS F₂ sketch — brute-force
  * recomputation on sf0.001.
  */
class MoodCochranAmsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("moodMedian matches a driver-side median and 2x2 table") {
    val vals = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = vals.length.toLong
    // lower median: smallest x with 2*cum(x) >= n on the value grid
    val grid = vals.groupBy(_._2).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val median = grid
      .scanLeft((Long.MinValue, 0L)) { case ((_, cum), (x, c)) => (x, cum + c) }
      .collectFirst { case (x, cum) if x != Long.MinValue && 2L * cum >= n => x }
      .get
    val aAbove = vals.count { case (t, x) => t == "purchase" && x > median }.toLong
    val aBelow = vals.count { case (t, x) => t == "purchase" && x <= median }.toLong
    val bAbove = vals.count { case (t, x) => t == "click" && x > median }.toLong
    val bBelow = vals.count { case (t, x) => t == "click" && x <= median }.toLong
    val row = Inference.moodMedian(Tables.events(spark, sfDir), "purchase", "click")
      .collect().head
    assert(row.getAs[Long]("median_cents") == median)
    assert(row.getAs[Long]("a_above") == aAbove)
    assert(row.getAs[Long]("a_below") == aBelow)
    assert(row.getAs[Long]("b_above") == bAbove)
    assert(row.getAs[Long]("b_below") == bBelow)
    val nAll = (aAbove + aBelow + bAbove + bBelow).toDouble
    val ad_bc = math.abs(aAbove.toDouble * bBelow - aBelow.toDouble * bAbove)
    val g = math.max(ad_bc - nAll / 2.0, 0.0)
    val expect = nAll * g / (aAbove + aBelow) * (g / (bAbove + bBelow)) /
      (aAbove + bAbove) / (aBelow + bBelow)
    assert(math.abs(row.getAs[Double]("chi2") - expect) < 1e-9)
  }

  test("cochranQ matches the closed form over driver-side indicators") {
    val types = Seq("view", "click", "purchase")
    val cells = Tables.events(spark, sfDir)
      .filter(col("event_type").isin(types: _*))
      .select(
        col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val pres = cells.filter(_._2 >= 10000L).keySet
    val users = cells.keySet.map(_._1)
    val rSums = users.toSeq.map(u => types.count(t => pres((u, t))).toLong)
    val cSums = types.map(t => users.count(u => pres((u, t))).toLong)
    val t = rSums.sum
    val sumR2 = rSums.map(r => r * r).sum
    val sumC2 = cSums.map(c => c * c).sum
    val k = 3L
    val row = Inference.cochranQ(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_users") == users.size.toLong)
    assert(row.getAs[Long]("t") == t)
    assert(row.getAs[Long]("sum_r2") == sumR2)
    assert(row.getAs[Long]("sum_c2") == sumC2)
    val expect = ((k - 1) * (k * sumC2 - t * t)).toDouble / (k * t - sumR2).toDouble
    assert(math.abs(row.getAs[Double]("q_stat") - expect) < 1e-9)
  }

  test("amsF2 exact F2 matches and the sketch estimate is the signed bucket sum of squares") {
    val counts = Tables.documents(spark, sfDir)
      .select(explode(expr("split(trim(text), '\\\\s+')")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val f2Exact = counts.map { case (_, c) => c * c }.sum
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val buckets = counts
      .groupBy { case (tok, _) => java.lang.Long.parseLong(md5hex(tok).substring(0, 8), 16) % 256 }
      .map { case (_, toks) =>
        toks.map { case (tok, c) =>
          val sgn = java.lang.Long.parseLong(md5hex(tok).substring(16, 17), 16) % 2 * 2 - 1
          sgn * c
        }.sum
      }
    val f2Est = buckets.map(s => s * s).sum
    val row = TextAnalysis.amsF2(Tables.documents(spark, sfDir)).collect().head
    assert(row.getAs[Long]("f2_exact") == f2Exact)
    assert(row.getAs[Long]("f2_est") == f2Est)
    assert(row.getAs[Long]("n_buckets") == buckets.size.toLong)
  }
}
