package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Round-3 continuation: changepoint, Theil–Sen slope, k-anonymity —
  * brute-force recomputation on sf0.001.
  */
class SegmentPrivacySpec extends AnyFunSuite {
  import SparkTestSession._

  private def daily(): Seq[(Long, Long)] =
    Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS DATE)").as("d"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("d").agg(sum("c").as("x"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay, r.getAs[Long]("x")))
      .sortBy(_._1)
      .toSeq

  test("changepoint picks the split minimizing total within-segment SSE") {
    val row = Analytics.changepoint(Tables.events(spark, sfDir)).collect().head
    val xs = daily().map(_._2)
    def sse(seg: Seq[Long]): Double = {
      val n = seg.length.toDouble
      val s = seg.sum.toDouble
      seg.map(v => v.toDouble * v).sum - s * s / n
    }
    val best = (1 until xs.length)
      .map(k => (k, sse(xs.take(k)) + sse(xs.drop(k))))
      .minBy { case (k, c) => (c, k) }
    assert(row.getAs[Long]("n_left") == best._1.toLong)
    assert(row.getAs[Long]("n_right") == (xs.length - best._1).toLong)
    assert(math.abs(row.getAs[Double]("cost") - best._2) < 1e-6 * math.abs(best._2))
    val splitDay = daily()(best._1 - 1)._1
    assert(row.getAs[Long]("split_day") == splitDay)
  }

  test("theilSen median pairwise slope matches the direct computation") {
    val row = Analytics.theilSen(Tables.events(spark, sfDir)).collect().head
    val ds = daily()
    val slopes = (for {
      i <- ds.indices
      j <- (i + 1) until ds.length
    } yield {
      val q = (ds(j)._2 - ds(i)._2).toDouble * 1000 / (ds(j)._1 - ds(i)._1).toDouble
      (if (q >= 0) math.floor(q + 0.5) else math.ceil(q - 0.5)).toLong
    }).sorted
    assert(row.getAs[Long]("n_pairs") == slopes.length.toLong)
    val pos = 0.5 * (slopes.length - 1)
    val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
    val med =
      if (lo == hi) slopes(lo).toDouble
      else slopes(lo) * (hi - pos) + slopes(hi) * (pos - lo)
    assert(row.getAs[Double]("slope_milli_median") == med)
  }

  test("kAnonymity tallies below-k QI groups exactly") {
    val row = Relational.kAnonymity(Tables.events(spark, sfDir)).collect().head
    val groups = Tables.events(spark, sfDir)
      .select(
        col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT) div 2000").as("band"),
        expr("CAST(ts AS DATE)").as("day"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("band"),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    assert(row.getAs[Long]("n_groups") == groups.length.toLong)
    assert(row.getAs[Long]("min_group") == groups.min)
    assert(row.getAs[Long]("n_groups_below_k") == groups.count(_ < 5).toLong)
    assert(row.getAs[Long]("n_rows_below_k") == groups.filter(_ < 5).sum)
    assert(row.getAs[Long]("n_rows") == groups.sum)
    val frac = groups.filter(_ < 5).sum.toDouble / groups.sum.toDouble
    assert(math.abs(row.getAs[Double]("risk_frac") - frac) < 1e-12)
  }
}
