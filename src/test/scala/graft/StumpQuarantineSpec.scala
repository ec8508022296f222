package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Round-3 continuation: quarantine router, decision stump, Cronbach α —
  * brute-force recomputation on sf0.001.
  */
class StumpQuarantineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("quarantineRouter routes synthesized corruption by reason") {
    val got = Relational.quarantineRouter(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("reason") -> (r.getAs[Long]("n_rows"), r.getAs[Long]("k_sum")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("props")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("props")))
    val pat = "^\\{\"k\": [0-9]+\\}$".r
    val kPat = "\"k\": ([0-9]+)".r
    var (nNull, nBad, nOk, kSum) = (0L, 0L, 0L, 0L)
    rows.foreach { case (id, props) =>
      val p = if (id % 13 == 0) null else if (id % 11 == 0) props + "x" else props
      if (p == null) nNull += 1
      else if (pat.findFirstIn(p).isEmpty) nBad += 1
      else { nOk += 1; kSum += kPat.findFirstMatchIn(p).get.group(1).toLong }
    }
    assert(got("null_props") == ((nNull, 0L)))
    assert(got("malformed") == ((nBad, 0L)))
    assert(got("ok") == ((nOk, kSum)))
  }

  test("decisionStump finds the min-Gini threshold") {
    val row = Analytics.decisionStump(Tables.events(spark, sfDir)).collect().head
    val rows = Tables.events(spark, sfDir)
      .select(expr("CAST(round(value * 100) AS BIGINT) div 100").as("x"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[String]("event_type")))
    val xs = rows.map(_._1).distinct.sorted
    val best = xs.flatMap { t =>
      val (l, r) = rows.partition(_._1 <= t)
      if (l.isEmpty || r.isEmpty) None
      else {
        def cost(side: Array[(Long, String)]): Double = {
          val n = side.length.toDouble
          val sq = side.groupBy(_._2).values.map(g => g.length.toLong * g.length).sum
          n - sq.toDouble / n
        }
        Some((t, l.length.toLong, r.length.toLong, cost(l) + cost(r)))
      }
    }.minBy { case (t, _, _, c) => (c, t) }
    assert(row.getAs[Long]("split_dollars") == best._1)
    assert(row.getAs[Long]("l_rows") == best._2)
    assert(row.getAs[Long]("r_rows") == best._3)
    assert(math.abs(row.getAs[Double]("gini_cost") - best._4) < 1e-9)
  }

  test("cronbachAlpha matches the item-variance computation") {
    val row = Analytics.cronbachAlpha(Tables.events(spark, sfDir)).collect().head
    val items = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG) div 86400").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("d"), r.getAs[Long]("c")))
      .groupBy(_._1)
      .map { case (_, es) =>
        (es.length.toLong, es.map(_._2).distinct.length.toLong, es.map(_._3).sum / 100)
      }
      .toSeq
    val n = items.length.toDouble
    def ss(xs: Seq[Long]): Double = {
      val s = xs.sum.toDouble
      xs.map(x => x.toDouble * x).sum - s * s / n
    }
    val ssT = ss(items.map(i => i._1 + i._2 + i._3))
    val alpha = (3.0 / 2.0) *
      (1.0 - (ss(items.map(_._1)) + ss(items.map(_._2)) + ss(items.map(_._3))) / ssT)
    assert(row.getAs[Long]("n") == items.length.toLong)
    assert(math.abs(row.getAs[Double]("alpha") - alpha) < 1e-9)
    // items are positively correlated engagement measures: alpha in (0, 1]
    assert(row.getAs[Double]("alpha") > 0.0 && row.getAs[Double]("alpha") <= 1.0)
  }
}
