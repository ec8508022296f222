package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Map HOF battery, l-diversity, session percentiles — driver
  * recomputation on sf0.001.
  */
class MapLdivSessSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mapFuncs doubles hourly counts and keeps only >= 20") {
    val hourly = Tables.events(spark, sfDir)
      .selectExpr("event_type", "(CAST(ts AS LONG) div 3600) % 24 AS h")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.size.toLong)
    val kept = hourly.toSeq.map { case ((t, h), c) => (t, h, 2 * c) }.filter(_._3 >= 20)
    val nKept = kept.groupBy(_._1).view.mapValues(_.size.toLong)
    val rows = Analytics.mapFuncs(Tables.events(spark, sfDir)).collect()
    assert(rows.length == kept.size)
    for (r <- rows) {
      val key = (r.getString(0), r.getLong(1))
      assert(kept.contains((key._1, key._2, r.getLong(2))), s"$key")
      assert(r.getAs[Long]("n_kept") == nKept(r.getString(0)))
    }
  }

  test("lDiversity counts distinct sensitive values per QI cell") {
    val cells = Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority AS p", "year(o_orderdate) AS y", "o_orderstatus AS s")
      .collect().map(r => ((r.getString(0), r.getInt(1).toLong), r.getString(2)))
    val expect = cells.groupBy(_._1).map { case (k, vs) =>
      (k, (vs.length.toLong, vs.map(_._2).distinct.length.toLong))
    }
    val rows = Analytics.lDiversity(Tables.orders(spark, sfDir)).collect()
    assert(rows.length == expect.size)
    for (r <- rows) {
      val k = (r.getString(0), r.getLong(1))
      assert((r.getAs[Long]("n_rows"), r.getAs[Long]("l_div")) == expect(k), s"$k")
      assert(r.getAs[Boolean]("is_diverse") == (expect(k)._2 >= 2))
    }
  }

  test("sessionPercentiles matches driver sessionization order statistics") {
    val byUser = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(ts AS LONG) AS t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val durations = byUser.values.toSeq.flatMap { ts =>
      val sessions = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer(ts.head))
      for (t <- ts.tail) {
        if (t - sessions.last.last > 1800) sessions += scala.collection.mutable.ArrayBuffer(t)
        else sessions.last += t
      }
      sessions.map(s => s.max - s.min)
    }.sorted
    val n = durations.length
    def pick(p: Int): Long = durations(((p.toLong * (n - 1)) / 100 + 1).toInt - 1)
    val row = Analytics.sessionPercentiles(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_sessions") == n.toLong)
    assert(row.getAs[Long]("p50_seconds") == pick(50))
    assert(row.getAs[Long]("p90_seconds") == pick(90))
    assert(math.abs(row.getAs[Double]("mean_seconds") - durations.sum.toDouble / n) < 1e-9)
  }
}
