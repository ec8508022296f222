package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Round-3 continuation: zone-map skipping readout, Mann–Kendall trend,
  * mergeable-aggregate identity — brute-force recomputation on sf0.001.
  */
class LayoutTrendSpec extends AnyFunSuite {
  import SparkTestSession._

  test("zoneMapSkipping prunes exactly the zones whose min/max miss the window") {
    val got = Relational.zoneMapSkipping(Tables.lineitem(spark, sfDir)).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_zones"), r.getAs[Long]("n_pruned"),
          r.getAs[Long]("rows_total"), r.getAs[Long]("rows_scanned")))
      .toMap
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), expr("CAST(l_shipdate AS DATE)").as("d"))
      .collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"),
        r.getAs[java.sql.Date]("d").toLocalDate))
    val lo = java.time.LocalDate.of(1998, 1, 1)
    val hi = java.time.LocalDate.of(1999, 1, 1)
    def summarize(zoned: Seq[(Long, java.time.LocalDate)]): (Long, Long, Long, Long) = {
      val byZone = zoned.groupBy(_._1).values.toSeq
      val pruned = byZone.filter { z =>
        val ds = z.map(_._2)
        ds.max.isBefore(lo) || !ds.min.isBefore(hi)
      }
      (byZone.size.toLong, pruned.size.toLong, zoned.size.toLong,
        zoned.size.toLong - pruned.map(_.size).sum.toLong)
    }
    val mk = rows.map(_._1).max
    val natural = rows.map(r => (r._1 * 64 / (mk + 1), r._3)).toSeq
    val clustered = rows.toSeq
      .sortBy(r => (r._3.toEpochDay, r._1, r._2))
      .zipWithIndex
      .map { case (r, i) => (i.toLong * 64 / rows.length, r._3) }
    assert(got("natural") == summarize(natural))
    assert(got("clustered") == summarize(clustered))
    // the clustered layout must dominate: pruning ≥ natural
    assert(got("clustered")._2 >= got("natural")._2)
  }

  test("mannKendall S and z match the direct pairwise computation") {
    val row = Analytics.mannKendall(Tables.events(spark, sfDir)).collect().head
    val daily = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS DATE)").as("d"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("d").agg(sum("c").as("x"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay, r.getAs[Long]("x")))
      .sortBy(_._1)
    val n = daily.length.toLong
    var s = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length)
      s += java.lang.Long.signum(daily(j)._2 - daily(i)._2).toLong
    val tie3 = daily.groupBy(_._2).values
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) })
      .sum
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("s_stat") == s)
    val sigma = math.sqrt((n * (n - 1) * (2 * n + 5) - tie3).toDouble / 18.0)
    val num = if (s > 0) (s - 1).toDouble else if (s < 0) (s + 1).toDouble else 0.0
    assert(math.abs(row.getAs[Double]("z") - num / sigma) < 1e-12)
  }

  test("mergeStats merged partials equal the direct aggregate") {
    val got = Analytics.mergeStats(Tables.events(spark, sfDir)).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Boolean]("merge_exact"), r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_partials") == 2L)
    }
    val vals = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("c")))
    val expected = vals.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.length.toLong, xs.map(_._2).sum, xs.map(v => v._2 * v._2).sum)
    }
    got.foreach { r =>
      val (n, sm, ss) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("sum_cents") == sm)
      assert(r.getAs[Long]("sumsq_cents") == ss)
      val mean = sm.toDouble / n / 100.0
      assert(math.abs(r.getAs[Double]("mean_dollars") - mean) < 1e-9)
      val variance = (ss.toDouble - sm.toDouble * sm.toDouble / n) / (n - 1).toDouble
      assert(math.abs(r.getAs[Double]("stddev_dollars") - math.sqrt(variance) / 100.0) < 1e-9)
    }
  }
}
