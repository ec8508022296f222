package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Graph, Relational, Tables}

/** Adstock regression, graph census, knee point — driver recomputation on
  * sf0.001.
  */
class AdstockCensusKneeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("adstockRegression folds carryover and OLS stats in one pass") {
    val ds = Tables.events(spark, sfDir)
      .selectExpr(
        "CAST(ts AS LONG) div 86400 AS d",
        "CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0L END AS p",
        "CASE WHEN event_type = 'click' THEN 1L ELSE 0L END AS c")
      .groupBy("d").sum("p", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var a = 0L
    var (n, sa, saa, sy, syy, say) = (0L, 0L, 0L, 0L, 0L, 0L)
    for ((_, y, x) <- ds) {
      a = x + a / 2
      n += 1; sa += a; saa += a * a; sy += y; syy += y * y; say += a * y
    }
    val nd = n.toDouble
    val cxx = saa / nd - (sa / nd) * (sa / nd)
    val cxy = say / nd - (sa / nd) * (sy / nd)
    val cyy = syy / nd - (sy / nd) * (sy / nd)
    val row = Analytics.adstockRegression(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(math.abs(row.getAs[Double]("beta") - cxy / cxx) < 1e-9 * math.abs(cxy / cxx))
    assert(math.abs(row.getAs[Double]("r2") - cxy * cxy / (cxx * cyy)) < 1e-9)
    assert(row.getAs[Double]("r2") >= 0.0 && row.getAs[Double]("r2") <= 1.0 + 1e-12)
  }

  test("graphCensus counts nodes/edges of the thresholded co-order graph") {
    val op = Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey AS ok", "l_partkey AS pk").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pc = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for ((_, g) <- op.groupBy(_._1)) {
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pc((ps(i), ps(j))) = pc.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val edges = pc.iterator.collect { case (e, c) if c >= 2 => e }.toSeq
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val row = Graph.graphCensus(Tables.lineitem(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
    assert(row.getAs[Long]("n_nodes") == nodes.size.toLong)
    assert(row.getAs[Long]("n_catalog") == op.map(_._2).distinct.size.toLong)
    val degs = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).values.map(_.size)
    assert(row.getAs[Long]("max_degree") == degs.max.toLong)
  }

  test("kneePoint maximizes the integer chord deviation") {
    val rev = Tables.lineitem(spark, sfDir)
      .selectExpr(
        "l_partkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS r")
      .groupBy("l_partkey").sum("r")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = rev.sortBy { case (pk, r) => (-r, pk) }
    val t = sorted.map(_._2).sum
    val n = sorted.length.toLong
    var cum = 0L
    val devs = sorted.zipWithIndex.map { case ((pk, r), idx) =>
      cum += r
      (cum * n - t * (idx + 1), idx + 1L, pk, cum)
    }
    val best = devs.maxBy { case (d, i, _, _) => (d, -i) }
    val row = Relational.kneePoint(Tables.lineitem(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_parts") == n)
    assert(row.getAs[Long]("knee_rank") == best._2)
    assert(row.getAs[Long]("knee_partkey") == best._3)
    // the argmax runs on the DECIMAL(38,0) grid (BIGINT overflows
    // ~1.5x sf0.1); the reported deviation is its double rendering
    assert(row.getAs[Double]("dev_scaled") == best._1.toDouble)
  }
}
