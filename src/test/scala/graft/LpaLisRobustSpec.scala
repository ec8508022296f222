package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Graph, Tables}
import graft.text.TextAnalysis

/** Label propagation, monotone subsequences, robust scaler — driver
  * recomputation on sf0.001.
  */
class LpaLisRobustSpec extends AnyFunSuite {
  import SparkTestSession._

  test("labelPropagation matches a driver synchronous 2-round sweep") {
    val op = Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey AS ok", "l_partkey AS pk").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for ((_, group) <- op.groupBy(_._1)) {
      val ps = group.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) {
        val e = (ps(i), ps(j))
        pairCount(e) = pairCount.getOrElse(e, 0) + 1
      }
    }
    // NB: .collect on a Map yielding tuples would rebuild a Map and silently
    // dedup by first element — go through an iterator
    val edges = pairCount.iterator.collect { case (e, c) if c >= 2 => e }.toSeq
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    for ((a, b) <- edges) { adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    var labels: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 2) {
      val prev = labels
      labels = adj.map { case (v, nbrs) =>
        val votes = (prev(v) :: nbrs.map(prev))
          .groupBy(identity).map { case (lbl, occ) => (lbl, occ.size) }
        v -> votes.minBy { case (lbl, n) => (-n, lbl) }._1
      }.toMap
    }
    val expect = labels.values.groupBy(identity).map { case (lbl, vs) => (lbl, vs.size.toLong) }
    val got = Graph.labelPropagation(Tables.lineitem(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect)
  }

  test("monotoneSubseq equals the classic quadratic DP") {
    val ys = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    def lis(cmp: (Long, Long) => Boolean): Int = {
      val dp = Array.fill(ys.length)(1)
      for (i <- ys.indices; j <- 0 until i if cmp(ys(j), ys(i)))
        dp(i) = math.max(dp(i), dp(j) + 1)
      dp.max
    }
    val row = Analytics.monotoneSubseq(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == ys.length.toLong)
    assert(row.getAs[Long]("lis_len") == lis(_ < _).toLong)
    assert(row.getAs[Long]("lds_len") == lis(_ > _).toLong)
  }

  test("robustScale quartiles are the documented order statistics per source") {
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = docs.groupBy(_._2)
    val rows = TextAnalysis.robustScale(Tables.documents(spark, sfDir)).collect()
    assert(rows.length == docs.length)
    for (row <- rows) {
      val src = row.getAs[String]("source")
      val sorted = bySource(src).map(_._3).sorted
      val n = sorted.length
      val med = sorted((n + 1) / 2 - 1)
      val q1 = sorted((n + 3) / 4 - 1)
      val q3 = sorted((3 * n + 1) / 4 - 1)
      assert(row.getAs[Long]("med") == med)
      assert(row.getAs[Long]("iqr") == q3 - q1)
      if (q3 != q1)
        assert(math.abs(
          row.getAs[Double]("scaled") - (row.getAs[Long]("n_chars") - med).toDouble / (q3 - q1)) < 1e-12)
    }
  }
}
