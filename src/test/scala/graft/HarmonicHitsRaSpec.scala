package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Graph, Tables}

/** Harmonic centrality, HITS, resource-allocation link prediction —
  * brute-force recomputation on sf0.001.
  */
class HarmonicHitsRaSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val edges: Set[(Long, Long)] =
    Graph.coOrderEdges(Tables.lineitem(spark, sfDir))
      .filter(col("w") >= 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  private lazy val adj: Map[Long, Set[Long]] = {
    val bidir = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    bidir.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("harmonicTopK matches a driver BFS from the top-degree seeds") {
    val seeds = adj.toSeq
      .map { case (n, nbs) => (n, nbs.size) }
      .sortBy { case (n, d) => (-d, n) }
      .take(10).map(_._1)
    val expect = seeds.map { s =>
      var dist = Map(s -> 0)
      var frontier = Set(s)
      for (h <- 1 to 3) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
        dist = dist ++ next.map(_ -> h)
        frontier = next
      }
      val byHop = dist.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
      (s, byHop.getOrElse(1, 0L), byHop.getOrElse(2, 0L), byHop.getOrElse(3, 0L))
    }
    val got = Graph.harmonicTopK(Tables.lineitem(spark, sfDir))
      .collect()
      .map(r => (r.getAs[Long]("seed"), r.getAs[Long]("n1"), r.getAs[Long]("n2"),
        r.getAs[Long]("n3"), r.getAs[Long]("h6")))
      .sortBy(_._1)
    assert(got.map(_._1).toSet == seeds.toSet)
    for ((s, n1, n2, n3) <- expect) {
      val g = got.find(_._1 == s).get
      assert((g._2, g._3, g._4) == ((n1, n2, n3)), s"seed $s")
      assert(g._5 == 6 * n1 + 3 * n2 + 2 * n3, s"h6 for seed $s")
    }
  }

  test("hitsTopK matches two driver-side quantized iterations") {
    val be = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def renorm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max.toDouble
      m.view.mapValues(v => math.round(v.toDouble * 1000 / mx)).toMap
    }
    val hub1 = renorm(be.groupBy(_._1).view.mapValues(_.size.toLong * 1000).toMap)
    val auth1 = renorm(be.groupBy(_._2).view.mapValues(_.map(e => hub1(e._1)).sum).toMap)
    val hub2 = renorm(be.groupBy(_._1).view.mapValues(_.map(e => auth1(e._2)).sum).toMap)
    val auth2 = be.groupBy(_._2).view.mapValues(_.map(e => hub2(e._1)).sum).toMap
    val expectTop = auth2.toSeq.sortBy { case (p, a) => (-a, p) }.take(20)
    val got = Graph.hitsTopK(Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir))
      .collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("auth_raw")))
    assert(got.toSeq == expectTop)
  }

  test("resourceAllocationTopK scores are the micro-quantized 1/deg sums") {
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val pairs = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((z, nbs) <- adj; x <- nbs; y <- nbs if x < y) {
      val (cn, ra) = pairs.getOrElse((x, y), (0L, 0L))
      pairs((x, y)) = (cn + 1, ra + 1000000L / deg(z))
    }
    val nonEdge = pairs.filter { case (k, _) => !edges(k) }
    val expectTop = nonEdge.toSeq
      .map { case ((a, b), (cn, ra)) => (a, b, cn, ra) }
      .sortBy { case (a, b, _, ra) => (-ra, a, b) }
      .take(10)
    val got = Graph.resourceAllocationTopK(Tables.lineitem(spark, sfDir))
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("cn"),
        r.getAs[Long]("ra_micro")))
    assert(got.toSeq == expectTop)
  }
}
