package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Graph, Tables}
import graft.similarity.Similarity

/** nDCG@5, recommendation coverage, PQ distortion — driver recomputation
  * on sf0.001.
  */
class NdcgCoveragePqSpec extends AnyFunSuite {
  import SparkTestSession._

  private def coOrder(parity: Option[Int]): Map[(Long, Long), Long] = {
    val op = Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey AS ok", "l_partkey AS pk").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => parity.forall(p => t._1 % 2 == p))
    val pc = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, g) <- op.groupBy(_._1)) {
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) {
        val e = (ps(i), ps(j))
        pc(e) = pc.getOrElse(e, 0L) + 1
      }
    }
    pc.toMap
  }

  private def symRank(edges: Map[(Long, Long), Long]): Map[Long, Seq[(Long, Long)]] =
    (edges.toSeq.map { case ((a, b), w) => (a, b, w) } ++
      edges.toSeq.map { case ((a, b), w) => (b, a, w) })
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3)).sortBy { case (d, w) => (-w, d) }.take(5))
      .toMap

  private val w5 = Seq(1.0, 0.6309297535714575, 0.5, 0.43067655807339306, 0.38685280723454163)

  test("ndcgAt5 matches the driver parity-split evaluation") {
    val train = symRank(coOrder(Some(0)))
    val testEdges = coOrder(Some(1))
    val testRel: Map[(Long, Long), Long] =
      testEdges.flatMap { case ((a, b), w) => Seq((a, b) -> w, (b, a) -> w) }
    val ideal = symRank(testEdges)
    var n = 0L
    var sum = 0L
    for ((src, recs) <- train if ideal.contains(src)) {
      val dcg = recs.zipWithIndex.map { case ((dst, _), i) =>
        testRel.getOrElse((src, dst), 0L).toDouble * w5(i)
      }.foldLeft(0.0)(_ + _)
      val idcg = ideal(src).zipWithIndex.map { case ((_, w), i) => w.toDouble * w5(i) }
        .foldLeft(0.0)(_ + _)
      n += 1
      sum += math.round(dcg / idcg * 1e6)
    }
    val row = Graph.ndcgAt5(Tables.lineitem(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_parts") == n)
    assert(row.getAs[Long]("sum_micro") == sum)
  }

  test("recCoverage counts distinct recommended parts and max exposure") {
    val recs = symRank(coOrder(None))
    val catalog = recs.keySet.size.toLong
    val slots = recs.values.flatMap(_.map(_._1)).toSeq
    val exposure = slots.groupBy(identity).view.mapValues(_.size.toLong)
    val row = Graph.recCoverage(Tables.lineitem(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_catalog") == catalog)
    assert(row.getAs[Long]("n_recommended") == exposure.size.toLong)
    assert(row.getAs[Long]("total_slots") == slots.size.toLong)
    assert(row.getAs[Long]("max_exposure") == exposure.values.max)
  }

  test("pqDistortion equals the driver per-subspace nearest-code error") {
    val books = Similarity.pqCodebooks(8, 16, 8)
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(_.getSeq[Double](0).toArray)
    val dqs = vecs.map { v =>
      var total = 0.0
      for (j <- 0 until 8) {
        val sub = v.slice(j * 8, j * 8 + 8)
        var best = Double.MaxValue
        for (c <- books(j)) {
          var ss = 0.0; var sc = 0.0
          for (t <- 0 until 8) { ss += sub(t) * sub(t); sc += sub(t) * c(t) }
          val d = ss - 2.0 * sc + c.map(x => x * x).sum
          if (d < best) best = d
        }
        total += best
      }
      math.round(total * 1e6)
    }
    val row = Similarity.pqDistortion(Tables.embeddings(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_vecs") == dqs.length.toLong)
    assert(row.getAs[Long]("total_micro") == dqs.sum)
    assert(row.getAs[Long]("max_micro") == dqs.max)
  }
}
