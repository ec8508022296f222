package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Graph, Tables}
import graft.similarity.Similarity

/** Round-3 continuation: JL distortion, link prediction — brute-force
  * recomputation on sf0.001.
  */
class JlLinkSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("jlDistortion distances match the signed-projection simulation") {
    val got = Similarity.jlDistortion(Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb")) ->
        (r.getAs[Long]("d64"), r.getAs[Long]("dk"), r.getAs[Double]("ratio")))
      .toMap
    val signs = Similarity.jlSigns(8, 64)
    val vecs = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(v => rnd(v.toDouble * 1000)).toArray)
      .sortBy(_._1)
    def proj(m: Array[Long]): Array[Long] =
      signs.map(row => (0 until 64).map(d => row(d).toLong * m(d)).sum).toArray
    assert(got.size == vecs.length * (vecs.length - 1) / 2)
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      val (ia, ma) = vecs(i)
      val (ib, mb) = vecs(j)
      val d64 = (0 until 64).map(d => (ma(d) - mb(d)) * (ma(d) - mb(d))).sum
      val (pa, pb) = (proj(ma), proj(mb))
      val dk = (0 until 8).map(q => (pa(q) - pb(q)) * (pa(q) - pb(q))).sum
      val (gd64, gdk, gratio) = got((ia, ib))
      assert(gd64 == d64 && gdk == dk, s"pair $ia,$ib")
      assert(math.abs(gratio - dk.toDouble / (8.0 * d64)) < 1e-12)
      // JL with k=8 keeps the ratio within an order of magnitude of 1
      assert(gratio > 0.05 && gratio < 20.0, s"ratio $gratio")
    }
  }

  test("linkPrediction ranks non-adjacent pairs by neighbor Jaccard") {
    val got = Graph.linkPrediction(Tables.lineitem(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("rank") ->
        (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("cn"), r.getAs[Double]("jaccard")))
      .toMap
    val baskets = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    val edges = baskets.groupBy(_._1).values.toSeq
      .flatMap { ps =>
        val s = ps.map(_._2).distinct.sorted
        for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
      }
      .groupBy(identity).filter(_._2.length >= 2).keys.toSet
    val nbrs = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val cands = nbrs.keys.toSeq.sorted
    val scored = (for {
      ai <- cands.indices
      bi <- (ai + 1) until cands.length
      a = cands(ai); b = cands(bi)
      cn = (nbrs(a) intersect nbrs(b)).size
      if cn > 0 && !edges((a, b))
    } yield {
      val un = nbrs(a).size + nbrs(b).size - cn
      (a, b, cn.toLong, cn.toDouble / un)
    }).sortBy { case (a, b, _, j) => (-j, a, b) }.take(10)
    scored.zipWithIndex.foreach { case ((a, b, cn, j), i) =>
      val (ga, gb, gcn, gj) = got(i + 1L)
      assert((ga, gb, gcn) == ((a, b, cn)), s"rank ${i + 1}")
      assert(math.abs(gj - j) < 1e-12)
    }
    assert(got.size == 10)
  }
}
