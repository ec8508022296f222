package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Graph, Tables}
import graft.text.TextAnalysis

/** Round-3 continuation: k-core peel, BM25 term ranking — brute-force
  * recomputation on sf0.001.
  */
class KcoreBm25Spec extends AnyFunSuite {
  import SparkTestSession._

  test("kcorePeel rounds match the direct peeling simulation") {
    val got = Graph.kcorePeel(Tables.lineitem(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("round") -> (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges")))
      .toMap
    val baskets = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    var edges = baskets.groupBy(_._1).values.toSeq
      .flatMap { ps =>
        val s = ps.map(_._2).distinct.sorted
        for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
      }
      .groupBy(identity).filter(_._2.length >= 2).keys.toSeq
    (1L to 3L).foreach { r =>
      val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.length }
      val keep = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
      assert(got(r) == ((keep.size.toLong, edges.length.toLong)), s"round $r")
    }
    // peel is monotone: node and edge counts never increase
    assert(got(1L)._2 >= got(2L)._2 && got(2L)._2 >= got(3L)._2)
  }

  test("bm25TopDocs ranks by the log-free BM25 kernel") {
    val got = TextAnalysis.bm25TopDocs(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").trim.split("\\s+").toSeq)
    val nDocs = docs.length.toLong
    val totalLen = docs.map(_._2.length.toLong).sum
    val avgdl = totalLen.toDouble / nDocs
    val dfm = docs.flatMap(_._2.distinct).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val terms = dfm.toSeq.sortBy { case (t, d) => (-d, t) }.take(3)
    terms.foreach { case (term, df) =>
      val scored = docs.flatMap { case (id, toks) =>
        val tf = toks.count(_ == term).toLong
        if (tf == 0) None
        else {
          val idf = ((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5)
          val sat = tf.toDouble * (1.2 + 1.0) /
            (tf.toDouble + 1.2 * (1.0 - 0.75 + 0.75 * toks.length.toDouble / avgdl))
          Some((id, idf * sat))
        }
      }
      val top = scored.sortBy { case (id, s) => (-s, id) }.take(5)
      top.zipWithIndex.foreach { case ((id, s), i) =>
        val (gid, gscore) = got((term, i + 1L))
        assert(gid == id, s"term $term rank ${i + 1}")
        assert(math.abs(gscore - s) < 1e-12, s"term $term score")
      }
    }
    assert(got.size == terms.length * 5)
  }
}
