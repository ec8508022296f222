package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.similarity.Similarity

/** IVF balance, IVF distortion, embedding-norm histogram — driver
  * recomputation on sf0.001.
  */
class IvfQaSpec extends AnyFunSuite {
  import SparkTestSession._

  private def vecs(): Array[Array[Double]] =
    Tables.embeddings(spark, sfDir)
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect()
      .map(_.getSeq[Double](0).toArray)

  private val cs = Similarity.centroids(8, 64).map(_.clone)

  private def assignAndDist(v: Array[Double]): (Int, Double) = {
    var vv = 0.0
    for (x <- v) vv += x * x
    var best = Double.MaxValue
    var bestIdx = 0
    for (c <- cs.indices) {
      var dp = 0.0
      val cd = cs(c)
      for (j <- v.indices) dp += v(j) * cd(j)
      val d = vv - 2.0 * dp + cd.map(x => x * x).sum
      if (d < best) { best = d; bestIdx = c }
    }
    (bestIdx, best)
  }

  test("ivfBalance occupancy matches driver assignments and sums to N") {
    val assigns = vecs().map(v => assignAndDist(v)._1)
    val expect = assigns.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = Similarity.ivfBalance(Tables.embeddings(spark, sfDir)).collect()
    val got = rows.map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    assert(got == expect)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == assigns.length.toLong)
    // load factors are shares scaled by k: they sum to exactly k
    val lf = rows.map(_.getAs[Double]("load_factor")).sum
    assert(math.abs(lf - 8.0) < 1e-9)
  }

  test("ivfDistortion equals the micro-quantized driver sum") {
    val dists = vecs().map(v => math.round(assignAndDist(v)._2 * 1e6))
    val row = Similarity.ivfDistortion(Tables.embeddings(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_vecs") == dists.length.toLong)
    assert(row.getAs[Long]("total_micro") == dists.sum)
    assert(row.getAs[Long]("max_micro") == dists.max)
  }

  test("embeddingNorms buckets cover the corpus with no zero vectors") {
    val nsq = vecs().map(v => v.map(x => x * x).sum)
    val rows = Similarity.embeddingNorms(Tables.embeddings(spark, sfDir)).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nsq.length.toLong)
    assert(rows.map(_.getAs[Long]("n_zero")).sum == nsq.count(_ == 0.0).toLong)
    val expectBuckets = nsq.map(x => math.floor(x * 2.0).toLong).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val gotBuckets = rows.map(r => (r.getLong(0), r.getAs[Long]("n_vecs"))).toMap
    assert(gotBuckets == expectBuckets)
  }
}
