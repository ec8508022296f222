package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.similarity.Similarity

/** Round-3 continuation: second-moment matrix, power iteration, cosine
  * histogram — brute-force recomputation on sf0.001.
  */
class EigenHistSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  private def millis(): Array[Array[Long]] =
    Tables.embeddings(spark, sfDir).orderBy("vec_id").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding"))
        .map(v => rnd(v.toDouble * 1000)).toArray)

  test("covMatrix cells equal the direct integer second moments") {
    val got = Similarity.covMatrix(Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r.getAs[Long]("s"))
      .toMap
    val m = millis()
    assert(got.size == 64)
    for (i <- 1 to 8; j <- 1 to 8) {
      val s = m.map(v => v(i - 1) * v(j - 1)).sum
      assert(got((i.toLong, j.toLong)) == s, s"cell $i,$j")
    }
  }

  test("powerIteration reproduces two quantized matrix-vector steps") {
    val got = Similarity.powerIteration(Tables.embeddings(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("loading_milli"))
      .toMap
    val m = millis()
    val cells = Array.ofDim[Long](64, 64)
    for (v <- m; i <- 0 until 64; j <- 0 until 64) cells(i)(j) += v(i) * v(j)
    def step(u: Array[Long]): Array[Long] = {
      val w = (0 until 64).map(i => (0 until 64).map(j => cells(i)(j) * u(j)).sum).toArray
      val mx = w.map(math.abs).max
      w.map(x => rnd(1000.0 * x.toDouble / mx.toDouble))
    }
    val u2 = step(step(Array.fill(64)(1L)))
    (1 to 64).foreach(d => assert(got(d.toLong) == u2(d - 1), s"dim $d"))
    // dominant direction has a meaningful spread of loadings
    assert(u2.map(math.abs).max == 1000L)
  }

  test("cosineHistogram bins every query-corpus pair exactly once") {
    val got = Similarity.cosineHistogram(Tables.embeddings(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_pairs"))
      .toMap
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
    def dotp(a: Array[Double], b: Array[Double]): Double =
      (0 until 64).foldLeft(0.0)((acc, k) => acc + a(k) * b(k))
    val qs = vecs.filter(_._1 < 10)
    val expected = (for {
      (qid, qe) <- qs
      (nid, e) <- vecs if nid != qid
    } yield {
      val cos = dotp(qe, e) / (math.sqrt(dotp(qe, qe)) * math.sqrt(dotp(e, e)))
      (rnd(100 * cos) + 100L) / 5
    }).groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    assert(got == expected)
    assert(got.values.sum == qs.length.toLong * (vecs.length - 1))
  }
}
