package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.similarity.Similarity

/** Round-3 continuation: k-center greedy seeding, 5-fold CV regression —
  * brute-force recomputation on sf0.001.
  */
class KcenterCvSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("kcenterSeeds picks the greedy farthest points and a radius witness") {
    val got = Similarity.kcenterSeeds(Tables.embeddings(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("rank") -> (r.getAs[Long]("vec_id"), r.getAs[Long]("sq_dist")))
      .toMap
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(v => rnd(v.toDouble * 1000)).toArray)
      .sortBy(_._1)
    def sq(a: Array[Long], b: Array[Long]): Long =
      (0 until 64).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var centers = Seq(vecs.head._1)
    var dist = vecs.map { case (id, v) => id -> sq(v, vecs.head._2) }.toMap
    val vmap = vecs.toMap
    assert(got(0L) == ((vecs.head._1, 0L)))
    for (r <- 1L to 4L) {
      val (pid, pd) = dist.toSeq.maxBy { case (id, d) => (d, -id) }
      assert(got(r) == ((pid, pd)), s"rank $r")
      centers :+= pid
      dist = dist.map { case (id, d) => id -> math.min(d, sq(vmap(id), vmap(pid))) }
    }
    // greedy distances are non-increasing
    assert((1L to 4L).map(got(_)._2).sliding(2).forall(s => s.head >= s.last))
  }

  test("crossValidatedLinreg train stats are global minus fold") {
    val rows = Analytics.crossValidatedLinreg(Tables.lineitem(spark, sfDir))
      .collect().map(r => r.getAs[Long]("fold") -> r).toMap
    assert(rows.size == 5)
    val data = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100").as("y"))
      .collect()
      .map { t =>
        val hex = MessageDigest.getInstance("MD5")
          .digest(s"${t.getLong(0)}_${t.getInt(1)}".getBytes)
          .map("%02x".format(_)).mkString.substring(0, 8)
        (java.lang.Long.parseLong(hex, 16) % 5,
          t.getAs[Long]("x"), t.getAs[Long]("y"))
      }
    for (f <- 0L until 5L) {
      val train = data.filter(_._1 != f)
      val test = data.filter(_._1 == f)
      val r = rows(f)
      assert(r.getAs[Long]("n_train") == train.length)
      assert(r.getAs[Long]("n_test") == test.length)
      val n = train.length.toDouble
      val sx = train.map(_._2).sum.toDouble
      val sy = train.map(_._3).sum.toDouble
      val sxy = train.map(t => t._2 * t._3).sum.toDouble
      val sxx = train.map(t => t._2 * t._2).sum.toDouble
      val varX = sxx / n - (sx / n) * (sx / n)
      val slope = (sxy / n - (sx / n) * (sy / n)) / varX
      val intercept = sy / n - slope * (sx / n)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-9)
      assert(math.abs(r.getAs[Double]("intercept") - intercept) < 1e-9)
      val mse = test.map { t =>
        val resid = t._3.toDouble - (slope * t._2 + intercept)
        math.round(resid * resid)
      }.sum.toDouble / test.length
      assert(math.abs(r.getAs[Double]("test_mse") - mse) / mse < 1e-9)
      // held-out error close to in-sample for a stable linear fit
      assert(r.getAs[Double]("test_mse") > 0)
    }
  }
}
