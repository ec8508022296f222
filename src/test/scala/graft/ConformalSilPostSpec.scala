package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}
import graft.similarity.Similarity

/** Round-3 continuation: split-conformal intervals, quantizer silhouette,
  * post-stratified estimation — brute-force recomputation on sf0.001.
  */
class ConformalSilPostSpec extends AnyFunSuite {
  import SparkTestSession._

  private def md5bucket(key: String, mod: Int): Int = {
    val hex = MessageDigest.getInstance("MD5").digest(key.getBytes)
      .map("%02x".format(_)).mkString.substring(0, 8)
    (java.lang.Long.parseLong(hex, 16) % mod).toInt
  }

  test("conformalInterval: quantile rank is conformal and coverage >= target-ish") {
    val r = Analytics.conformalInterval(Tables.lineitem(spark, sfDir)).collect()
    assert(r.length == 1)
    val row = r.head
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100").as("y"))
      .collect()
      .map(t => (md5bucket(s"${t.getLong(0)}_${t.getInt(1)}", 10),
        t.getAs[Long]("x"), t.getAs[Long]("y")))
    val train = rows.filter(_._1 < 6)
    val cal = rows.filter(t => t._1 >= 6 && t._1 < 8)
    val test = rows.filter(_._1 >= 8)
    assert(row.getAs[Long]("n_train") == train.length)
    assert(row.getAs[Long]("n_cal") == cal.length)
    assert(row.getAs[Long]("n_test") == test.length)
    // OLS from exact sums
    val n = train.length.toDouble
    val sx = train.map(_._2).sum.toDouble
    val sy = train.map(_._3).sum.toDouble
    val sxy = train.map(t => t._2 * t._3).sum.toDouble
    val sxx = train.map(t => t._2 * t._2).sum.toDouble
    val varX = sxx / n - (sx / n) * (sx / n)
    val slope = (sxy / n - (sx / n) * (sy / n)) / varX
    val intercept = sy / n - slope * (sx / n)
    assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-9)
    assert(math.abs(row.getAs[Double]("intercept") - intercept) < 1e-9)
    def absResid(x: Long, y: Long): Long =
      math.round(math.abs(y.toDouble - (slope * x.toDouble + intercept)))
    val calR = cal.map(t => absResid(t._2, t._3)).sorted
    val k = math.ceil(0.9 * (cal.length + 1)).toInt
    val qhat = calR(k - 1)
    assert(row.getAs[Long]("qhat_dollars") == qhat)
    val covered = test.count(t => absResid(t._2, t._3) <= qhat)
    assert(math.abs(row.getAs[Double]("coverage") - covered.toDouble / test.length) < 1e-12)
    // split-conformal finite-sample guarantee holds on exchangeable data;
    // allow slack for the finite fixture
    assert(row.getAs[Double]("coverage") > 0.8)
  }

  test("silhouette: per-cell means match brute-force second-nearest centroids") {
    val got = Similarity.silhouette(Tables.embeddings(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("sil_sum")))
      .toMap
    val cs = Similarity.centroids(8, 64)
    val agg = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    Tables.embeddings(spark, sfDir).collect().foreach { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
      val vv = v.foldLeft(0.0)((a, x) => a + x * x)
      val dists = cs.map { c =>
        val d = (0 until 64).foldLeft(0.0)((a, i) => a + v(i) * c(i))
        vv - 2.0 * d + c.map(x => x * x).sum
      }
      val a2 = dists.min
      val cell = dists.indexOf(a2).toLong
      val b2 = dists.filter(_ != a2).min
      val sil = if (b2 == 0.0) 0.0 else (b2 - a2) / b2
      val micro = math.round(sil * 1000000)
      val (cn, csum) = agg.getOrElse(cell, (0L, 0L))
      agg(cell) = (cn + 1, csum + micro)
    }
    assert(got == agg.toMap)
    // all cells populated and scores sane
    got.values.foreach { case (nv, sum) =>
      assert(nv > 0 && sum >= 0 && sum <= nv * 1000000)
    }
  }

  test("postStratified: weights sum to 1 and contributions are weight*mean") {
    val rows = Relational.postStratified(Tables.events(spark, sfDir)).collect()
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    val total = events.length
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val strat = events.filter(_._2 == et)
      val samp = strat.filter(t => md5bucket(t._1.toString, 10) == 0)
      assert(r.getAs[Long]("n_pop") == strat.length)
      assert(r.getAs[Long]("n_sample") == samp.length)
      assert(math.abs(r.getAs[Double]("weight") - strat.length.toDouble / total) < 1e-15)
      if (samp.nonEmpty) {
        val mean = samp.map(t => math.round(t._3 * 100)).sum.toDouble / samp.length / 100.0
        assert(math.abs(r.getAs[Double]("sample_mean") - mean) < 1e-9)
        assert(math.abs(r.getAs[Double]("contribution") -
          r.getAs[Double]("weight") * r.getAs[Double]("sample_mean")) < 1e-15)
      }
    }
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-12)
  }
}
