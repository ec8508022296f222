package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.similarity.Similarity

/** LOF outliers, kNN regression, Rocchio accuracy — driver recomputation
  * on sf0.001.
  */
class LofKnnRocchioSpec extends AnyFunSuite {
  import SparkTestSession._

  // Spark's round() is half-away-from-zero; Math.round is half-toward-+inf
  private def r(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  private def milliVecs(pred: Long => Boolean): Map[Long, Array[Long]] =
    Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect()
      .map(row => (row.getLong(0), row.getSeq[Double](1).map(x => r(x * 1000)).toArray))
      .filter(t => pred(t._1))
      .toMap

  test("lofOutliers reproduces the squared-L2 LOF on the hash sample") {
    val vs = milliVecs(_ % 4 == 0)
    def d2(a: Long, b: Long): Long =
      vs(a).zip(vs(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = vs.keys.toSeq.sorted
    val knn = ids.map { a =>
      (a, ids.filter(_ != a).map(b => (d2(a, b), b)).sorted.take(5))
    }.toMap
    val kdist = knn.map { case (a, ns) => (a, ns.last._1) }
    val sumReach = knn.map { case (a, ns) =>
      (a, ns.map { case (d, b) => math.max(d, kdist(b)) }.sum)
    }
    val lrd = sumReach.map { case (a, sr) => (a, 5.0 / sr) }
    val lof = knn.map { case (a, ns) =>
      (a, ns.map { case (_, b) => lrd(b) }.foldLeft(0.0)(_ + _) / (5.0 * lrd(a)))
    }
    val top = lof.toSeq.sortBy { case (a, l) => (-l, a) }.take(10)
    val rows = Similarity.lofOutliers(Tables.embeddings(spark, sfDir)).orderBy("rank").collect()
    assert(rows.length == 10)
    for ((row, i) <- rows.zipWithIndex) {
      assert(row.getAs[Long]("vec_id") == top(i)._1, s"rank ${i + 1}")
      assert(math.abs(row.getAs[Double]("lof") - top(i)._2) < 1e-9)
    }
  }

  test("knnRegression predicts the neighbor-label mean for every query") {
    val rows = Similarity.knnRegression(Tables.embeddings(spark, sfDir)).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      assert(math.abs(r.getAs[Double]("pred") - r.getAs[Long]("label_sum") / 5.0) < 1e-12)
      assert(r.getAs[Double]("abs_err") >= 0.0)
    }
  }

  test("rocchioAccuracy assigns by integer centroid distances") {
    val data = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect()
      .map(row => (row.getLong(0), row.getInt(1), row.getSeq[Double](2).map(x => r(x * 1000)).toArray))
    val cents = data.groupBy(_._2).view.mapValues { vs =>
      val n = vs.length
      (0 until 64).map(d => r(vs.map(_._3(d)).sum.toDouble / n)).toArray
    }.toMap
    val correctByLabel = scala.collection.mutable.Map.empty[Int, (Long, Long)].withDefaultValue((0L, 0L))
    for ((_, lbl, v) <- data) {
      val pred = cents.toSeq.map { case (cl, c) =>
        (v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, cl)
      }.min._2
      val (n, k) = correctByLabel(lbl)
      correctByLabel(lbl) = (n + 1, k + (if (pred == lbl) 1L else 0L))
    }
    val rows = Similarity.rocchioAccuracy(Tables.embeddings(spark, sfDir)).collect()
    assert(rows.length == correctByLabel.size)
    for (r <- rows) {
      val lbl = r.getAs[Long]("label").toInt
      assert((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_correct")) == correctByLabel(lbl), s"label $lbl")
    }
  }
}
