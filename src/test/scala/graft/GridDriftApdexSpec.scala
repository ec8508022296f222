package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.similarity.Similarity

/** Round-3 continuation: density-grid clustering, centroid drift, Apdex —
  * brute-force recomputation on sf0.001.
  */
class GridDriftApdexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("gridDensityClusters merges exactly the 8-adjacent dense cells") {
    val got = Similarity.gridDensityClusters(Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("comp_gx"), r.getAs[Long]("comp_gy")) ->
        (r.getAs[Long]("n_cells"), r.getAs[Long]("n_points"),
          r.getAs[Long]("min_gx"), r.getAs[Long]("max_gx")))
      .toMap

    val pts = Tables.embeddings(spark, sfDir).collect().map { r =>
      val e = r.getSeq[Float](r.fieldIndex("embedding"))
      ((rnd(e(0).toDouble * 1000) + 10000) / 50 - 200,
        (rnd(e(1).toDouble * 1000) + 10000) / 50 - 200)
    }
    val dense = pts.groupBy(identity).view.mapValues(_.length).filter(_._2 >= 5).toMap
    // flood-fill components
    var comps = Map.empty[(Long, Long), (Long, Long)]
    val seen = scala.collection.mutable.Set.empty[(Long, Long)]
    val groups = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    dense.keys.toSeq.sorted.foreach { start =>
      if (!seen(start)) {
        var frontier = Set(start)
        var comp = Set.empty[(Long, Long)]
        while (frontier.nonEmpty) {
          comp ++= frontier
          seen ++= frontier
          frontier = frontier.flatMap { case (x, y) =>
            for {
              dx <- -1L to 1L; dy <- -1L to 1L
              c = (x + dx, y + dy)
              if dense.contains(c) && !seen(c)
            } yield c
          }
        }
        groups += comp
      }
    }
    val expected = groups.map { comp =>
      val id = comp.min
      id -> (comp.size.toLong, comp.toSeq.map(dense(_).toLong).sum,
        comp.map(_._1).min, comp.map(_._1).max)
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("centroidDrift squared distances match per-half rounded centroids") {
    val got = Similarity.centroidDrift(Tables.embeddings(spark, sfDir)).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("dist2"),
          r.getAs[Double]("drift")))
      .toMap
    val vecs = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(v => rnd(v.toDouble * 1000)).toArray)
    }
    got.keys.foreach { lab =>
      val a = vecs.filter(v => v._2 == lab && v._1 % 2 == 0)
      val b = vecs.filter(v => v._2 == lab && v._1 % 2 != 0)
      def cent(h: Array[(Long, Int, Array[Long])]): Array[Long] =
        (0 until 64).map(d => rnd(h.map(_._3(d)).sum.toDouble / h.length)).toArray
      val (ca, cb) = (cent(a), cent(b))
      val d2 = (0 until 64).map(d => (ca(d) - cb(d)) * (ca(d) - cb(d))).sum
      val (gna, gnb, gd2, gdrift) = got(lab)
      assert((gna, gnb, gd2) == ((a.length.toLong, b.length.toLong, d2)), s"label $lab")
      assert(math.abs(gdrift - math.sqrt(d2.toDouble) / 1000.0) < 1e-15)
    }
    assert(got.size == 10)
  }

  test("apdex is (2*satisfied + tolerating) / 2n on integer cents") {
    val got = Analytics.apdex(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_satisfied"),
          r.getAs[Long]("n_tolerating"), r.getAs[Double]("apdex")))
      .toMap
    val events = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"), rnd(r.getAs[Double]("value") * 100)))
    got.foreach { case (et, (n, sat, tol, score)) =>
      val g = events.filter(_._1 == et)
      assert(n == g.length)
      assert(sat == g.count(_._2 <= 5000))
      assert(tol == g.count(c => c._2 > 5000 && c._2 <= 20000))
      assert(score == (2.0 * sat + tol) / (2.0 * n))
      assert(score >= 0.0 && score <= 1.0)
    }
    assert(got.size == 5)
  }
}
