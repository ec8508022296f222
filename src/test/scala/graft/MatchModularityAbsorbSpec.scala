package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Graph, Tables}

/** Round-3 continuation: Markov absorption, NN matching ATT, brand
  * modularity — brute-force recomputation on sf0.001.
  */
class MatchModularityAbsorbSpec extends AnyFunSuite {
  import SparkTestSession._

  test("absorptionProbabilities solve the ppm linear system") {
    val r = Analytics.absorptionProbabilities(Tables.events(spark, sfDir)).collect().head
    // rebuild the ppm matrix from the raw event stream
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[java.sql.Timestamp]("ts").getTime,
        x.getAs[Long]("event_id"), x.getAs[String]("event_type")))
    val pairs = evs.groupBy(_._1).values.toSeq.flatMap { g =>
      val s = g.sortBy(t => (t._2, t._3)).map(_._4)
      s.zip(s.drop(1))
    }
    val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def ppm(i: String, j: String): Long =
      cnt.get((i, j)).map(c => math.round(1000000.0 * c / rowTot(i))).getOrElse(0L)
    assert(r.getAs[Long]("n_transitions") == pairs.length)
    val trans = Seq("click", "signup", "view")
    // A x = b in ppm scale
    val a = Array.tabulate(3, 3)((i, j) =>
      (if (i == j) 1000000.0 else 0.0) - ppm(trans(i), trans(j)))
    val b = trans.map(i => ppm(i, "purchase").toDouble).toArray
    // solve 3x3 by Gaussian elimination
    val m = a.map(_.clone)
    val x = b.clone
    for (c <- 0 until 3) {
      val p = (c until 3).maxBy(r0 => math.abs(m(r0)(c)))
      val (tr, tx) = (m(c), x(c)); m(c) = m(p); x(c) = x(p); m(p) = tr; x(p) = tx
      for (r0 <- 0 until 3 if r0 != c) {
        val f = m(r0)(c) / m(c)(c)
        for (c2 <- 0 until 3) m(r0)(c2) -= f * m(c)(c2)
        x(r0) -= f * x(c)
      }
    }
    val sol = (0 until 3).map(i => x(i) / m(i)(i))
    assert(math.abs(r.getAs[Double]("p_click") - sol(0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("p_signup") - sol(1)) < 1e-9)
    assert(math.abs(r.getAs[Double]("p_view") - sol(2)) < 1e-9)
    // probabilities of reaching purchase before error
    Seq("p_click", "p_signup", "p_view").foreach { c =>
      assert(r.getAs[Double](c) > 0.0 && r.getAs[Double](c) < 1.0, c)
    }
  }

  test("nnMatchAtt matches each treated user to the closest control spend") {
    val r = Analytics.nnMatchAtt(Tables.events(spark, sfDir)).collect().head
    val users = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_type", "value").collect()
      .map(x => (x.getAs[Long]("user_id"),
        x.getAs[java.sql.Timestamp]("ts").toLocalDateTime.getDayOfMonth,
        x.getAs[String]("event_type"), math.round(x.getAs[Double]("value") * 100)))
      .groupBy(_._1).map { case (u, g) =>
        (u, g.filter(_._2 <= 15).map(_._4).sum, g.filter(_._2 > 15).map(_._4).sum,
          100L * g.count(_._3 == "error") >= 25L * g.size)
      }.toSeq
    val controls = users.filter(!_._4).map(t => (t._2, t._3, t._1)).sortBy(t => (t._1, t._3))
    val treated = users.filter(_._4)
    assert(r.getAs[Long]("n_controls") == controls.length)
    val diffs = treated.map { case (u, x, y, _) =>
      // nearest control by x in (x, user_id) order semantics
      val below = controls.filter(c => c._1 < x || (c._1 == x && c._3 < u)).lastOption
      val above = controls.filter(c => c._1 > x || (c._1 == x && c._3 > u)).headOption
      val cy = (below, above) match {
        case (None, Some(nc)) => nc._2
        case (Some(pc), None) => pc._2
        case (Some(pc), Some(nc)) => if (x - pc._1 <= nc._1 - x) pc._2 else nc._2
        case (None, None) => fail("no controls")
      }
      y - cy
    }
    assert(r.getAs[Long]("n_treated") == diffs.length)
    assert(math.abs(r.getAs[Double]("att_dollars") -
      diffs.sum.toDouble / diffs.length / 100.0) < 1e-9)
  }

  test("brandModularity contributions sum to a valid Q decomposition") {
    val rows = Graph.brandModularity(Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir))
      .collect()
    val brand = Tables.part(spark, sfDir).select("p_partkey", "p_brand").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val baskets = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val edges = baskets.toSeq
      .flatMap(ps => for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val m = edges.length
    val inE = edges.filter(e => brand(e._1) == brand(e._2))
      .groupBy(e => brand(e._1)).view.mapValues(_.size.toLong).toMap
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(brand).view.mapValues(_.size.toLong).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .groupBy(brand).view.mapValues(_.size.toLong).toMap
    assert(rows.length == deg.size)
    rows.foreach { r0 =>
      val b = r0.getAs[String]("p_brand")
      assert(r0.getAs[Long]("n_nodes") == nodes(b))
      assert(r0.getAs[Long]("in_edges") == inE.getOrElse(b, 0L))
      assert(r0.getAs[Long]("deg_sum") == deg(b))
      val exp = inE.getOrElse(b, 0L).toDouble / m -
        math.pow(deg(b).toDouble / (2.0 * m), 2)
      assert(math.abs(r0.getAs[Double]("contribution") - exp) < 1e-12)
    }
    // Q = sum of contributions is bounded
    val q = rows.map(_.getAs[Double]("contribution")).sum
    assert(q > -1.0 && q < 1.0)
  }
}
