package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Shapley + Markov attribution, next-event accuracy — driver
  * recomputation on sf0.001.
  */
class AttribNextSpec extends AnyFunSuite {
  import SparkTestSession._

  test("shapleyAttribution cells and closed-form phis match the driver") {
    val users = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val cells = users.values.toSeq.groupBy(s => (s("click"), s("view")))
      .map { case (k, vs) => (k, (vs.size.toLong, vs.count(_("purchase")).toLong)) }
    def nk(c: Boolean, v: Boolean) = cells.getOrElse((c, v), (0L, 0L))
    def rate(c: Boolean, v: Boolean): Double = {
      val (n, k) = nk(c, v); if (n == 0) 0.0 else k.toDouble / n
    }
    val phiC = 0.5 * ((rate(true, false) - rate(false, false)) + (rate(true, true) - rate(false, true)))
    val phiV = 0.5 * ((rate(false, true) - rate(false, false)) + (rate(true, true) - rate(true, false)))
    val row = Analytics.shapleyAttribution(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n11") == nk(true, true)._1)
    assert(row.getAs[Long]("k00") == nk(false, false)._2)
    assert(math.abs(row.getAs[Double]("phi_click") - phiC) < 1e-12)
    assert(math.abs(row.getAs[Double]("phi_view") - phiV) < 1e-12)
  }

  test("markovAttribution solves the journey chain from driver transition counts") {
    val byUser = Tables.events(spark, sfDir)
      .filter("event_type IN ('click', 'view', 'purchase')")
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2))).toMap
    val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for ((_, evs) <- byUser) {
      val firstP = evs.indexWhere(_._3 == "purchase")
      val trunc = if (firstP < 0) evs else evs.take(firstP + 1)
      var prev = "start"
      for ((_, _, t) <- trunc) { counts((prev, t)) += 1; prev = t }
      if (trunc.last._3 != "purchase") counts((trunc.last._3, "null")) += 1
    }
    def p(s: String, d: String): Double = {
      val tot = Seq("click", "view", "purchase", "null").map(x => counts((s, x))).sum
      if (tot == 0) 0.0 else counts((s, d)).toDouble / tot
    }
    val det = (1 - p("click", "click")) * (1 - p("view", "view")) - p("click", "view") * p("view", "click")
    val xc = (p("click", "purchase") * (1 - p("view", "view")) + p("click", "view") * p("view", "purchase")) / det
    val xv = (p("view", "purchase") * (1 - p("click", "click")) + p("view", "click") * p("click", "purchase")) / det
    val xs = p("start", "click") * xc + p("start", "view") * xv + p("start", "purchase")
    val xsNoC = p("start", "view") * (p("view", "purchase") / (1 - p("view", "view"))) + p("start", "purchase")
    val reC = 1 - xsNoC / xs
    val row = Analytics.markovAttribution(Tables.events(spark, sfDir)).collect().head
    assert(math.abs(row.getAs[Double]("p_conv") - xs) < 1e-12)
    assert(math.abs(row.getAs[Double]("removal_click") - reC) < 1e-12)
    // removal effects must be in [0, 1] and shares sum to 1
    assert(row.getAs[Double]("removal_click") >= 0 && row.getAs[Double]("removal_click") <= 1)
    assert(math.abs(row.getAs[Double]("attr_click") + row.getAs[Double]("attr_view") - 1.0) < 1e-12)
  }

  test("nextEventAccuracy scores the majority bigram model on odd users") {
    val pairs = Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2))).toMap
      .toSeq.flatMap { case (u, evs) =>
        evs.zip(evs.tail).map { case (a, b) => (u, a._3, b._3) }
      }
    val model = pairs.filter(_._1 % 2 == 0).groupBy(_._2).view.mapValues { ps =>
      ps.groupBy(_._3).toSeq.map { case (t, xs) => (t, xs.size) }
        .minBy { case (t, n) => (-n, t) }._1
    }.toMap
    val test = pairs.filter(_._1 % 2 == 1)
    val correct = test.count { case (_, s, n) => model.get(s).contains(n) }
    val row = Analytics.nextEventAccuracy(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_test") == test.size.toLong)
    assert(row.getAs[Long]("n_correct") == correct.toLong)
  }
}
