package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Inference, Tables}

/** Ansari–Bradley, ordinal association battery, White test — driver
  * recomputation on sf0.001.
  */
class AnsariOrdinalWhiteSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ansariBradley matches the midrank-score linear-rank recomputation under ties") {
    val vs = Tables.events(spark, sfDir)
      .filter("event_type IN ('purchase', 'click')")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS x")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nn = vs.length
    // midrank scores: min(r, N+1−r) averaged over each tied value block
    // — every member of a block carries the block's mean score, so the
    // statistic is exchangeable under ties and the sum-based null
    // moments are exact (the engine's documented treatment)
    val byValue = vs.groupBy(_._2).toSeq.sortBy(_._1)
    var rank = 0L
    var abStat = 0.0
    var sTot = 0L
    var ss2 = 0.0
    for ((_, block) <- byValue) {
      val cnt = block.length
      val blockScore = (1 to cnt).map { i =>
        val r = rank + i
        math.min(r, nn + 1 - r)
      }.sum
      val aInBlock = block.count(_._1 == "purchase")
      abStat += aInBlock.toDouble * blockScore / cnt
      sTot += blockScore
      ss2 += blockScore.toDouble * blockScore / cnt
      rank += cnt
    }
    val na = vs.count(_._1 == "purchase").toLong
    val nb = vs.count(_._1 == "click").toLong
    val row = Inference.ansariBradley(Tables.events(spark, sfDir), "purchase", "click")
      .collect().head
    assert(row.getAs[Long]("na") == na)
    assert(row.getAs[Long]("nb") == nb)
    assert(math.abs(row.getAs[Double]("ab_stat") - abStat) < 1e-6)
    val eAb = na.toDouble * sTot / nn
    assert(math.abs(row.getAs[Double]("e_ab") - eAb) < 1e-6)
    val varAb = na.toDouble * nb * (nn * ss2 - sTot.toDouble * sTot) /
      (nn.toDouble * nn * (nn - 1.0))
    assert(math.abs(row.getAs[Double]("z") - (abStat - eAb) / math.sqrt(varAb)) < 1e-9)
    // the fixture must actually tie across groups, or this proves nothing
    assert(byValue.exists { case (_, b) =>
      b.exists(_._1 == "purchase") && b.exists(_._1 == "click")
    }, "fixture must exercise cross-group tie blocks")
  }

  test("ordinalAssociation pair counts equal brute force on the cell grid") {
    val obs = Tables.lineitem(spark, sfDir)
      .selectExpr(
        "CAST(round(l_quantity) AS BIGINT) AS q",
        "CAST(round(l_extendedprice * 100) AS BIGINT) div 100000 AS p")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var conc = 0L; var disc = 0L; var tieX = 0L; var tieY = 0L; var tieXY = 0L
    for (i <- obs.indices; j <- i + 1 until obs.length) {
      val ((q1, p1), (q2, p2)) = (obs(i), obs(j))
      if (q1 == q2 && p1 == p2) tieXY += 1
      else if (q1 == q2) tieX += 1
      else if (p1 == p2) tieY += 1
      else if ((q2 - q1) * (p2 - p1) > 0) conc += 1
      else disc += 1
    }
    val row = Inference.ordinalAssociation(Tables.lineitem(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_rows") == obs.length.toLong)
    assert(row.getAs[Long]("conc") == conc)
    assert(row.getAs[Long]("disc") == disc)
    assert(row.getAs[Long]("tie_x") == tieX)
    assert(row.getAs[Long]("tie_y") == tieY)
    assert(row.getAs[Long]("tie_xy") == tieXY)
    assert(math.abs(row.getAs[Double]("gamma") - (conc - disc).toDouble / (conc + disc)) < 1e-12)
  }

  test("whiteTest auxiliary R2 is in [0,1] and matches a driver recomputation") {
    val daily = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length
    val ys = daily.map(_._2.toDouble)
    val is = (1 to n).map(_.toDouble)
    val mx = is.sum / n; val my = ys.sum / n
    val cxx = is.map(x => x * x).sum / n - mx * mx
    val cxy = is.zip(ys).map { case (x, y) => x * y }.sum / n - mx * my
    val b = cxy / cxx; val a = my - b * mx
    val ws = is.zip(ys).map { case (x, y) =>
      val e = y - (a + b * x); math.round(e * e / 1e9)
    }
    def mean(s: Seq[Double]) = s.sum / n
    val u = is; val v = is.map(x => x * x); val w = ws.map(_.toDouble)
    val cuu = mean(u.map(x => x * x)) - mean(u) * mean(u)
    val cuv = mean(u.zip(v).map { case (x, y) => x * y }) - mean(u) * mean(v)
    val cvv = mean(v.map(x => x * x)) - mean(v) * mean(v)
    val cuw = mean(u.zip(w).map { case (x, y) => x * y }) - mean(u) * mean(w)
    val cvw = mean(v.zip(w).map { case (x, y) => x * y }) - mean(v) * mean(w)
    val cww = mean(w.map(x => x * x)) - mean(w) * mean(w)
    val det = cuu * cvv - cuv * cuv
    val b1 = (cuw * cvv - cvw * cuv) / det
    val b2 = (cuu * cvw - cuv * cuw) / det
    val r2 = (b1 * cuw + b2 * cvw) / cww
    val row = Analytics.whiteTest(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == n.toLong)
    assert(row.getAs[Double]("r2_aux") >= -1e-9 && row.getAs[Double]("r2_aux") <= 1 + 1e-9)
    assert(math.abs(row.getAs[Double]("r2_aux") - r2) < 1e-6)
    assert(math.abs(row.getAs[Double]("white_stat") - n * r2) < 1e-4)
  }
}
