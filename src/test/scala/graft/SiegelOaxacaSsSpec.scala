package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Inference, Tables}
import graft.text.TextAnalysis

/** Siegel repeated-median slope, Oaxaca–Blinder decomposition, SpaceSaving
  * guarantee booleans — driver recomputation on sf0.001.
  */
class SiegelOaxacaSsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def lowerMedian(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.length + 1) / 2 - 1)
  }

  test("siegelSlope equals the driver repeated-median fold") {
    val ys = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .map(_._2)
    val n = ys.length
    val meds = (0 until n).map { i =>
      lowerMedian((0 until n).filter(_ != i).map(j => (ys(j) - ys(i)).toDouble / (j - i)))
    }
    val slope = lowerMedian(meds)
    val intercept = lowerMedian(ys.indices.map(i => ys(i).toDouble - slope * (i + 1)))
    val row = Analytics.siegelSlope(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == n.toLong)
    assert(row.getAs[Double]("slope") == slope)
    assert(row.getAs[Double]("intercept") == intercept)
  }

  test("oaxaca per-nation terms sum to the common-nation mean gap") {
    val rows = Inference
      .oaxacaDecomposition(
        Tables.customer(spark, sfDir), Tables.orders(spark, sfDir), Tables.nation(spark, sfDir))
      .collect()
    assert(rows.nonEmpty)
    val totA = rows.map(_.getAs[Long]("n_a")).sum
    val totB = rows.map(_.getAs[Long]("n_b")).sum
    val meanA = rows.map(_.getAs[Long]("sum_a")).sum.toDouble / totA / 100.0
    val meanB = rows.map(_.getAs[Long]("sum_b")).sum.toDouble / totB / 100.0
    val explained = rows.map(_.getAs[Double]("explained")).sum
    val unexplained = rows.map(_.getAs[Double]("unexplained")).sum
    assert(math.abs(explained + unexplained - (meanA - meanB)) < 1e-6)
    // weights are proper distributions over common nations
    assert(math.abs(rows.map(_.getAs[Double]("w_a")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("w_b")).sum - 1.0) < 1e-9)
  }

  test("spaceSaving guarantee booleans hold and candidates fill capacity") {
    val row = TextAnalysis.spaceSavingHeavyHitters(Tables.documents(spark, sfDir)).collect().head
    assert(row.getAs[Long]("k") == 64L)
    assert(row.getAs[Long]("n_candidates") == 64L)
    assert(row.getAs[Boolean]("est_geq_exact"))
    assert(row.getAs[Boolean]("overest_within_bound"))
    assert(row.getAs[Boolean]("heavy_all_present"))
  }

  test("spaceSaving buffer invariants under a skewed synthetic merge") {
    import graft.functions.SpaceSavingAggregator
    // two disjoint streams reduced separately then merged — the absent-key
    // bound must cover cross-stream frequencies
    val s1 = Seq.fill(200)("a") ++ Seq.fill(90)("b") ++ (1 to 80).map(i => s"x$i")
    val s2 = Seq.fill(150)("c") ++ Seq.fill(70)("b") ++ (1 to 80).map(i => s"y$i")
    val b1 = s1.foldLeft(SpaceSavingAggregator.zero)(SpaceSavingAggregator.reduce)
    val b2 = s2.foldLeft(SpaceSavingAggregator.zero)(SpaceSavingAggregator.reduce)
    val m = SpaceSavingAggregator.merge(b1, b2)
    val exact = (s1 ++ s2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((k, est) <- m.counts)
      assert(est >= exact(k), s"undercount for $k")
    val absentBound =
      if (m.counts.size < SpaceSavingAggregator.Capacity) m.bound
      else math.max(m.bound, m.counts.values.min)
    for ((k, f) <- exact if !m.counts.contains(k))
      assert(f <= absentBound, s"absent $k with f=$f exceeds bound $absentBound")
    assert(m.counts("b") >= 160L)
  }
}
