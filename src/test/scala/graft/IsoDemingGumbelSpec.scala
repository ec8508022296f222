package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Isotonic minimax fit, Deming TLS, Gumbel return level — brute-force
  * driver recomputation on sf0.001.
  */
class IsoDemingGumbelSpec extends AnyFunSuite {
  import SparkTestSession._

  private def daily(): IndexedSeq[(Long, Long, Long)] =
    Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("x"),
        org.apache.spark.sql.functions.sum("c").as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
      .toIndexedSeq

  test("isotonicDaily equals the PAVA fit and the minimax formula") {
    val ys = daily().map(_._3.toDouble)
    val n = ys.length
    // classic pool-adjacent-violators
    case class Block(sum: Double, w: Int) { def avg: Double = sum / w }
    val pools = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (y <- ys) {
      pools += Block(y, 1)
      while (pools.length > 1 && pools(pools.length - 2).avg >= pools.last.avg) {
        val b = pools.remove(pools.length - 1)
        val a = pools.remove(pools.length - 1)
        pools += Block(a.sum + b.sum, a.w + b.w)
      }
    }
    val pava = pools.flatMap(b => Seq.fill(b.w)(b.avg)).toIndexedSeq
    val rows = Analytics.isotonicDaily(Tables.events(spark, sfDir)).orderBy("day_idx").collect()
    assert(rows.length == n)
    for ((r, i) <- rows.zipWithIndex) {
      val got = r.getAs[Double]("fitted_cents")
      assert(math.abs(got - pava(i)) < 1e-6 * math.max(1.0, math.abs(pava(i))),
        s"day ${i + 1}: $got vs PAVA ${pava(i)}")
    }
    // monotone non-decreasing
    val fs = rows.map(_.getAs[Double]("fitted_cents"))
    assert(fs.zip(fs.tail).forall { case (a, b) => a <= b + 1e-9 })
  }

  test("demingDaily matches the closed-form TLS slope on driver moments") {
    val ds = daily()
    val n = ds.length.toDouble
    val xs = ds.map(_._2.toDouble)
    val ys = ds.map(_._3.toDouble)
    val mx = xs.sum / n
    val my = ys.sum / n
    val cxx = xs.map(x => x * x).sum / n - mx * mx
    val cyy = ys.map(y => y * y).sum / n - my * my
    val cxy = xs.zip(ys).map { case (x, y) => x * y }.sum / n - mx * my
    val slope = (cyy - cxx + math.sqrt((cyy - cxx) * (cyy - cxx) + 4 * cxy * cxy)) / (2 * cxy)
    val row = Analytics.demingDaily(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == ds.length.toLong)
    assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-6 * math.abs(slope))
    assert(math.abs(row.getAs[Double]("intercept") - (my - slope * mx)) < 1e-3)
    // TLS slope must exceed the OLS slope of y on x (attenuation)
    val ols = cxy / cxx
    assert(slope >= ols - 1e-9)
  }

  test("gumbelReturnLevel recovers the method-of-moments fit of daily maxima") {
    val maxima = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").max("c")
      .collect()
      .map(_.getLong(1))
    val n = maxima.length.toDouble
    val mean = maxima.sum / n
    val sigma = math.sqrt(maxima.map(m => m.toDouble * m).sum / n - mean * mean)
    val beta = sigma * 0.779696801233676
    val mu = mean - 0.5772156649015329 * beta
    val x30 = mu + beta * 3.3842944934992527
    val row = Analytics.gumbelReturnLevel(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_blocks") == maxima.length.toLong)
    assert(math.abs(row.getAs[Double]("mean_max_dollars") - mean / 100.0) < 1e-6)
    assert(math.abs(row.getAs[Double]("gumbel_beta_dollars") - beta / 100.0) < 1e-6)
    assert(math.abs(row.getAs[Double]("return_level30_dollars") - x30 / 100.0) < 1e-6)
    // return level must sit above the Gumbel location
    assert(row.getAs[Double]("return_level30_dollars") > row.getAs[Double]("gumbel_mu_dollars"))
  }
}
