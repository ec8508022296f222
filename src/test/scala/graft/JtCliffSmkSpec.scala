package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Inference, Tables}

/** Jonckheere–Terpstra, Cliff's delta, seasonal Mann–Kendall — driver
  * recomputation on sf0.001.
  */
class JtCliffSmkSpec extends AnyFunSuite {
  import SparkTestSession._

  private val types = Seq("click", "error", "purchase", "signup", "view")

  private def valuesByType(): Map[String, Seq[Long]] =
    Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS x")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("jonckheereTerpstra equals the brute-force pairwise U sum") {
    val vs = valuesByType()
    var jt2 = 0L
    for {
      i <- types.indices
      j <- i + 1 until types.length
      a <- vs(types(i))
      b <- vs(types(j))
    } {
      if (a < b) jt2 += 2
      else if (a == b) jt2 += 1
    }
    val ns = types.map(t => vs(t).size.toLong)
    val n = ns.sum
    val e2 = (n * n - ns.map(x => x * x).sum) / 2
    val row = Inference.jonckheereTerpstra(Tables.events(spark, sfDir), types).collect().head
    assert(row.getAs[Long]("n_total") == n)
    assert(row.getAs[Long]("jt2") == jt2)
    assert(row.getAs[Long]("e2") == e2)
    val var72 = n * n * (2 * n + 3) - ns.map(x => x * x * (2 * x + 3)).sum
    val z = (jt2 - e2).toDouble / (2.0 * math.sqrt(var72.toDouble / 72.0))
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-9)
  }

  test("cliffsDelta equals the brute-force dominance counts") {
    val vs = valuesByType()
    val as = vs("purchase"); val bs = vs("click")
    var gt = 0L; var lt = 0L
    for (a <- as; b <- bs) {
      if (a > b) gt += 1 else if (a < b) lt += 1
    }
    val row = Inference.cliffsDelta(Tables.events(spark, sfDir), "purchase", "click")
      .collect().head
    assert(row.getAs[Long]("na") == as.size.toLong)
    assert(row.getAs[Long]("nb") == bs.size.toLong)
    assert(row.getAs[Long]("gt") == gt)
    assert(row.getAs[Long]("lt") == lt)
    val delta = (gt - lt).toDouble / (as.size.toDouble * bs.size)
    assert(math.abs(row.getAs[Double]("delta") - delta) < 1e-12)
  }

  test("seasonalMannKendall sums per-season S and variances") {
    val daily = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var s = 0L
    var var18 = 0L
    var nDays = 0L
    val seasons = daily.groupBy(_._1 % 7)
    for ((_, ds) <- seasons) {
      val sorted = ds.sortBy(_._1).map(_._2)
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        s += java.lang.Long.signum(sorted(j) - sorted(i))
      val n = sorted.length.toLong
      val tieTerm = sorted.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      var18 += n * (n - 1) * (2 * n + 5) - tieTerm
      nDays += n
    }
    val row = Analytics.seasonalMannKendall(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == nDays)
    assert(row.getAs[Long]("n_seasons") == seasons.size.toLong)
    assert(row.getAs[Long]("s_stat") == s)
    val cc = if (s > 0) (s - 1).toDouble else if (s < 0) (s + 1).toDouble else 0.0
    assert(math.abs(row.getAs[Double]("z") - cc / math.sqrt(var18.toDouble / 18.0)) < 1e-9)
  }
}
