package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.text.TextAnalysis

/** Round-3 continuation: 1-D EMD, histogram quantile sketch, outlier
  * ensemble — brute-force recomputation on sf0.001.
  */
class SketchEnsembleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("emd equals the summed |F_a - F_b| over gap widths") {
    val row = TextAnalysis.emd(Tables.documents(spark, sfDir), "src0", "src1")
      .collect().head
    val rows = Tables.documents(spark, sfDir)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
    val na = rows.count(_._1 == "src0").toLong
    val nb = rows.count(_._1 == "src1").toLong
    val grid = rows.groupBy(_._2).toSeq.sortBy(_._1)
    var (ca, cb, num) = (0L, 0L, 0L)
    grid.zipWithIndex.foreach { case ((x, vs), i) =>
      ca += vs.count(_._1 == "src0")
      cb += vs.count(_._1 == "src1")
      if (i + 1 < grid.length) {
        val gap = grid(i + 1)._1 - x
        num += math.abs(ca * nb - cb * na) * gap
      }
    }
    assert(row.getAs[Long]("na") == na)
    assert(row.getAs[Long]("nb") == nb)
    assert(row.getAs[Long]("w1_num") == num)
    assert(math.abs(row.getAs[Double]("emd") - num.toDouble / (na * nb)) < 1e-12)
  }

  test("histQuantile estimates interpolate the 256-bin histogram") {
    val got = Analytics.histQuantile(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("q") ->
        (r.getAs[Long]("n"), r.getAs[Double]("est_cents"), r.getAs[Double]("exact_cents")))
      .toMap
    val cs = Tables.events(spark, sfDir)
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("c")).collect()
      .map(_.getAs[Long]("c"))
    val (mn, mx, n) = (cs.min, cs.max, cs.length.toLong)
    val binCnt = cs.groupBy(c => (c - mn) * 256 / (mx - mn + 1))
      .map { case (b, xs) => b -> xs.length.toLong }
    val bins = binCnt.keys.toSeq.sorted
    def pct(q: Double): Double = {
      val sorted = cs.sorted
      val pos = q * (sorted.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      if (lo == hi) sorted(lo).toDouble
      else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
    }
    Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)).foreach { case (lbl, q) =>
      val need = math.ceil(q * n.toDouble).toLong
      var cum = 0L
      var hit = -1L
      var cumBefore = 0L
      bins.iterator.takeWhile(_ => hit < 0).foreach { b =>
        cumBefore = cum
        cum += binCnt(b)
        if (cum >= need) hit = b
      }
      val est = mn.toDouble +
        (hit.toDouble + (need - cumBefore).toDouble / binCnt(hit).toDouble) *
          ((mx - mn + 1).toDouble / 256.0)
      val (gn, gest, gexact) = got(lbl)
      assert(gn == n)
      assert(math.abs(gest - est) < 1e-9, lbl)
      assert(math.abs(gexact - pct(q)) < 1e-9, lbl)
      // sketch estimate lands within one bin width of the exact value
      assert(math.abs(gest - gexact) <= (mx - mn + 1).toDouble / 256.0 + 1e-9, lbl)
    }
  }

  test("outlierEnsemble flags agree with per-detector recomputation") {
    val got = Analytics.outlierEnsemble(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_z"), r.getAs[Long]("n_iqr"),
          r.getAs[Long]("n_mad"), r.getAs[Long]("n_any"), r.getAs[Long]("n_all")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT) div 100").as("x"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("x")))
    def pct(xs: Seq[Long], q: Double): Double = {
      val sorted = xs.sorted
      val pos = q * (sorted.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      if (lo == hi) sorted(lo).toDouble
      else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
    }
    def pctD(xs: Seq[Double], q: Double): Double = {
      val sorted = xs.sorted
      val pos = q * (sorted.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      if (lo == hi) sorted(lo)
      else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
    }
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val xs = rs.map(_._2).toSeq
      val n = xs.length.toLong
      val mean = xs.sum.toDouble / n
      val sd = math.sqrt((xs.map(x => x.toDouble * x).sum - xs.sum.toDouble * xs.sum / n) / (n - 1))
      val (q1, q3) = (pct(xs, 0.25), pct(xs, 0.75))
      val med = pct(xs, 0.5)
      val mad = pctD(xs.map(x => math.abs(x.toDouble - med)), 0.5)
      val flags = xs.map { x =>
        val fz = if (math.abs(x - mean) > 3.0 * sd) 1 else 0
        val fi = if (x < q1 - 1.5 * (q3 - q1) || x > q3 + 1.5 * (q3 - q1)) 1 else 0
        val fm = if (math.abs(x - med) > 3.0 * 1.4826 * mad) 1 else 0
        (fz, fi, fm)
      }
      val exp = (n, flags.map(_._1).sum.toLong, flags.map(_._2).sum.toLong,
        flags.map(_._3).sum.toLong,
        flags.count(f => f._1 + f._2 + f._3 >= 1).toLong,
        flags.count(f => f._1 + f._2 + f._3 == 3).toLong)
      assert(got(t) == exp, s"type $t")
    }
  }
}
