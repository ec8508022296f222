package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.text.TextAnalysis

/** Temperature mix, token waterfill, curriculum schedule — driver
  * recomputation on sf0.001.
  */
class MixWaterCurricSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tokensBy(col1: String): Map[String, (Long, Long)] =
    Tables.documents(spark, sfDir)
      .selectExpr(col1, "size(split(trim(text), '\\\\s+')) AS t")
      .collect().map(r => (r.getString(0), r.getInt(1).toLong))
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap

  test("temperatureMix weights are micro-quantized sqrt shares summing to one") {
    val langs = tokensBy("lang")
    val tot = langs.values.map(_._2).sum
    val rows = TextAnalysis.temperatureMix(Tables.documents(spark, sfDir)).collect()
    assert(rows.length == langs.size)
    var mixSum = 0.0
    for (r <- rows) {
      val (nd, nt) = langs(r.getString(0))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_tokens") == nt)
      val w = math.round(math.sqrt(nt.toDouble / tot) * 1e6)
      assert(r.getAs[Long]("w_micro") == w)
      mixSum += r.getAs[Double]("mix_t2")
    }
    assert(math.abs(mixSum - 1.0) < 1e-9)
    // low-resource languages must be upsampled (factor > 1), high-resource down
    val fs = rows.map(r => (r.getAs[Double]("share"), r.getAs[Double]("resample_factor")))
    val minShare = fs.minBy(_._1)
    val maxShare = fs.maxBy(_._1)
    assert(minShare._2 >= maxShare._2)
  }

  test("tokenWaterfill allocations respect caps and never exceed the budget") {
    val rows = TextAnalysis.tokenWaterfill(Tables.documents(spark, sfDir)).collect()
    val budget = rows.head.getAs[Long]("budget")
    val cap = rows.head.getAs[Long]("cap")
    for (r <- rows) {
      assert(r.getAs[Long]("alloc2") <= cap)
      assert(r.getAs[Long]("alloc2") >= r.getAs[Long]("alloc1"))
      assert(r.getAs[Long]("alloc2") <= r.getAs[Long]("n_tokens") || cap > r.getAs[Long]("n_tokens"))
    }
    assert(rows.map(_.getAs[Long]("alloc2")).sum <= budget)
    // round two should consume at least as much of the budget as round one
    assert(rows.map(_.getAs[Long]("alloc2")).sum >= rows.map(_.getAs[Long]("alloc1")).sum)
  }

  test("curriculumSchedule orders phases by mean length with exact cumulatives") {
    val src = Tables.documents(spark, sfDir)
      .selectExpr("source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val order = src.toSeq.sortBy { case (s, (n, c)) => (c.toDouble / n, s) }.map(_._1)
    val rows = TextAnalysis.curriculumSchedule(Tables.documents(spark, sfDir))
      .orderBy("phase").collect()
    assert(rows.map(_.getString(1)).toSeq == order)
    val cums = rows.map(_.getAs[Long]("cum_docs"))
    assert(cums.last == src.values.map(_._1).sum)
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
  }
}
