package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.text.TextAnalysis

/** Round-3 continuation: SAX symbolization, dense-spine interpolation,
  * keyword lift, dictionary coverage, URL extraction — brute-force
  * recomputation on sf0.001.
  */
class SpineOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def hourlyCounts: Seq[(Long, Long)] =
    Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS LONG) div 3600").as("h"))
      .collect()
      .map(_.getAs[Long]("h"))
      .groupBy(identity).toSeq
      .map { case (h, rs) => (h, rs.length.toLong) }
      .sortBy(_._1)

  test("saxSymbols z-scores and alphabet match the global-stat closed form") {
    val got = Analytics.saxSymbols(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("hour") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("z"), r.getAs[String]("symbol")))
      .toMap
    val series = hourlyCounts
    val n = series.length.toDouble
    val s = series.map(_._2).sum.toDouble
    val ss = series.map(x => x._2 * x._2).sum.toDouble
    val mean = s / n
    val sd = math.sqrt(ss / n - mean * mean)
    for ((h, cnt) <- series) {
      val z = (cnt - mean) / sd
      val sym = if (z < -0.6745) "a" else if (z < 0.0) "b" else if (z < 0.6745) "c" else "d"
      assert(got(h)._1 == cnt, h)
      assert(math.abs(got(h)._2 - z) < 1e-12, h)
      assert(got(h)._3 == sym, h)
    }
    assert(got.values.map(_._3).toSet.size >= 3, "alphabet should be exercised")
  }

  test("gapInterpolate fills gaps linearly between observed neighbors") {
    val rows = Analytics.gapInterpolate(Tables.events(spark, sfDir)).orderBy("hour").collect()
    val observed = hourlyCounts.toMap
    val hours = rows.map(_.getAs[Long]("hour"))
    assert(hours.toSeq == (hours.min to hours.max), "spine must be dense")
    val obsSorted = hourlyCounts
    var anyGap = false
    for (r <- rows) {
      val h = r.getAs[Long]("hour")
      val filled = r.getAs[Double]("filled")
      observed.get(h) match {
        case Some(c) =>
          assert(r.getAs[Long]("was_gap") == 0L, h)
          assert(filled == c.toDouble, h)
        case None =>
          anyGap = true
          assert(r.getAs[Long]("was_gap") == 1L, h)
          val prev = obsSorted.filter(_._1 < h).lastOption
          val next = obsSorted.find(_._1 > h)
          val expected = (prev, next) match {
            case (Some((ph, pv)), Some((nh, nv))) =>
              pv + (nv - pv).toDouble * ((h - ph).toDouble / (nh - ph).toDouble)
            case (Some((_, pv)), None) => pv.toDouble
            case (None, Some((_, nv))) => nv.toDouble
            case _ => fail("empty series")
          }
          assert(math.abs(filled - expected) < 1e-12, h)
      }
    }
    assert(anyGap, "fixture series should contain at least one empty hour")
  }

  test("keywordLift ranks tokens by within-source over corpus share") {
    val got = TextAnalysis.keywordLift(Tables.documents(spark, sfDir)).collect()
    val toks = Tables.documents(spark, sfDir).select("source", "text").collect()
      .flatMap(r => r.getAs[String]("text").trim.split("\\s+")
        .map(t => (r.getAs[String]("source"), t)))
    val pst = toks.groupBy(identity).map { case ((s, t), rs) => (s, t, rs.length.toLong) }
    val tc = pst.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._3).sum }
    val sn = pst.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._3).sum }
    val nn = sn.values.sum
    val expected = pst
      .filter(p => tc(p._2) >= 5L)
      .map { case (s, t, c) =>
        (s, t, c, c.toDouble * nn.toDouble / (sn(s).toDouble * tc(t).toDouble))
      }
      .groupBy(_._1)
      .flatMap { case (s, rs) =>
        rs.toSeq.sortBy(r => (-r._4, r._2)).take(5).zipWithIndex
          .map { case ((_, t, c, l), i) => (s, i + 1L, t, c, l) }
      }
      .toSet
    val gotSet = got.map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"),
      r.getAs[String]("tok"), r.getAs[Long]("cnt"), r.getAs[Double]("lift"))).toSet
    assert(gotSet == expected)
  }

  test("dictCoverage covers with the global top-10 tokens") {
    val got = TextAnalysis.dictCoverage(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_covered"), r.getAs[Double]("coverage")))
      .toMap
    val toks = Tables.documents(spark, sfDir).select("source", "text").collect()
      .flatMap(r => r.getAs[String]("text").trim.split("\\s+")
        .map(t => (r.getAs[String]("source"), t)))
    val tc = toks.groupBy(_._2).map { case (t, rs) => t -> rs.length.toLong }
    val dict = tc.toSeq.sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).toSet
    for ((src, rows) <- toks.groupBy(_._1)) {
      val n = rows.length.toLong
      val cov = rows.count(r => dict(r._2)).toLong
      assert(got(src) == ((n, cov, cov.toDouble / n)), src)
      assert(cov > 0 && cov < n, s"$src coverage should be fractional")
    }
  }

  test("urlExtract round-trips the synthesized fields") {
    val rows = TextAnalysis.urlExtract(Tables.documents(spark, sfDir)).collect()
    val docs = Tables.documents(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), r.getAs[String]("lang"), r.getAs[Long]("n_chars")))
      .toMap
    assert(rows.length == docs.size)
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val (src, lang, nChars) = docs(id)
      assert(r.getAs[String]("host") == s"$src.example.com", id)
      assert(r.getAs[String]("path_lang") == lang, id)
      assert(r.getAs[Long]("len_param") == nChars, id)
    }
  }
}
