package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.text.{Dedup, TextAnalysis}

/** Round-3 continuation: curation filter funnel, dedup threshold sweep,
  * winsorized mean — brute-force recomputation on sf0.001.
  */
class FunnelOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("filterFunnel cumulative pass counts are monotone and exact") {
    val row = TextAnalysis.filterFunnel(Tables.documents(spark, sfDir)).collect().head
    val docs = Tables.documents(spark, sfDir).select("text", "lang", "n_chars").collect()
      .map(r => (r.getAs[String]("text"), r.getAs[String]("lang"), r.getAs[Long]("n_chars")))
    def toks(t: String) = t.trim.split("\\s+")
    val s1 = docs.filter(_._3 >= 100)
    val s2 = s1.filter(d => toks(d._1).length >= 20)
    val s3 = s2.filter { d =>
      val ts = toks(d._1); ts.distinct.length * 10 >= ts.length * 3
    }
    val s4 = s3.filter(d => Set("en", "es", "de", "fr")(d._2))
    assert(row.getAs[Long]("n_docs") == docs.length.toLong)
    assert(row.getAs[Long]("pass_len") == s1.length.toLong)
    assert(row.getAs[Long]("pass_tokens") == s2.length.toLong)
    assert(row.getAs[Long]("pass_diversity") == s3.length.toLong)
    assert(row.getAs[Long]("pass_lang") == s4.length.toLong)
    assert(row.getAs[Double]("final_yield") == s4.length.toDouble / docs.length)
    // the funnel must actually narrow at least twice on the fixture
    val counts = Seq(docs.length, s1.length, s2.length, s3.length, s4.length)
    assert(counts.zip(counts.tail).count { case (a, b) => b < a } >= 2, counts)
  }

  test("dedupThresholdSweep bucket counts agree with the pair table") {
    val row = Dedup.dedupThresholdSweep(Tables.documents(spark, sfDir)).collect().head
    val pairs = Dedup.minhashNearDups(Tables.documents(spark, sfDir), minEstJaccard = 0.0)
      .collect()
      .map(_.getAs[Double]("est_jaccard"))
    assert(row.getAs[Long]("n_candidates") == pairs.length.toLong)
    for ((t, colName) <- Seq(0.5 -> "ge_050", 0.6 -> "ge_060", 0.7 -> "ge_070",
      0.8 -> "ge_080", 0.9 -> "ge_090")) {
      assert(row.getAs[Long](colName) == pairs.count(_ >= t).toLong, colName)
    }
    // sweep is monotone decreasing
    val seq = Seq("ge_050", "ge_060", "ge_070", "ge_080", "ge_090").map(row.getAs[Long])
    assert(seq.zip(seq.tail).forall { case (a, b) => a >= b })
    assert(pairs.nonEmpty)
  }

  test("winsorizedMean clamps at integer-rounded percentile fences") {
    val got = Analytics.winsorizedMean(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"),
          r.getAs[Long]("winsor_cents"), r.getAs[Long]("raw_cents"),
          r.getAs[Double]("winsor_mean")))
      .toMap
    def pct(sorted: Seq[Long], q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) sorted(lo).toDouble
      else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
    }
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("c")))
    for ((t, rs) <- rows.groupBy(_._1)) {
      val cs = rs.map(_._2)
      val sorted = cs.sorted.toSeq
      val lo = math.round(pct(sorted, 0.05))
      val hi = math.round(pct(sorted, 0.95))
      val winsor = cs.map(c => math.max(lo, math.min(hi, c))).sum
      val (gn, glo, ghi, gw, graw, gm) = got(t)
      assert(gn == cs.length.toLong, t)
      assert(glo == lo && ghi == hi, t)
      assert(gw == winsor && graw == cs.sum, t)
      assert(gm == winsor.toDouble / cs.length, t)
      // winsorization actually clipped something
      assert(winsor != cs.sum, t)
    }
  }
}
