package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.text.TextAnalysis

/** Round-3 continuation: freshness lag, revenue bridge, time-in-state,
  * vocabulary drift — brute-force recomputation on sf0.001.
  */
class BridgeOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("freshness reports per-type watermark lag") {
    val got = Analytics.freshness(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("max_ts"), r.getAs[Long]("lag_sec")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(ts AS LONG)").as("s")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("s")))
    val globalMax = rows.map(_._2).max
    for ((t, rs) <- rows.groupBy(_._1)) {
      val mx = rs.map(_._2).max
      assert(got(t) == ((rs.length.toLong, mx, globalMax - mx)), t)
    }
    assert(got.values.exists(_._3 == 0L), "some type holds the watermark")
    assert(got.values.exists(_._3 > 0L), "some type lags it")
  }

  test("revenueBridge volume+mix effects reconstruct the delta") {
    val got = Analytics.revenueBridge(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("s_a"), r.getAs[Long]("n_b"), r.getAs[Long]("s_b"),
          r.getAs[Long]("delta_cents"), r.getAs[Double]("volume_effect"),
          r.getAs[Double]("mix_effect")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(ts AS LONG) div 604800").as("w"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("w"), r.getAs[Long]("c")))
    val w0 = rows.map(_._2).min
    for ((t, rs) <- rows.groupBy(_._1)) {
      val a = rs.filter(_._2 == w0)
      val b = rs.filter(_._2 == w0 + 3)
      val (na, sa) = (a.length.toLong, a.map(_._3).sum)
      val (nb, sb) = (b.length.toLong, b.map(_._3).sum)
      val (gna, gsa, gnb, gsb, gd, gve, gme) = got(t)
      assert((gna, gsa, gnb, gsb, gd) == ((na, sa, nb, sb, sb - sa)), t)
      val ve = (nb - na).toDouble * (sa.toDouble / na)
      assert(gve == ve && gme == (sb - sa).toDouble - ve, t)
      // effects reconstruct the delta up to FP association
      assert(math.abs((gve + gme) - (sb - sa).toDouble) < 1e-6, t)
    }
  }

  test("timeInState sums gaps to each user's next event per state") {
    val got = Analytics.timeInState(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_stays"), r.getAs[Long]("total_sec"), r.getAs[Long]("max_sec"),
          r.getAs[Double]("avg_sec")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("CAST(ts AS LONG)").as("s"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("s")))
    val dwells = rows.groupBy(_._1).values.flatMap { es =>
      val sorted = es.toSeq.sortBy(e => (e._4, e._2))
      sorted.zip(sorted.tail).map { case (cur, nxt) => (cur._3, nxt._4 - cur._4) }
    }.toSeq
    for ((t, ds) <- dwells.groupBy(_._1)) {
      val vs = ds.map(_._2)
      assert(got(t) == ((vs.length.toLong, vs.sum, vs.max, vs.sum.toDouble / vs.length)), t)
    }
    assert(got.keySet == dwells.map(_._1).toSet)
  }

  test("vocabDrift Jaccard between consecutive doc batches") {
    val got = TextAnalysis.vocabDrift(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("batch") ->
        (r.getAs[Long]("n_tokens_prev"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_common"),
          r.getAs[Double]("jaccard")))
      .toMap
    val sets = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .flatMap(r => r.getAs[String]("text").trim.split("\\s+")
        .map(t => (r.getAs[Long]("doc_id") / 100, t)))
      .distinct
      .groupBy(_._1).map { case (b, ts) => b -> ts.map(_._2).toSet }
    val batches = sets.keys.toSeq.sorted
    val expectedKeys = batches.filter(b => sets.contains(b - 1)).toSet
    assert(got.keySet == expectedKeys)
    for (b <- expectedKeys) {
      val (prev, cur) = (sets(b - 1), sets(b))
      val common = (prev intersect cur).size.toLong
      val j = common.toDouble / (prev.size + cur.size - common)
      assert(got(b) == ((prev.size.toLong, cur.size.toLong, common, j)), b)
    }
    assert(expectedKeys.nonEmpty)
  }
}
