package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.text.{Dedup, TextAnalysis}

/** Holt smoothing, Zipf audit, incremental dedup — brute-force
  * recomputation on sf0.001.
  */
class HoltZipfIncrSpec extends AnyFunSuite {
  import SparkTestSession._

  test("holtLinear matches a driver-side integer fold over the daily series") {
    val daily = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var l = daily.head._2 * 4
    var b = 0L
    for ((_, y) <- daily.tail) {
      val l2 = (2 * y * 4 + 2 * (l + b)) / 4
      b = (l2 - l + 3 * b) / 4
      l = l2
    }
    val row = Analytics.holtLinear(Tables.events(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_days") == daily.length.toLong)
    assert(row.getAs[Long]("level_q") == l)
    assert(row.getAs[Long]("trend_q") == b)
    assert(math.abs(row.getAs[Double]("forecast7_dollars") - (l + 7 * b) / 400.0) < 1e-9)
  }

  test("zipfAudit rank-frequency products match the driver token counts") {
    val counts = Tables.documents(spark, sfDir)
      .select(explode(expr("split(trim(text), '\\\\s+')")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val c1 = counts.map(_._2).max
    val top = counts.sortBy { case (t, n) => (-n, t) }.take(30)
    val rows = TextAnalysis.zipfAudit(Tables.documents(spark, sfDir)).orderBy("rank").collect()
    assert(rows.length == 30)
    for ((r, i) <- rows.zipWithIndex) {
      val (tok, n) = top(i)
      assert(r.getAs[String]("token") == tok, s"rank ${i + 1}")
      assert(r.getAs[Long]("rf") == (i + 1).toLong * n)
      assert(math.abs(r.getAs[Double]("rf_ratio") - (i + 1).toDouble * n / c1) < 1e-12)
    }
  }

  test("incrementalDedup flags exactly the batch docs sharing a band with history") {
    val sigs = Dedup.minhashSignatures(Tables.documents(spark, sfDir), 32)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
    def isBatch(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 5 == 0
    }
    val hist = sigs.filterNot { case (id, _) => isBatch(id) }
    val histBands: Set[(Int, Seq[Long])] =
      hist.flatMap { case (_, s) => (0 until 8).map(bd => (bd, s.slice(bd * 4, bd * 4 + 4))) }.toSet
    val expect = sigs.collect {
      case (id, s) if isBatch(id) =>
        (id, (0 until 8).exists(bd => histBands((bd, s.slice(bd * 4, bd * 4 + 4)))))
    }.toMap
    val got = Dedup.incrementalDedup(Tables.documents(spark, sfDir))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
      .toMap
    assert(got == expect)
  }

  test("incrementalBestMatch attributes each batch doc to its best corpus match or admits it") {
    val sigs = Dedup.minhashSignatures(Tables.documents(spark, sfDir), 32)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val (batch, corpus) = sigs.partition { case (id, _) => bucket(id) == 0 }
    val corpusBands: Map[(Int, Seq[Long]), Seq[Long]] = corpus
      .flatMap { case (id, s) => (0 until 8).map(bd => ((bd, s.slice(bd * 4, bd * 4 + 4)), id)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val corpusSig = corpus.toMap
    val expect = batch.map { case (id, s) =>
      val cands = (0 until 8)
        .flatMap(bd => corpusBands.getOrElse((bd, s.slice(bd * 4, bd * 4 + 4)), Nil))
        .distinct
      val scored = cands
        .map(c => (c, s.zip(corpusSig(c)).count { case (x, y) => x == y } / 32.0))
        .filter(_._2 >= 0.5)
      val best = scored.sortBy { case (c, j) => (-j, c) }.headOption
      id -> best
    }.toMap
    val got = Dedup.incrementalBestMatch(Tables.documents(spark, sfDir))
      .collect()
      .map { r =>
        val m =
          if (r.isNullAt(r.fieldIndex("corpus_doc"))) None
          else Some((r.getAs[Long]("corpus_doc"), r.getAs[Double]("est_jaccard")))
        assert(r.getAs[Boolean]("admitted") == m.isEmpty)
        r.getAs[Long]("new_doc") -> m
      }.toMap
    assert(got.keySet == expect.keySet, "batch membership must be the md5 mod-10 split")
    assert(got == expect)
    assert(batch.nonEmpty && corpus.nonEmpty, "split must cut both ways")
    // the matched path (corpus_doc attribution) has no cross-split
    // near-dup in this fixture; it is exercised by the sf0.01/sf0.1
    // oracle runs (q_dedup_incremental: 1 and 46 matched pairs)
  }
}
