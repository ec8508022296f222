package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.text.Dedup

/** Round-3 continuation: LSH blocking quality, paired shift test,
  * effective sample size — brute-force recomputation on sf0.001.
  */
class BlockingPairedEssSpec extends AnyFunSuite {
  import SparkTestSession._

  test("blockingQuality counts agree with its own truth and candidate sets") {
    val r = Dedup.blockingQuality(Tables.documents(spark, sfDir)).collect().head
    val nDocs = Tables.documents(spark, sfDir).count()
    val truth = Dedup.ngramJaccard(Tables.documents(spark, sfDir), 0.5)
      .select("doc_a", "doc_b").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    // candidate pairs straight from band buckets (no estimate filter):
    // recompute via signatures
    val sigs = Dedup.minhashSignatures(Tables.documents(spark, sfDir), 32).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getSeq[Long](x.fieldIndex("sig")))
    val cand = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      if (0 until 8).exists(b => sa.slice(b * 4, b * 4 + 4) == sb.slice(b * 4, b * 4 + 4))
    } yield (ida, idb)).toSet
    assert(r.getAs[Long]("n_docs") == nDocs)
    assert(r.getAs[Long]("n_true") == truth.size)
    assert(r.getAs[Long]("n_cand") == cand.size)
    assert(r.getAs[Long]("n_hit") == (truth intersect cand).size)
    assert(r.getAs[Double]("completeness") ==
      (truth intersect cand).size.toDouble / truth.size)
    assert(r.getAs[Double]("reduction_ratio") ==
      1.0 - cand.size.toDouble / (nDocs.toDouble * (nDocs - 1).toDouble / 2.0))
    // a sane blocking: prunes most pairs, keeps most true dups
    assert(r.getAs[Double]("reduction_ratio") > 0.9)
    assert(r.getAs[Double]("completeness") > 0.5)
  }

  test("pairedShift quantized differences match per-user half means") {
    val r = Analytics.pairedShift(Tables.events(spark, sfDir)).collect().head
    val byUser = Tables.events(spark, sfDir)
      .select(col("user_id"), dayofmonth(col("ts")).as("dom"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Int]("dom") <= 15, x.getAs[Long]("c")))
      .groupBy(t => (t._1, t._2))
      .view.mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    val users = byUser.keys.map(_._1).toSet
      .filter(u => byUser.contains((u, true)) && byUser.contains((u, false)))
    val ds = users.toSeq.map { u =>
      val (n1, s1) = byUser((u, true))
      val (n2, s2) = byUser((u, false))
      math.round(s2.toDouble / n2 - s1.toDouble / n1)
    }
    assert(r.getAs[Long]("n_users") == ds.length)
    val mean = ds.sum.toDouble / ds.length
    assert(math.abs(r.getAs[Double]("mean_shift_dollars") - mean / 100.0) < 1e-9)
    val v = ds.map(d => (d - mean) * (d - mean)).sum / (ds.length - 1)
    val t = mean / math.sqrt(v / ds.length)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-6 * math.max(1.0, math.abs(t)))
  }

  test("effectiveSampleSize: unequal weights give ess < n and deff = n/ess") {
    val rows = Analytics.effectiveSampleSize(Tables.lineitem(spark, sfDir)).collect()
    val ws = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), expr("CAST(round(l_quantity) AS BIGINT)").as("w"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    rows.foreach { r =>
      val g = ws.filter(_._1 == r.getAs[String]("l_returnflag")).map(_._2)
      val (sw, sw2) = (g.sum, g.map(w => w * w).sum)
      assert(r.getAs[Long]("n") == g.length)
      assert(r.getAs[Long]("sum_w") == sw && r.getAs[Long]("sum_w2") == sw2)
      val ess = sw.toDouble * sw.toDouble / sw2.toDouble
      assert(math.abs(r.getAs[Double]("ess") - ess) / ess < 1e-12)
      assert(r.getAs[Double]("ess") < g.length)
      assert(math.abs(r.getAs[Double]("deff") - g.length / ess) / (g.length / ess) < 1e-12)
    }
    assert(rows.length == 3)
  }
}
