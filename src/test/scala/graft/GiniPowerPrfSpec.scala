package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.text.Dedup

/** Round-3 continuation: sequence predictability, A/B power analysis,
  * dedup precision/recall — brute-force recomputation on sf0.001.
  */
class GiniPowerPrfSpec extends AnyFunSuite {
  import SparkTestSession._

  test("sequencePredictability collision probability is sum(c^2)/n^2") {
    val rows = Analytics.sequencePredictability(Tables.events(spark, sfDir)).collect()
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[java.sql.Timestamp]("ts").getTime,
        x.getAs[Long]("event_id"), x.getAs[String]("event_type")))
    val pairs = evs.groupBy(_._1).values.toSeq.flatMap { g =>
      val s = g.sortBy(t => (t._2, t._3)).map(_._4)
      s.zip(s.drop(1))
    }
    rows.foreach { r =>
      val p = r.getAs[String]("event_type")
      val succ = pairs.filter(_._1 == p).map(_._2)
      val counts = succ.groupBy(identity).values.map(_.size.toLong)
      assert(r.getAs[Long]("n_successors") == counts.size)
      assert(r.getAs[Long]("n") == succ.size)
      val cp = counts.map(c => c * c).sum.toDouble / (succ.size.toDouble * succ.size)
      assert(math.abs(r.getAs[Double]("collision_prob") - cp) < 1e-12)
      assert(math.abs(r.getAs[Double]("eff_branching") - 1.0 / cp) < 1e-9)
      // bounded by uniform (1/k) below and 1 above
      assert(cp >= 1.0 / counts.size - 1e-12 && cp <= 1.0)
    }
    assert(rows.length == 5)
  }

  test("abPowerAnalysis applies the two-proportion power formula") {
    val r = Analytics.abPowerAnalysis(Tables.events(spark, sfDir)).collect().head
    val users = Tables.events(spark, sfDir).select("user_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getString(1)))
      .groupBy(_._1).map { case (u, g) => (u, g.exists(_._2 == "purchase")) }
    def arm(u: Long): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(u.toString.getBytes)
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val a0 = users.filter(u => arm(u._1) == 0)
    val a1 = users.filter(u => arm(u._1) == 1)
    assert(r.getAs[Long]("n1") == a0.size && r.getAs[Long]("n2") == a1.size)
    assert(r.getAs[Long]("c1") == a0.count(_._2) && r.getAs[Long]("c2") == a1.count(_._2))
    val (p1, p2) = (a0.count(_._2).toDouble / a0.size, a1.count(_._2).toDouble / a1.size)
    if (p1 != p2) {
      val expected = math.pow(1.96 + 0.8416, 2) * (p1 * (1 - p1) + p2 * (1 - p2)) /
        ((p1 - p2) * (p1 - p2))
      assert(math.abs(r.getAs[Double]("n_per_arm") - expected) / expected < 1e-9)
      assert(r.getAs[Double]("n_per_arm") > 0)
    }
  }

  test("dedupPrf counts hits between minhash decisions and jaccard gold") {
    val r = Dedup.dedupPrf(Tables.documents(spark, sfDir)).collect().head
    val gold = Dedup.ngramJaccard(Tables.documents(spark, sfDir), 0.5)
      .select("doc_a", "doc_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val srcs = Tables.documents(spark, sfDir).select("doc_id", "source").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val pred = Dedup.minhashNearDups(Tables.documents(spark, sfDir))
      .select("doc_a", "doc_b").collect().map(x => (x.getLong(0), x.getLong(1)))
      .filter(p => srcs(p._1) == srcs(p._2)).toSet
    assert(r.getAs[Long]("n_gold") == gold.size)
    assert(r.getAs[Long]("n_pred") == pred.size)
    assert(r.getAs[Long]("n_hit") == (gold intersect pred).size)
    val (p, rec) = ((gold intersect pred).size.toDouble / pred.size,
      (gold intersect pred).size.toDouble / gold.size)
    assert(math.abs(r.getAs[Double]("precision") - p) < 1e-12)
    assert(math.abs(r.getAs[Double]("recall") - rec) < 1e-12)
    assert(math.abs(r.getAs[Double]("f1") - 2 * p * rec / (p + rec)) < 1e-12)
    // the sketch should be a decent classifier on this corpus
    assert(r.getAs[Double]("precision") > 0.5 && r.getAs[Double]("recall") > 0.5)
  }
}
