package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Round-3 continuation: Mann–Whitney U, count-min sketch accuracy,
  * reciprocal-rank fusion — brute-force recomputation on sf0.001.
  */
class StatsFusionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mannWhitney matches the tie-averaged rank-sum computed directly") {
    val row = Analytics
      .mannWhitney(Tables.events(spark, sfDir), "purchase", "click")
      .collect()
      .head
    val vals = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("x"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("x")))
    val na = vals.count(_._1 == "purchase").toLong
    val nb = vals.count(_._1 == "click").toLong
    // tie-averaged ranks over the merged sample, doubled to stay integral
    val byValue = vals.groupBy(_._2).toSeq.sortBy(_._1)
    var seen = 0L
    var twoRa = 0L
    var tie3 = 0L
    byValue.foreach { case (_, vs) =>
      val t = vs.length.toLong
      val aHere = vs.count(_._1 == "purchase").toLong
      twoRa += aHere * (2 * seen + t + 1)
      tie3 += t * t * t - t
      seen += t
    }
    val twoUa = twoRa - na * (na + 1)
    assert(row.getAs[Long]("na") == na)
    assert(row.getAs[Long]("nb") == nb)
    // two_u_a computes in DECIMAL(38,0) (tie³ terms wrap BIGINT at
    // scale) and reports as an exact-from-integer double
    assert(row.getAs[Double]("two_u_a") == twoUa.toDouble)
    val n = (na + nb).toDouble
    val sigma = math.sqrt(
      (na.toDouble * nb.toDouble / 12.0) *
        (n + 1 - tie3.toDouble / (n * (n - 1))))
    val z = (twoUa - na * nb).toDouble / (2.0 * sigma)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-12)
  }

  test("cmsAccuracy point estimates equal the d-row minimum and never undercount") {
    val got = TextAnalysis.cmsAccuracy(Tables.documents(spark, sfDir)).collect()
    val toks = Tables.documents(spark, sfDir)
      .select(col("text")).collect()
      .flatMap(r => r.getAs[String]("text").trim.split("\\s+"))
    val counts = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val md = java.security.MessageDigest.getInstance("MD5")
    def buckets(tok: String): Seq[(Int, Long)] = {
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      md.reset()
      (0 until 4).map(j => j -> java.lang.Long.parseLong(hex.substring(j * 8, j * 8 + 8), 16) % 512)
    }
    val counters = scala.collection.mutable.Map.empty[(Int, Long), Long]
    counts.foreach { case (t, c) =>
      buckets(t).foreach(b => counters(b) = counters.getOrElse(b, 0L) + c)
    }
    val expected = counts.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .take(20)
      .zipWithIndex
      .map { case ((t, c), i) =>
        (i + 1L, t, c, buckets(t).map(counters).min)
      }
    val gotSeq = got.sortBy(_.getAs[Long]("rank")).map(r =>
      (r.getAs[Long]("rank"), r.getAs[String]("tok"),
        r.getAs[Long]("true_cnt"), r.getAs[Long]("cms_est"))).toSeq
    assert(gotSeq == expected)
    got.foreach(r => assert(r.getAs[Long]("err") >= 0L))
  }

  test("rrfFusion reproduces the two-list reciprocal-rank combination") {
    val got = Similarity.rrfFusion(Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("nid"), r.getAs[Double]("rrf")))
      .toMap
    def ranks(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) -> r.getAs[Long]("rank"))
        .toMap
    val ex = ranks(Similarity.cosineTopK(Tables.embeddings(spark, sfDir), 10, 5))
    val iv = ranks(Similarity.ivfTopK(Tables.embeddings(spark, sfDir), 10, 5))
    val expected = (ex.keySet union iv.keySet).toSeq
      .map { case (q, n) =>
        val s = ex.get((q, n)).map(r => 1.0 / (60 + r.toDouble)).getOrElse(0.0) +
          iv.get((q, n)).map(r => 1.0 / (60 + r.toDouble)).getOrElse(0.0)
        (q, n, s)
      }
      .groupBy(_._1)
      .flatMap { case (q, rows) =>
        rows.sortBy { case (_, n, s) => (-s, n) }.take(5).zipWithIndex.map {
          case ((_, n, s), i) => (q, i + 1L) -> ((n, s))
        }
      }
    assert(got == expected)
  }
}
