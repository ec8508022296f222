package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Relational, Tables}
import graft.text.TextAnalysis

/** Round-3 continuation: multi-hot behavior masks, SRM check, quantile
  * transform, chi-square independence cells — brute-force recomputation
  * on sf0.001.
  */
class ExperimentOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val bitOf = Map(
    "click" -> 1L, "error" -> 2L, "purchase" -> 4L, "signup" -> 8L, "view" -> 16L)

  test("multihotEncode histograms exact user type-set bitmasks") {
    val got = Relational.multihotEncode(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("mask") -> (r.getAs[Long]("n_types"), r.getAs[Long]("n_users")))
      .toMap
    val masks = Tables.events(spark, sfDir).select("user_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
      .groupBy(_._1)
      .map { case (_, rs) => rs.map(r => bitOf(r._2)).distinct.sum }
    val expected = masks.groupBy(identity)
      .map { case (m, us) => m -> (java.lang.Long.bitCount(m).toLong, us.size.toLong) }
    assert(got == expected)
    assert(got.keys.exists(m => java.lang.Long.bitCount(m) > 1), "multi-type users exist")
  }

  test("srmCheck computes the two-bucket chi-square on distinct users") {
    val row = Relational.srmCheck(Tables.events(spark, sfDir)).collect().head
    val users = Tables.events(spark, sfDir).select("user_id").distinct().collect()
      .map(_.getAs[Long]("user_id"))
    val n1 = users.count(_ % 2 == 0).toLong
    val n2 = users.count(_ % 2 == 1).toLong
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("n2") == n2)
    val chi2 = ((n1 - n2) * (n1 - n2)).toDouble / (n1 + n2)
    assert(row.getAs[Double]("chi2") == chi2)
    assert(row.getAs[Long]("flagged") == (if (chi2 > 3.84) 1L else 0L))
  }

  test("quantileTransform maps ranks to uniform [0,1] endpoints included") {
    val got = Relational.quantileTransform(Tables.orders(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> (r.getAs[Long]("cents"), r.getAs[Double]("qt")))
      .toMap
    val cents = Tables.orders(spark, sfDir)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"), col("o_orderkey"))
      .collect()
      .map(r => (r.getAs[Long]("c"), r.getAs[Long]("o_orderkey")))
      .sorted
    val n = cents.length
    cents.zipWithIndex.foreach { case ((c, key), i) =>
      assert(got(key) == ((c, i.toDouble / (n - 1))), key)
    }
    val qs = got.values.map(_._2)
    assert(qs.min == 0.0 && qs.max == 1.0)
  }

  test("chi2Independence cells carry exact margins and contributions") {
    val got = TextAnalysis.chi2Independence(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")) ->
        (r.getAs[Long]("obs"), r.getAs[Double]("exp"), r.getAs[Double]("contrib")))
      .toMap
    val docs = Tables.documents(spark, sfDir).select("source", "lang").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")))
    val cells = docs.groupBy(identity).map { case (k, rs) => k -> rs.length.toLong }
    val rt = docs.groupBy(_._1).map { case (s, rs) => s -> rs.length.toLong }
    val ct = docs.groupBy(_._2).map { case (l, rs) => l -> rs.length.toLong }
    val n = docs.length.toLong
    assert(got.keySet == cells.keySet)
    for (((s, l), (obs, exp, contrib)) <- got) {
      assert(obs == cells((s, l)), (s, l))
      val e = rt(s).toDouble * ct(l).toDouble / n.toDouble
      assert(exp == e, (s, l))
      assert(contrib == (obs.toDouble - e) * (obs.toDouble - e) / e, (s, l))
    }
  }
}
