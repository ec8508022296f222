package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, AsOfJoin, Graph, Relational, Tables}

/** Round-3 continuation: trailing RANGE sums, item recommendations,
  * null-safe join semantics, forward as-of join — brute-force
  * recomputation on sf0.001.
  */
class RecOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("rollingSums RANGE frames respect calendar gaps") {
    val got = Analytics.rollingSums(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("cents"), r.getAs[Long]("r7_cents"), r.getAs[Long]("r28_cents")))
      .toMap
    val daily = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS LONG) div 86400").as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("c")))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).sum }
    for ((d, (c, r7, r28)) <- got) {
      assert(c == daily(d), d)
      assert(r7 == daily.filter { case (k, _) => k >= d - 6 && k <= d }.values.sum, d)
      assert(r28 == daily.filter { case (k, _) => k >= d - 27 && k <= d }.values.sum, d)
    }
    assert(got.keySet == daily.keySet)
  }

  test("itemRecommendations ranks co-order partners per part") {
    val got = Graph.itemRecommendations(Tables.lineitem(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("rec_part"), r.getAs[Long]("w")))
      .toMap
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
      .distinct
    val pairW = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, rs) => p -> rs.size.toLong }
    val bidir = pairW.toSeq.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val expected = bidir.groupBy(_._1).flatMap { case (part, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case ((_, rec, w), i) => (part, i + 1L) -> (rec, w) }
    }
    assert(got == expected)
  }

  test("nullSafeJoinReport: <=> matches exactly one more key pair than = when both sides hold null") {
    val row = Relational
      .nullSafeJoinReport(Tables.events(spark, sfDir), Tables.orders(spark, sfDir))
      .collect().head
    val aKeys = Tables.events(spark, sfDir).select("event_id").collect()
      .map(_.getAs[Long]("event_id"))
      .map(id => if (id % 7 == 0) None else Some(id % 100)).distinct
    val bKeys = Tables.orders(spark, sfDir).select("o_orderkey").collect()
      .map(_.getAs[Long]("o_orderkey"))
      .map(k => if (k % 11 == 0) None else Some(k % 100)).distinct
    val eq = aKeys.flatten.toSet.intersect(bKeys.flatten.toSet).size.toLong
    val ns = eq + (if (aKeys.contains(None) && bKeys.contains(None)) 1L else 0L)
    assert(row.getAs[Long]("n_keys_a") == aKeys.length.toLong)
    assert(row.getAs[Long]("n_null_a") == (if (aKeys.contains(None)) 1L else 0L))
    assert(row.getAs[Long]("n_keys_b") == bKeys.length.toLong)
    assert(row.getAs[Long]("matched_eq") == eq)
    assert(row.getAs[Long]("matched_nullsafe") == ns)
    assert(ns == eq + 1, "fixture must exercise the null-null match")
  }

  test("leftAsOfForward attaches the next purchase at or after each event") {
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(max("event_id").as("purchase_id"),
        expr("max_by(CAST(round(value * 100) AS BIGINT), event_id)").as("p_cents"))
    val got = AsOfJoin
      .leftAsOfForward(
        Tables.events(spark, sfDir).select(col("event_id"), col("user_id"), col("ts")),
        purchases, "user_id", "ts", "p_user", "p_ts")
      .select(col("event_id"), col("purchase_id"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.get(r.fieldIndex("purchase_id"))).map(_.asInstanceOf[Long]))
      .toMap
    val all = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("s"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("s")))
    // brute-force: dedup purchases per (user, microsecond), keep max event_id
    val purByUser = all.filter(_._3 == "purchase")
      .groupBy(p => (p._2, p._4)).map { case (_, ps) => ps.maxBy(_._1) }
      .groupBy(_._2)
    for ((id, u, _, s) <- all) {
      val candidates = purByUser.getOrElse(u, Seq.empty).filter(_._4 >= s)
      val expected =
        if (candidates.isEmpty) None
        else Some(candidates.minBy(p => (p._4, -p._1))._1)
      assert(got(id) == expected, id)
    }
    assert(got.values.exists(_.isEmpty) && got.values.exists(_.nonEmpty),
      "both matched and unmatched events should exist")
  }
}
