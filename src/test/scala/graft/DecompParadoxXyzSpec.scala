package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Classical decomposition, Simpson screen, ABC-XYZ matrix — driver
  * recomputation on sf0.001.
  */
class DecompParadoxXyzSpec extends AnyFunSuite {
  import SparkTestSession._

  test("classicalDecomposition trend/seasonal/remainder reconstruct") {
    val ds = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS LONG) div 86400 AS d", "CAST(round(value * 100) AS BIGINT) AS c")
      .groupBy("d").sum("c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = ds.length
    val rows = Analytics.classicalDecomposition(Tables.events(spark, sfDir))
      .orderBy("day_epoch").collect()
    assert(rows.length == n - 6)
    val t7 = (3 until n - 3).map(i => (ds(i)._1, ds.slice(i - 3, i + 4).map(_._2).sum)).toMap
    val detr = (3 until n - 3).map(i => (ds(i)._1, 7 * ds(i)._2 - t7(ds(i)._1)))
    val sIdx = detr.groupBy(_._1 % 7).view
      .mapValues(vs => vs.map(_._2).sum.toDouble / vs.length / 7.0).toMap
    for (row <- rows) {
      val d = row.getAs[Long]("day_epoch")
      assert(row.getAs[Long]("t7") == t7(d), s"day $d trend sum")
      assert(math.abs(row.getAs[Double]("seasonal_cents") - sIdx(d % 7)) < 1e-9)
      // y = trend + seasonal + remainder by construction
      val recon = row.getAs[Double]("trend_cents") + row.getAs[Double]("seasonal_cents") +
        row.getAs[Double]("remainder_cents")
      assert(math.abs(recon - row.getAs[Long]("y_cents")) < 1e-6)
    }
  }

  test("simpsonParadox signs come from exact cross-multiplication") {
    val row = Analytics.simpsonParadox(
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir), Tables.nation(spark, sfDir))
      .collect().head
    assert(row.getAs[Long]("n_strata") > 0)
    assert(row.getAs[Long]("n_flipped") >= 0 && row.getAs[Long]("n_flipped") <= row.getAs[Long]("n_strata"))
    assert(Set(-1L, 0L, 1L)(row.getAs[Long]("overall_sign")))
    // driver recomputation of the flip count
    val nations = Tables.nation(spark, sfDir).collect().map(r => (r.getInt(0), r.getString(1))).toMap
    val cust = Tables.customer(spark, sfDir).collect()
      .map(r => (r.getLong(0), (nations(r.getInt(2)), r.getString(4)))).toMap
    val strata = scala.collection.mutable.Map.empty[String, Array[Long]]
    for (r <- Tables.orders(spark, sfDir)
        .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS c").collect()) {
      val (nat, seg) = cust(r.getLong(0))
      if (seg == "BUILDING" || seg == "MACHINERY") {
        val arr = strata.getOrElseUpdate(nat, Array(0L, 0L, 0L, 0L))
        if (seg == "BUILDING") { arr(0) += r.getLong(1); arr(1) += 1 }
        else { arr(2) += r.getLong(1); arr(3) += 1 }
      }
    }
    val valid = strata.values.filter(a => a(1) > 0 && a(3) > 0).toSeq
    val ov = {
      val ta = valid.map(_(0)).sum; val tna = valid.map(_(1)).sum
      val tb = valid.map(_(2)).sum; val tnb = valid.map(_(3)).sum
      java.lang.Long.signum(ta * tnb - tb * tna).toLong
    }
    val flips = valid.count(a => java.lang.Long.signum(a(0) * a(3) - a(2) * a(1)) * ov < 0).toLong
    assert(row.getAs[Long]("overall_sign") == ov)
    assert(row.getAs[Long]("n_strata") == valid.size.toLong)
    assert(row.getAs[Long]("n_flipped") == flips)
  }

  test("abcXyzMatrix covers all parts once with consistent shares") {
    val rows = Relational.abcXyzMatrix(Tables.lineitem(spark, sfDir)).collect()
    val nParts = Tables.lineitem(spark, sfDir).selectExpr("l_partkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == nParts)
    assert(math.abs(rows.map(_.getAs[Double]("rev_share")).sum - 1.0) < 1e-9)
    val classes = rows.map(r => (r.getString(0), r.getString(1)))
    assert(classes.distinct.length == classes.length)
    assert(classes.forall { case (a, x) => Set("A", "B", "C")(a) && Set("X", "Y", "Z")(x) })
  }
}
