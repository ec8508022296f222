package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Relational, Tables}

/** SQL-string surface parity — the spark.sql text must agree with the
  * DataFrame spelling on sf0.001.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  import SparkTestSession._

  test("sqlQ1 equals a DataFrame-API recomputation of the same aggregates") {
    val df = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        org.apache.spark.sql.functions.expr("sum(CAST(round(l_quantity) AS BIGINT))").as("sum_qty"),
        org.apache.spark.sql.functions.expr("sum(CAST(round(l_extendedprice * 100) AS BIGINT))")
          .as("sum_base_cents"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("count_order"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val rows = Relational.sqlQ1(spark, Tables.lineitem(spark, sfDir)).collect()
    assert(rows.length == df.size)
    for (r <- rows) {
      val k = (r.getString(0), r.getString(1))
      val (q, b, c) = df(k)
      assert(r.getAs[Long]("sum_qty") == q, s"$k qty")
      assert(r.getAs[Long]("sum_base_cents") == b, s"$k base")
      assert(r.getAs[Long]("count_order") == c, s"$k count")
    }
  }

  test("sqlNationYearShare year shares sum to one and ranks are dense per year") {
    val rows = Relational.sqlNationYearShare(
      spark, Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir))
      .collect()
    assert(rows.nonEmpty)
    val byYear = rows.groupBy(_.getAs[Long]("o_year"))
    for ((y, rs) <- byYear) {
      assert(math.abs(rs.map(_.getAs[Double]("year_share")).sum - 1.0) < 1e-9, s"year $y")
      val ranks = rs.map(_.getAs[Long]("year_rank")).sorted.toList
      assert(ranks == (1L to rs.length.toLong).toList, s"year $y ranks")
    }
  }
}
