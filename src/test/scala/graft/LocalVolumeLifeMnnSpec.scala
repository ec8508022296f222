package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}
import graft.similarity.Similarity

/** Round-3 continuation: TPC-H Q5-shaped local-supplier volume, mutual
  * nearest neighbors, discrete-time life table — brute-force recomputation
  * on sf0.001.
  */
class LocalVolumeLifeMnnSpec extends AnyFunSuite {
  import SparkTestSession._

  test("localSupplierVolume matches a collect-side recomputation") {
    val got = Relational.localSupplierVolume(
      Tables.customer(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir), Tables.supplier(spark, sfDir),
      Tables.nation(spark, sfDir), Tables.region(spark, sfDir),
      "ASIA", "1996-01-01", "1997-01-01").collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("n_items"), r.getAs[Double]("revenue")))
      .toMap

    val nations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .collect().map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    val custNation = Tables.customer(spark, sfDir).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Int]("c_nationkey")).toMap
    val suppNation = Tables.supplier(spark, sfDir).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Int]("s_nationkey")).toMap
    val ordCust = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .collect().map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("o_custkey")).toMap
    val expected = Tables.lineitem(spark, sfDir).collect().toSeq
      .flatMap { r =>
        for {
          ck <- ordCust.get(r.getAs[Long]("l_orderkey"))
          cn = custNation(ck)
          sn = suppNation(r.getAs[Long]("l_suppkey"))
          if cn == sn
          name <- nations.get(cn)
        } yield {
          val cents = math.round(r.getAs[Double]("l_extendedprice") * 100)
          val pct = math.round(r.getAs[Double]("l_discount") * 100)
          name -> cents * (100 - pct)
        }
      }
      .groupBy(_._1)
      .map { case (n, xs) => n -> (xs.size.toLong, xs.map(_._2).sum / 10000.0) }
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("mutualTopNeighbors keeps exactly the reciprocal top-1 pairs") {
    val got = Similarity.mutualTopNeighbors(Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("va"), r.getAs[Long]("vb")) ->
        (r.getAs[Int]("label"), r.getAs[Double]("cos_sim")))
      .toMap

    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = (0 until a.length).foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val na = math.sqrt((0 until a.length).foldLeft(0.0)((acc, i) => acc + a(i) * a(i)))
      val nb = math.sqrt((0 until b.length).foldLeft(0.0)((acc, i) => acc + b(i) * b(i)))
      BigDecimal(d / (na * nb)).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val top1 = vecs.map { case (id, lab, v) =>
      val best = vecs
        .filter(o => o._2 == lab && o._1 != id)
        .map(o => (cos(v, o._3), o._1))
        .minBy { case (s, oid) => (-s, oid) }
      id -> best
    }.toMap
    val expected = top1.collect {
      case (a, (s, b)) if a < b && top1(b)._2 == a => (a, b) -> s
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, s) =>
      assert(math.abs(got(k)._2 - s) < 1e-9, s"pair $k")
    }
    assert(got.nonEmpty)
  }

  test("lifeTable at-risk counts telescope and hazards are d/n") {
    val rows = Analytics.lifeTable(Tables.events(spark, sfDir))
      .orderBy("dur_day").collect()
    val users = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(min(col("ts").cast("long")).as("f"), max(col("ts").cast("long")).as("l"))
      .collect().map(r => (r.getAs[Long]("f"), r.getAs[Long]("l")))
    val maxS = users.map(_._2).max
    val durs = users.map { case (f, l) => ((l - f) / 86400, l >= maxS - 86400) }
    // telescoping: n_risk(day) = users whose duration reached that day
    rows.foreach { r =>
      val day = r.getAs[Long]("dur_day")
      assert(r.getAs[Long]("n_risk") == durs.count(_._1 >= day), s"day $day")
      assert(r.getAs[Long]("d_churn") == durs.count(d => d._1 == day && !d._2))
      assert(r.getAs[Long]("c_censored") == durs.count(d => d._1 == day && d._2))
      assert(math.abs(r.getAs[Double]("hazard") -
        r.getAs[Long]("d_churn").toDouble / r.getAs[Long]("n_risk")) < 1e-15)
    }
    // every user exits exactly once
    assert(rows.map(r => r.getAs[Long]("d_churn") + r.getAs[Long]("c_censored")).sum
      == users.length)
    assert(rows.nonEmpty)
  }
}
