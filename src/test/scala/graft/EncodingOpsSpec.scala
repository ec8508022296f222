package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Relational, Tables}
import graft.similarity.Similarity

/** Round-3 continuation: ROLLUP percentiles, rare-category collapse,
  * smoothed target encoding, embedding-norm stats — brute-force
  * recomputation on sf0.001.
  */
class EncodingOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pct(sorted: Seq[Double], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }

  test("rollupPercentiles: every stratum carries its own exact percentile") {
    val rows = Relational.rollupPercentiles(Tables.lineitem(spark, sfDir)).collect()
    val data = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"),
        r.getAs[Long]("c")))
    def check(row: org.apache.spark.sql.Row, subset: Seq[Long]): Unit = {
      val sorted = subset.map(_.toDouble).sorted
      assert(row.getAs[Long]("n") == subset.length.toLong)
      assert(row.getAs[Double]("p50_cents") == pct(sorted, 0.5))
      assert(row.getAs[Double]("p95_cents") == pct(sorted, 0.95))
    }
    var sawGrand = false
    for (row <- rows) {
      (Option(row.getAs[String]("l_returnflag")), Option(row.getAs[String]("l_linestatus"))) match {
        case (None, None) => sawGrand = true; check(row, data.map(_._3).toSeq)
        case (Some(f), None) => check(row, data.filter(_._1 == f).map(_._3).toSeq)
        case (Some(f), Some(s)) =>
          check(row, data.filter(d => d._1 == f && d._2 == s).map(_._3).toSeq)
        case (None, Some(_)) => fail("ROLLUP must not emit (null, status) rows")
      }
    }
    assert(sawGrand, "grand total row must exist")
  }

  test("rareCollapse folds sub-1% categories into 'other'") {
    val got = Relational.rareCollapse(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("final_cat") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_src_cats")))
      .toMap
    val cats = Tables.events(spark, sfDir)
      .select(expr("concat(event_type, '_', CAST(event_id % 13 AS STRING))").as("cat"))
      .collect()
      .map(_.getAs[String]("cat"))
      .groupBy(identity).map { case (c, rs) => c -> rs.length.toLong }
    val total = cats.values.sum
    val (rare, kept) = cats.partition { case (_, n) => n * 100 < total }
    val expected = kept.map { case (c, n) => c -> (n, 1L) } ++
      (if (rare.nonEmpty) Map("other" -> ((rare.values.sum, rare.size.toLong))) else Map.empty)
    assert(got == expected)
    assert(rare.nonEmpty, "fixture should produce at least one rare category")
    assert(kept.nonEmpty, "fixture should keep at least one category")
  }

  test("targetEncoding applies the m-estimate shrinkage") {
    val got = Relational.targetEncoding(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("category") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"), r.getAs[Double]("prior"),
          r.getAs[Double]("te")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(
        expr("concat(event_type, '_', CAST((CAST(ts AS LONG) div 3600) % 4 AS STRING))")
          .as("cat"),
        (col("value") > 100.0).cast("long").as("pos"))
      .collect()
      .map(r => (r.getAs[String]("cat"), r.getAs[Long]("pos")))
    val tn = rows.length.toLong
    val tp = rows.map(_._2).sum
    val prior = tp.toDouble / tn
    for ((c, rs) <- rows.groupBy(_._1)) {
      val n = rs.length.toLong
      val np = rs.map(_._2).sum
      val te = (np.toDouble + 10 * prior) / (n + 10).toDouble
      assert(got(c) == ((n, np, prior, te)), c)
      // shrinkage: te sits strictly between the raw rate and the prior
      val raw = np.toDouble / n
      if (raw != prior) {
        assert((te - raw).abs < (raw - prior).abs, c)
        assert((te > raw && te <= prior + 1e-15) || (te < raw && te >= prior - 1e-15), c)
      }
    }
  }

  test("normStats matches per-label norm percentiles") {
    val got = Similarity.normStats(Tables.embeddings(spark, sfDir)).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("min_norm"), r.getAs[Double]("med_norm"),
          r.getAs[Double]("max_norm")))
      .toMap
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map { r =>
        val e = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)
        (r.getAs[Int]("label"),
          math.sqrt(e.foldLeft(0.0)((acc, x) => acc + x * x)))
      }
    for ((l, rs) <- vecs.groupBy(_._1)) {
      val norms = rs.map(_._2).sorted
      val (n, mn, md, mx) = got(l)
      assert(n == norms.length.toLong, l)
      assert(mn == norms.min && mx == norms.max, l)
      assert(md == pct(norms, 0.5), l)
    }
  }
}
