package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.text.{Dedup, TextAnalysis}

/** Curation planning reports — brute-force recomputation on sf0.001. */
class CurationReportsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sfDir)
    .select("doc_id", "source", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def nToks(text: String): Long =
    text.trim.split("\\s+").count(_.nonEmpty).toLong

  test("dedupSavings: per-source token budgets before/after exact dedup") {
    val out = Dedup.dedupSavings(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_total"),
          r.getAs[Long]("n_docs_kept"), r.getAs[Long]("tokens_kept"))).toMap
    val before = docs.groupBy(_._2).view
      .mapValues(g => (g.length.toLong, g.map(d => nToks(d._3)).sum)).toMap
    val keepers = docs.groupBy(_._3).values.map(_.minBy(_._1)).toSeq
    val after = keepers.groupBy(_._2).view
      .mapValues(g => (g.size.toLong, g.map(d => nToks(d._3)).sum)).toMap
    assert(out.keySet == before.keySet)
    out.foreach { case (src, (nd, tt, ndk, tk)) =>
      assert((nd, tt) == before(src), s"before $src")
      assert((ndk, tk) == after.getOrElse(src, (0L, 0L)), s"after $src")
      assert(ndk <= nd && tk <= tt)
    }
    // global invariant: kept docs across sources == distinct texts
    assert(out.values.map(_._3).sum == docs.map(_._3).distinct.length.toLong)
  }

  test("matryoshkaRecall: bounded, 64-dim self-recall is 1, and truncation matches brute force") {
    val out = graft.similarity.Similarity
      .matryoshkaRecall(Tables.embeddings(spark, sfDir), numQueries = 5, k = 3, dims = Seq(16, 64))
      .collect().map(r => r.getAs[Long]("dims_kept") ->
        (r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))).toMap
    // the full-dim "truncation" must reproduce the ground truth exactly
    assert(out(64L) == ((15L, 1.0)))
    val (h16, r16) = out(16L)
    assert(h16 >= 0L && h16 <= 15L && r16 >= 0.0 && r16 <= 1.0)
    // brute-force the 16-dim recall on the driver
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(CAST(embedding AS ARRAY<DOUBLE>), v -> CAST(round(v * 1000) AS BIGINT)) AS m")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d2(a: Array[Long], b: Array[Long], d: Int): Long =
      (0 until d).map(i => { val x = a(i) - b(i); x * x }).sum
    def topk(qid: Long, d: Int): Set[Long] =
      vecs.keys.filter(_ != qid).toSeq
        .sortBy(v => (d2(vecs(qid), vecs(v), d), v)).take(3).toSet
    val expected = (0L until 5L).map(q => (topk(q, 16) intersect topk(q, 64)).size).sum
    assert(h16 == expected.toLong)
  }

  test("lengthFilterSweep: each threshold's survivors match a direct filter") {
    val r = TextAnalysis.lengthFilterSweep(Tables.documents(spark, sfDir)).head()
    val lens = docs.map(d => nToks(d._3))
    assert(r.getAs[Long]("n_docs") == lens.length.toLong)
    assert(r.getAs[Long]("tokens_total") == lens.sum)
    Seq(10, 25, 50, 100, 200).foreach { th =>
      val kept = lens.filter(_ >= th)
      assert(r.getAs[Long](s"docs_ge_$th") == kept.length.toLong, s"docs_ge_$th")
      assert(r.getAs[Long](s"toks_ge_$th") == kept.sum, s"toks_ge_$th")
    }
    // thresholds are monotone
    val dcols = Seq(10, 25, 50, 100, 200).map(th => r.getAs[Long](s"docs_ge_$th"))
    assert(dcols.zip(dcols.tail).forall { case (a, b) => a >= b })
  }
}
