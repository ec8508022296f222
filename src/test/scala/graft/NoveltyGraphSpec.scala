package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Graph, Tables}
import graft.text.TextAnalysis

/** Round 4: local clustering coefficient + bigram novelty — brute-force
  * recomputation on sf0.001.
  */
class NoveltyGraphSpec extends AnyFunSuite {
  import SparkTestSession._

  test("clusteringCoefficient matches a direct adjacency-set recount") {
    val rows = Graph.clusteringCoefficient(Tables.lineitem(spark, sfDir)).collect()
    // rebuild the thresholded co-order graph
    val op = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val edgeCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    for ((_, parts) <- op; i <- parts.indices; j <- (i + 1) until parts.length)
      edgeCounts((parts(i), parts(j))) = edgeCounts.getOrElse((parts(i), parts(j)), 0) + 1
    val edges = edgeCounts.filter(_._2 >= 2).keys.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    for ((a, b) <- edges) { adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    val expected = adj.filter(_._2.size >= 2).map { case (v, ns) =>
      val nsv = ns.toSeq
      var tri = 0L
      for (i <- nsv.indices; j <- (i + 1) until nsv.length) {
        val (a, b) = (math.min(nsv(i), nsv(j)), math.max(nsv(i), nsv(j)))
        if (edges.contains((a, b))) tri += 1
      }
      (v, (ns.size.toLong, tri))
    }
    assert(rows.length == expected.size)
    for (r <- rows) {
      val (deg, tri) = expected(r.getAs[Long]("part"))
      assert(r.getAs[Long]("degree") == deg)
      assert(r.getAs[Long]("n_tri") == tri)
      assert(math.abs(r.getAs[Double]("coeff") - 2.0 * tri / (deg.toDouble * (deg - 1))) < 1e-12)
    }
  }

  test("ngramNovelty assigns each bigram to its first document exactly once") {
    val rows = TextAnalysis.ngramNovelty(Tables.documents(spark, sfDir)).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq))
      .filter(_._2.size >= 2)
    val docGrams = docs.map { case (id, toks) =>
      (id, toks.sliding(2).map(s => (s(0), s(1))).toSet)
    }.toMap
    val firstDoc = docGrams.toSeq
      .flatMap { case (id, gs) => gs.map(g => (g, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    assert(rows.length == docGrams.size)
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val gs = docGrams(id)
      val novel = gs.count(g => firstDoc(g) == id).toLong
      assert(r.getAs[Long]("n_grams") == gs.size.toLong)
      assert(r.getAs[Long]("n_novel") == novel)
      assert(math.abs(r.getAs[Double]("novelty") - novel.toDouble / gs.size) < 1e-12)
    }
    // every bigram is novel in exactly one doc: totals line up
    assert(rows.map(_.getAs[Long]("n_novel")).sum == firstDoc.size.toLong)
  }

  test("adjacentPairs is bit-identical to the HOF bigram spelling it replaced") {
    // the r10 spelling swap (arrays_zip of one-off slices vs the
    // interpreted transform/sequence/element_at lambda) — pin equality on
    // the edges: minimal 2-token, repeated tokens, collapsed whitespace
    // handled upstream by tokens(), and non-BMP surrogate-pair tokens
    import spark.implicits._
    val texts = Seq(
      "a b",
      "x x x x",
      "the quick brown fox jumps over the lazy dog",
      "😀 emoji 😀😀 tokens 😀",
      ('a' to 'z').mkString(" ") * 3)
    val df = texts.toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .withColumn("hof", expr(
        """transform(sequence(1, size(t) - 1),
           i -> struct(element_at(t, i) AS w1, element_at(t, CAST(i + 1 AS INT)) AS w2))"""))
      .withColumn("zip", TextAnalysis.adjacentPairs(col("t")))
    for (r <- df.select("hof", "zip").collect()) {
      val hof = r.getSeq[org.apache.spark.sql.Row](0).map(x => (x.getString(0), x.getString(1)))
      val zip = r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getString(1)))
      assert(hof == zip)
    }
  }
}
