package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Graph, Tables}
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Round-3 continuation batch: Simpson diversity, synthetic-sentence
  * readability, lagged cross-correlation, bounded BFS reach, and the
  * k-means assignment step — brute-force recomputation on sf0.001.
  */
class DiversityOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("simpsonDiversity equals the two-draw collision complement") {
    val got = TextAnalysis.simpsonDiversity(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"), r.getAs[Double]("simpson")))
      .toMap
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    for ((src, rows) <- docs.groupBy(_._1)) {
      val toks = rows.flatMap(_._2.trim.split("\\s+"))
      val counts = toks.groupBy(identity).map(_._2.length.toLong)
      val n = toks.length.toLong
      val expected = 1.0 - counts.map(c => c * (c - 1)).sum.toDouble / (n.toDouble * (n - 1).toDouble)
      val (types, tokens, simpson) = got(src)
      assert(types == counts.size.toLong, src)
      assert(tokens == n, src)
      assert(math.abs(simpson - expected) < 1e-12, src)
      assert(simpson > 0.0 && simpson < 1.0, src)
    }
  }

  test("readability counts words, long words, vowel groups and applies the Flesch form") {
    val got = TextAnalysis.readability(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_long_words"),
          r.getAs[Long]("n_syllables"), r.getAs[Long]("n_sentences"), r.getAs[Double]("flesch")))
      .toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(docs.nonEmpty)
    for ((id, text) <- docs) {
      val words = text.trim.split("\\s+")
      val syll = "[aeiouy]+".r.findAllIn(text).length.toLong
      val sentences = (words.length + 11) / 12
      val flesch = 206.835 - 1.015 * (words.length.toDouble / sentences) -
        84.6 * (syll.toDouble / words.length)
      val (gw, gl, gs, gsent, gf) = got(id)
      assert(gw == words.length.toLong, id)
      assert(gl == words.count(_.length >= 6).toLong, id)
      assert(gs == syll, id)
      assert(gsent == sentences.toLong, id)
      assert(gf == flesch, id)
    }
  }

  test("crossCorr lag 0 equals the direct hourly revenue/count correlation") {
    val got = Analytics.crossCorr(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("lag") -> (r.getAs[Long]("n_pairs"), r.getAs[Double]("corr_xy")))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    val hourly = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS LONG) div 3600").as("h"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("h"), r.getAs[Long]("c")))
      .groupBy(_._1)
      .map { case (h, rs) => h -> (rs.map(_._2).sum, rs.length.toLong) }
    def pearson(pairs: Seq[(Long, Long)]): Double = {
      val n = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val (vx, vy) = (sxx / n - (sx / n) * (sx / n), syy / n - (sy / n) * (sy / n))
      (sxy / n - (sx / n) * (sy / n)) / math.sqrt(vx * vy)
    }
    for (lag <- 0L to 3L) {
      // x = count at hour t (the EARLIER series), y = revenue at t+lag —
      // the pairing that answers "does activity lead spend by lag hours"
      val pairs = hourly.toSeq.flatMap { case (h, (_, cnt)) =>
        hourly.get(h + lag).map { case (cents2, _) => (cnt, cents2) }
      }
      assert(got(lag)._1 == pairs.length.toLong, s"lag $lag")
      assert(math.abs(got(lag)._2 - pearson(pairs)) < 1e-9, s"lag $lag")
    }
  }

  test("bfsReach hop distances match a driver-side BFS") {
    val got = Graph.bfsReach(Tables.lineitem(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("hop"))
      .toMap
    // rebuild the thresholded co-order graph by brute force
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
      .distinct
    val pairCounts = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (pairCounts ++ pairCounts.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val degrees = adj.map { case (k, vs) => k -> vs.size }
    val seed = degrees.toSeq.sortBy { case (n, d) => (-d, n) }.head._1
    var dist = Map(seed -> 0L)
    var frontier = Set(seed)
    for (h <- 1L to 3L) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> h)
      frontier = next
    }
    assert(got == dist)
    assert(got.values.exists(_ == 3L), "BFS should reach hop 3 on the fixture graph")
  }

  test("kmeansAssign picks the max-cosine seed and reports exact integer tallies") {
    val got = Similarity.kmeansAssign(Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Int]("label")) ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("sim_milli_sum")))
      .toMap
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val seeds = vecs.filter(_._1 < 4)
    val assigned = vecs.map { case (id, label, e) =>
      val best = seeds
        .map { case (sid, _, se) =>
          val cos = BigDecimal(dot(se, e) / (math.sqrt(dot(se, se)) * math.sqrt(dot(e, e))))
            .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
          (sid, cos)
        }
        .minBy { case (sid, cos) => (-cos, sid) }
      (best._1, label, math.round(best._2 * 1000))
    }
    val expected = assigned.groupBy(a => (a._1, a._2)).map { case (k, rs) =>
      k -> (rs.length.toLong, rs.map(_._3).sum)
    }
    assert(got == expected)
    assert(got.keys.map(_._1).toSet.size > 1, "multiple clusters should be populated")
  }
}
