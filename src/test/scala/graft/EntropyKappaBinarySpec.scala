package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Brute-force recomputation of the round-4 curation metrics on sf0.001:
  * Cohen's kappa, cross-source dup matrix, binary-quant ANN recall, and
  * per-source entropy/KL. Driver replication mirrors engine arithmetic
  * exactly (BigDecimal HALF_UP where the engines round).
  */
class EntropyKappaBinarySpec extends AnyFunSuite {
  import SparkTestSession._

  test("langIdKappa: matches the driver-side chance-corrected agreement") {
    val conf = TextAnalysis.langConfusion(Tables.documents(spark, sfDir))
      .collect()
      .map(r => (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang"), r.getAs[Long]("n")))
    val n = conf.map(_._3).sum
    val agree = conf.filter(c => c._1 == c._2).map(_._3).sum
    val rowS = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colS = conf.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val chance = rowS.keySet.intersect(colS.keySet).toSeq.map(l => rowS(l) * colS(l)).sum
    val row = TextAnalysis.langIdKappa(Tables.documents(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Long]("n_agree") == agree)
    assert(row.getAs[Double]("po") == agree.toDouble / n.toDouble)
    val kappa = (n.toDouble * agree.toDouble - chance.toDouble) /
      (n.toDouble * n.toDouble - chance.toDouble)
    assert(row.getAs[Double]("kappa") == kappa)
    assert(kappa >= -1.0 && kappa <= 1.0)
    // chance-corrected agreement is below raw agreement whenever marginals are imbalanced
    assert(kappa <= row.getAs[Double]("po") + 1e-12)
  }

  test("crossSourceDupMatrix: zero-filled |sources choose 2| frame with exact shared counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaa", "s1"), (2L, "bbb", "s1"), (3L, "aaa", "s2"),
      (4L, "ccc", "s2"), (5L, "aaa", "s3"), (6L, "ddd", "s3"), (7L, "bbb", "s3"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.crossSourceDupMatrix(docs).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Long]("uniq_a"), r.getAs[Long]("uniq_b"),
          r.getAs[Double]("jaccard"))).toMap
    assert(out.size == 3) // 3 sources -> 3 unordered pairs, zero cells included
    assert(out(("s1", "s2")) == ((1L, 2L, 2L, 1.0 / 3.0)))
    assert(out(("s1", "s3")) == ((2L, 2L, 3L, 2.0 / 3.0)))
    assert(out(("s2", "s3")) == ((1L, 2L, 3L, 0.25)))
    // fixture corpus: every pair present even when nothing is shared
    val fx = TextAnalysis.crossSourceDupMatrix(Tables.documents(spark, sfDir)).collect()
    val nSrc = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(fx.length == nSrc * (nSrc - 1) / 2)
    fx.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("binaryQuantRecall: hamming ranking matches a driver-side popcount rerank") {
    val k = 5
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def pack(v: Array[Double]): (Long, Long) = {
      var b0 = 0L; var b1 = 0L
      (0 until 32).foreach(i => if (v(i) > 0) b0 |= (1L << i))
      (0 until 32).foreach(i => if (v(32 + i) > 0) b1 |= (1L << i))
      (b0, b1)
    }
    val packed = vecs.view.mapValues(pack).toMap
    def hamTopK(q: Long): Seq[Long] =
      vecs.keys.filter(_ != q).toSeq
        .sortBy { v =>
          val (a0, a1) = packed(q); val (b0, b1) = packed(v)
          (java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1), v)
        }
        .take(k)
    def round3(x: Double): Double =
      new JBigDecimal(x).setScale(3, RoundingMode.HALF_UP).doubleValue()
    def cosTopK(q: Long): Seq[Long] = {
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      val qv = vecs(q); val qn = math.sqrt(dot(qv, qv))
      vecs.keys.filter(_ != q).toSeq
        .sortBy { v =>
          val c = round3(dot(qv, vecs(v)) / (qn * math.sqrt(dot(vecs(v), vecs(v)))))
          (-c, v)
        }
        .take(k)
    }
    val out = Similarity.binaryQuantRecall(Tables.embeddings(spark, sfDir), 10, k)
      .collect()
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))).toMap
    assert(out.size == 10)
    (0L until 10L).foreach { q =>
      val expected = (hamTopK(q).toSet intersect cosTopK(q).toSet).size.toLong
      val (nTrue, nHit, recall) = out(q)
      assert(nTrue == k.toLong)
      assert(nHit == expected, s"qid $q")
      assert(recall == expected.toDouble / k.toDouble)
    }
  }

  test("binaryRerankRecall: exact rerank of the shortlist never loses to direct binary ranking") {
    val direct = Similarity.binaryQuantRecall(Tables.embeddings(spark, sfDir), 10, 5)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("n_hit")).toMap
    val reranked = Similarity.binaryRerankRecall(Tables.embeddings(spark, sfDir), 10, 5, 20)
      .collect().map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))).toMap
    assert(reranked.size == 10)
    reranked.foreach { case (q, (nTrue, nHit, recall)) =>
      assert(nTrue == 5L)
      // a true top-5 neighbor inside the 20-shortlist always survives the
      // exact-cosine rerank (same rounded-cosine order as the ground truth)
      assert(nHit >= direct(q), s"qid $q: rerank $nHit < direct ${direct(q)}")
      assert(recall == nHit.toDouble / 5.0)
    }
  }

  test("splitLeakage: cells match a driver-side md5-bucket recomputation") {
    import graft.text.Dedup
    val pairs = Dedup.minhashNearDups(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    def split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 10 match {
        case b if b < 8 => "train"
        case 8 => "valid"
        case _ => "test"
      }
    }
    val expected = pairs
      .map { case (a, b) =>
        val (sa, sb) = (split(a), split(b))
        (if (sa <= sb) (sa, sb) else (sb, sa))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Dedup.splitLeakage(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Boolean]("crosses_split"))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (cell, (n, crosses)) =>
      assert(n == expected(cell), s"cell $cell")
      assert(crosses == (cell._1 != cell._2))
    }
  }

  test("filteredTopK: every neighbor carries the query's label and ranking matches brute force") {
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def round3(x: Double): Double =
      new JBigDecimal(x).setScale(3, RoundingMode.HALF_UP).doubleValue()
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val out = Similarity.filteredTopK(Tables.embeddings(spark, sfDir), 10, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("nid"), r.getAs[Long]("label"), r.getAs[Double]("cos_sim"))).toMap
    (0L until 10L).foreach { q =>
      val qv = vecs(q); val qn = math.sqrt(dot(qv, qv))
      val expected = vecs.keys
        .filter(v => v != q && labels(v) == labels(q)).toSeq
        .map(v => (v, round3(dot(qv, vecs(v)) / (qn * math.sqrt(dot(vecs(v), vecs(v)))))))
        .sortBy { case (v, c) => (-c, v) }
        .take(5)
      expected.zipWithIndex.foreach { case ((nid, cos), i) =>
        val (gotNid, gotLabel, gotCos) = out((q, i + 1L))
        assert(gotNid == nid, s"qid $q rank ${i + 1}")
        assert(gotLabel == labels(q).toLong)
        assert(gotCos == cos)
      }
    }
  }

  test("ivfPurity: exact recomputation from the native cell assignment") {
    import org.apache.spark.sql.functions.col
    val cs = Similarity.centroids(8, 64)
    val assigned = Tables.embeddings(spark, sfDir)
      .select(
        graft.functions.VectorFunctions
          .nearestCentroid(col("embedding").cast("array<double>"), cs)
          .cast("long").as("cell"),
        col("label").cast("long").as("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCell = assigned.groupBy(_._1)
    val out = Similarity.ivfPurity(Tables.embeddings(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("n_labels"),
          r.getAs[Long]("major_label"), r.getAs[Long]("n_major"),
          r.getAs[Double]("purity"))).toMap
    assert(out.keySet == byCell.keySet)
    assert(out.values.map(_._1).sum == assigned.length.toLong)
    byCell.foreach { case (cell, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val (majLabel, majN) = counts.toSeq.minBy { case (l, n) => (-n, l) }
      val (nVecs, nLabels, gotMaj, gotMajN, purity) = out(cell)
      assert(nVecs == rows.length.toLong)
      assert(nLabels == counts.size.toLong)
      assert(gotMaj == majLabel && gotMajN == majN, s"cell $cell")
      assert(purity == majN.toDouble / rows.length.toDouble)
      assert(purity > 0.0 && purity <= 1.0)
    }
  }

  test("sourceEntropy: micronat-exact entropy and non-negative KL vs corpus") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (s, t) => t.trim.split("\\s+").filter(_.nonEmpty).map(s -> _) }
    val sw = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cw = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def micro(x: Double): Long =
      new JBigDecimal(x).setScale(0, RoundingMode.HALF_UP).longValueExact()
    val bySource = sw.groupBy(_._1._1)
    val out = TextAnalysis.sourceEntropy(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
          r.getAs[Double]("entropy"), r.getAs[Double]("kl_vs_corpus"))).toMap
    val nTotal = toks.length.toLong
    bySource.foreach { case (src, m) =>
      val nS = m.values.sum
      val vocab = m.size.toLong
      val entMicro = m.map { case ((_, w), n) => micro(n * math.log(n.toDouble) * 1e6) }.sum
      val klMicro = m.map { case ((_, w), n) =>
        micro(n * (math.log(n.toDouble) - math.log(cw(w).toDouble)) * 1e6)
      }.sum
      val ent = math.log(nS.toDouble) - entMicro.toDouble / (1e6 * nS.toDouble)
      val kl = klMicro.toDouble / (1e6 * nS.toDouble) +
        math.log(nTotal.toDouble) - math.log(nS.toDouble)
      val (n, v, e, k) = out(src)
      assert(n == nS && v == vocab, src)
      assert(math.abs(e - ent) < 1e-9, s"$src entropy $e vs $ent")
      assert(math.abs(k - kl) < 1e-9, s"$src kl $k vs $kl")
      assert(e >= 0.0 && e <= math.log(vocab.toDouble) + 1e-9)
      assert(k >= -1e-6) // micronat quantization can dip a hair below zero
    }
  }

  test("docSurprisal: micronat-exact mean unigram surprisal per document") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (id, t) => id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }
    val cw = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTotal = perDoc.map(_._2.length.toLong).sum
    def micro(x: Double): Long =
      new JBigDecimal(x).setScale(0, RoundingMode.HALF_UP).longValueExact()
    val out = TextAnalysis.docSurprisal(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("surprisal"))).toMap
    assert(out.size == perDoc.length)
    perDoc.foreach { case (id, ws) =>
      val lpMicro = ws.map(w => micro(math.log(cw(w).toDouble) * 1e6)).sum
      val expect = math.log(nTotal.toDouble) - lpMicro.toDouble / (1e6 * ws.length.toDouble)
      val (n, s) = out(id)
      assert(n == ws.length.toLong, s"doc $id token count")
      assert(math.abs(s - expect) < 1e-9, s"doc $id surprisal $s vs $expect")
      assert(s >= -1e-6, s"doc $id negative surprisal") // -ln p is non-negative
    }
    // the score must actually discriminate: rare-token docs above common-token docs
    assert(out.values.map(_._2).toSet.size > 1, "surprisal is constant across the corpus")
  }
}
