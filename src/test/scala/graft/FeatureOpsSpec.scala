package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Relational, Tables}
import graft.similarity.Similarity
import graft.text.Dedup

/** Round-3 continuation: MRR retrieval eval, audience overlap, one-pass
  * user features, LSH bucket-size tuning report — brute-force
  * recomputation on sf0.001.
  */
class FeatureOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mrrEval aggregates 60/first_matching_rank over the exact top-5") {
    val row = Similarity.mrrEval(Tables.embeddings(spark, sfDir)).collect().head
    val topk = Similarity.cosineTopK(Tables.embeddings(spark, sfDir), 10, 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"), r.getAs[Long]("nid")))
    val labels = Tables.embeddings(spark, sfDir).select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val firstRanks = topk
      .filter { case (q, _, n) => labels(q) == labels(n) }
      .groupBy(_._1)
      .map { case (_, rs) => rs.map(_._2).min }
    val rr60 = firstRanks.map(60L / _).sum
    assert(row.getAs[Long]("n_queries") == 10L)
    assert(row.getAs[Long]("n_matched") == firstRanks.size.toLong)
    assert(row.getAs[Long]("rr60_sum") == rr60)
    assert(row.getAs[Double]("mrr") == rr60.toDouble / (60.0 * 10))
    assert(firstRanks.nonEmpty, "some query should find a same-label neighbor")
  }

  test("audienceOverlap computes pairwise Jaccard of user sets") {
    val got = Relational.audienceOverlap(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_common"),
          r.getAs[Double]("jaccard")))
      .toMap
    val sets = Tables.events(spark, sfDir).select("event_type", "user_id").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).toSet }
    val types = sets.keys.toSeq.sorted
    val expectedKeys = (for {
      a <- types; b <- types if a < b
      if (sets(a) intersect sets(b)).nonEmpty
    } yield (a, b)).toSet
    assert(got.keySet == expectedKeys)
    for (((a, b), (na, nb, common, j)) <- got) {
      val inter = (sets(a) intersect sets(b)).size.toLong
      assert(na == sets(a).size.toLong && nb == sets(b).size.toLong, (a, b))
      assert(common == inter, (a, b))
      assert(j == inter.toDouble / (sets(a) union sets(b)).size, (a, b))
    }
  }

  test("userFeatures assembles all per-user aggregates in one pass") {
    val got = Relational.userFeatures(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("CAST(ts AS LONG)").as("s"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("s"), r.getAs[Long]("c")))
    for ((u, es) <- rows.groupBy(_._1)) {
      val r = got(u)
      assert(r.getAs[Long]("n_events") == es.length.toLong, u)
      assert(r.getAs[Long]("n_types") == es.map(_._2).distinct.length.toLong, u)
      assert(r.getAs[Long]("active_days") == es.map(_._3 / 86400).distinct.length.toLong, u)
      assert(r.getAs[Long]("first_seen") == es.map(_._3).min, u)
      assert(r.getAs[Long]("last_seen") == es.map(_._3).max, u)
      assert(r.getAs[Long]("spend_cents") == es.map(_._4).sum, u)
      val np = es.count(_._2 == "purchase").toLong
      assert(r.getAs[Long]("n_purchases") == np, u)
      assert(r.getAs[Long]("tenure_days") == (es.map(_._3).max - es.map(_._3).min) / 86400, u)
      assert(r.getAs[Double]("purchase_ratio") == np.toDouble / es.length, u)
    }
  }

  test("lshBucketStats per-band tallies match the signature banding") {
    val got = Dedup.lshBucketStats(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("band") ->
        (r.getAs[Long]("n_buckets"), r.getAs[Long]("n_singletons"),
          r.getAs[Long]("max_bucket"), r.getAs[Long]("cand_pairs")))
      .toMap
    assert(got.keySet == (0L to 7L).toSet)
    val sigs = Dedup.minhashSignatures(Tables.documents(spark, sfDir), 32).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getSeq[Long](r.fieldIndex("sig")).toVector))
    val nDocs = sigs.length.toLong
    for (band <- 0 until 8) {
      val buckets = sigs
        .map { case (_, sig) => sig.slice(band * 4, band * 4 + 4) }
        .groupBy(identity).values.map(_.length.toLong).toSeq
      val (nb, ns, mx, cp) = got(band.toLong)
      assert(nb == buckets.length.toLong, band)
      assert(buckets.sum == nDocs, band)
      assert(ns == buckets.count(_ == 1L).toLong, band)
      assert(mx == buckets.max, band)
      assert(cp == buckets.map(s => s * (s - 1) / 2).sum, band)
    }
    // the whole point of the report: candidate volume is far below n^2/2
    assert(got.values.map(_._4).sum < nDocs * (nDocs - 1) / 2)
  }
}
