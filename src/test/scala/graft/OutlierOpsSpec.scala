package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Relational, Tables}
import graft.similarity.Similarity
import graft.text.Dedup

/** Round-3 continuation: embedding outliers, lifecycle census, dedup
  * method agreement — brute-force recomputation on sf0.001.
  */
class OutlierOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Half-away-from-zero, matching Spark/DuckDB `round` on doubles
    * (math.round rounds half toward +inf, which diverges on negatives).
    */
  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("embedOutliers ranks by exact integer distance to quantized centroid") {
    val got = Similarity.embedOutliers(Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("vec_id"), r.getAs[Long]("dist2")))
      .toMap
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(v => rnd(v.toDouble * 1000)).toArray))
    val centroids = vecs.groupBy(_._2).map { case (l, vs) =>
      l -> (0 until 64).map { d =>
        val ms = vs.map(_._3(d))
        rnd(ms.sum.toDouble / ms.length)
      }.toArray
    }
    val expected = vecs
      .map { case (id, l, m) =>
        val c = centroids(l)
        (l, id, (0 until 64).map(d => (m(d) - c(d)) * (m(d) - c(d))).sum)
      }
      .groupBy(_._1)
      .flatMap { case (l, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, id, d2), i) => (l, i + 1L) -> ((id, d2)) }
          .toSeq
      }
    assert(got == expected)
  }

  test("lifecycleStages quadrant counts match the median splits") {
    val got = Relational.lifecycleStages(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users"))
      .toMap
    def pct(sorted: Seq[Long], q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) sorted(lo).toDouble
      else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
    }
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("s")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s")))
    val now = rows.map(_._2).max
    val perUser = rows.groupBy(_._1).toSeq.map { case (_, rs) =>
      (rs.length.toLong, (now - rs.map(_._2).max) / 86400)
    }
    val medR = pct(perUser.map(_._2).sorted, 0.5)
    val medF = pct(perUser.map(_._1).sorted, 0.5)
    val expected = perUser.map { case (f, r) =>
      if (r <= medR && f >= medF) "core"
      else if (r <= medR) "casual"
      else if (f >= medF) "lapsing"
      else "dormant"
    }.groupBy(identity).map { case (s, xs) => s -> xs.length.toLong }
    assert(got == expected)
    assert(got.values.sum == perUser.length.toLong)
  }

  test("dedupAgreement tallies the two detectors' pair sets") {
    val row = Dedup.dedupAgreement(Tables.documents(spark, sfDir)).collect().head
    val mh = Dedup.minhashNearDups(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val sh = Dedup.simhashNearDups(Tables.documents(spark, sfDir), 3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(row.getAs[Long]("n_pairs") == (mh union sh).size.toLong)
    assert(row.getAs[Long]("n_both") == (mh intersect sh).size.toLong)
    assert(row.getAs[Long]("n_minhash_only") == (mh diff sh).size.toLong)
    assert(row.getAs[Long]("n_simhash_only") == (sh diff mh).size.toLong)
    assert((mh union sh).nonEmpty, "detectors should find pairs on the fixture")
  }
}
