package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Tables}

/** Poisson-bootstrap median, CDC chunking, Merkle digest — driver
  * recomputation on sf0.001.
  */
class BootCdcMerkleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("poissonBootstrapMedian emits the weighted lower-median per replica") {
    val rows = Analytics.poissonBootstrapMedian(Tables.events(spark, sfDir))
      .orderBy("resample").collect()
    assert(rows.length == 8)
    val events = Tables.events(spark, sfDir)
      .selectExpr("event_id", "CAST(round(value * 100) AS BIGINT) AS x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def mult(id: Long, r: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}_$r".getBytes).take(4).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex, 16)
      val idx = Analytics.PoissonThresholds.indexWhere(h < _)
      if (idx < 0) Analytics.PoissonThresholds.length.toLong else idx.toLong
    }
    for (row <- rows) {
      val r = row.getAs[Long]("resample")
      val weighted = events.map { case (id, x) => (x, mult(id, r)) }
        .filter(_._2 > 0)
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val n = weighted.map(_._2).sum
      val target = (n + 1) / 2
      var cum = 0L
      val med = weighted.find { case (_, w) => cum += w; cum >= target }.get._1
      assert(row.getAs[Long]("n_eff") == n, s"replica $r n")
      assert(row.getAs[Long]("median_cents") == med, s"replica $r median")
    }
  }

  test("cdcChunking reproduces boundary positions and dedup counts") {
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val weights = (0 to 7).map(k => math.pow(31.0, k).toLong)
    var total = 0L
    var chars = 0L
    val hashes = scala.collection.mutable.Set.empty[String]
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    for ((_, text) <- docs) {
      val ch = text.map(_.toInt)
      val len = ch.length
      val bl =
        if (len < 8) Seq.empty[Int]
        else (8 to len).filter { p =>
          (0 to 7).map(k => ch(p - k - 1).toLong * weights(k)).sum % 64 == 0
        }
      val starts = 1 +: bl.map(_ + 1)
      val ends = bl :+ len
      for ((s, e) <- starts.zip(ends) if e >= s) {
        total += 1
        chars += (e - s + 1)
        hashes += md5(text.substring(s - 1, e))
      }
    }
    val row = Analytics.cdcChunking(Tables.documents(spark, sfDir)).collect().head
    assert(row.getAs[Long]("n_docs") == docs.length.toLong)
    assert(row.getAs[Long]("total_chunks") == total)
    assert(row.getAs[Long]("distinct_chunks") == hashes.size.toLong)
    assert(row.getAs[Long]("total_chars") == chars)
  }

  test("merkleDigest buckets reproduce and the root covers all buckets") {
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "md5(text) AS h").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val buckets = docs.groupBy(_._1 % 16).view
      .mapValues(ds => (ds.length.toLong, md5(ds.map(_._2).sorted.mkString("")))).toMap
    val root = md5(buckets.toSeq.map(_._2._2).sorted.mkString(""))
    val rows = Analytics.merkleDigest(Tables.documents(spark, sfDir)).collect()
    assert(rows.length == buckets.size)
    for (row <- rows) {
      val b = row.getAs[Long]("bucket")
      assert(row.getAs[Long]("n_docs") == buckets(b)._1)
      assert(row.getAs[String]("bucket_hash") == buckets(b)._2, s"bucket $b")
      assert(row.getAs[String]("root_hash") == root)
    }
  }
}
