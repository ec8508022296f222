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

  test("cdcBoundaries kernel is bit-identical to the HOF spelling it replaced") {
    // the r10 spelling swap: graft_cdc_boundaries (codegen kernel) vs the
    // interpreted filter/sequence/element_at lambda — must agree on every
    // domain edge the extreme sweep exercises: empty, below the 8-cp
    // window, exactly 8, surrogate pairs (codepoint positions, not UTF-16
    // units), and long mixed text
    val weights = (0 to 7).map(k => math.pow(31.0, k).toLong)
    val rolling = (0 to 7)
      .map(k => s"element_at(ch, CAST(p - $k AS INT)) * ${weights(k)}L")
      .mkString(" + ")
    val texts = Seq(
      "",
      "short",
      "exactly8",
      "a" * 64,
      "the quick brown fox jumps over the lazy dog " * 20,
      "emoji 😀 mixed 😀😀 tail padding to cross the window",
      "😀" * 16,
      (0 until 256).map(i => ('a' + i % 26).toChar).mkString)
    import spark.implicits._
    val df = texts.toDF("text")
      .withColumn("ch", org.apache.spark.sql.functions.expr(
        "transform(split(text, ''), c -> ascii(c))"))
      .withColumn("len", org.apache.spark.sql.functions.expr("CAST(length(text) AS INT)"))
      .withColumn("hof", org.apache.spark.sql.functions.expr(
        s"CASE WHEN len < 8 THEN CAST(array() AS ARRAY<INT>) ELSE filter(sequence(8, len), p -> ($rolling) % 64 = 0) END"))
      .withColumn("kernel", graft.functions.VectorFunctions.cdcBoundaries(
        org.apache.spark.sql.functions.col("text")))
    for (row <- df.select("text", "hof", "kernel").collect()) {
      assert(
        row.getSeq[Int](1) == row.getSeq[Int](2),
        s"boundary mismatch on ${row.getString(0).take(40)}")
    }
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
