package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Relational, Tables}

/** Round-3 continuation: join-skew report, survivorship merge,
  * order-independent table checksum, partition-balance report —
  * brute-force recomputation on sf0.001.
  */
class DiagnosticsOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pct(sorted: Seq[Long], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo).toDouble
    else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }

  test("skewReport profiles both join keys' frequency distributions") {
    val got = Relational
      .skewReport(Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir))
      .collect()
      .map(r => r.getAs[String]("key_col") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("max_freq"), r.getAs[Double]("p50_freq"),
          r.getAs[Double]("p99_freq"), r.getAs[Double]("skew")))
      .toMap
    def freqs(vals: Seq[Long]): Seq[Long] =
      vals.groupBy(identity).values.map(_.length.toLong).toSeq.sorted
    val liKeys = freqs(Tables.lineitem(spark, sfDir).select("l_orderkey").collect()
      .map(_.getAs[Long]("l_orderkey")))
    val orKeys = freqs(Tables.orders(spark, sfDir).select("o_custkey").collect()
      .map(_.getAs[Long]("o_custkey")))
    for ((name, fs) <- Seq("lineitem.l_orderkey" -> liKeys, "orders.o_custkey" -> orKeys)) {
      val (n, mx, p50, p99, skew) = got(name)
      assert(n == fs.length.toLong, name)
      assert(mx == fs.max, name)
      assert(p50 == pct(fs, 0.5) && p99 == pct(fs, 0.99), name)
      assert(skew == mx.toDouble / p50, name)
    }
  }

  test("survivorship keeps the latest event per cell with cell aggregates") {
    val got = Relational.survivorship(Tables.events(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("survivor_id"), r.getAs[Long]("n_merged"), r.getAs[Long]("max_cents")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("CAST(ts AS LONG)").as("s"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("event_id"), r.getAs[Long]("s"), r.getAs[Long]("c")))
    val expected = rows.groupBy(r => (r._1, r._2, r._4 / 86400)).map { case (k, rs) =>
      val survivor = rs.minBy(r => (-r._4, r._3))._3
      k -> (survivor, rs.length.toLong, rs.map(_._5).max)
    }
    assert(got == expected)
    assert(expected.values.exists(_._2 > 1L), "some cell should actually merge rows")
  }

  test("tableChecksum is invariant under row order and sensitive to content") {
    val li = Tables.lineitem(spark, sfDir)
    val base = Relational.tableChecksum(li).collect().head
    val shuffled = Relational.tableChecksum(li.orderBy(rand(42))).collect().head
    assert(base == shuffled, "checksum must not depend on row order")
    val mutated = Relational.tableChecksum(
      li.withColumn("l_returnflag", lit("X"))).collect().head
    assert(base != mutated, "checksum must change when content changes")
    assert(base.getAs[Long]("n_rows") == li.count())
    assert(base.getAs[Long]("min_word") >= 0L && base.getAs[Long]("max_word") <= 0xFFFFL)
  }

  test("partitionBalance buckets cover the corpus with plausible balance") {
    val got = Relational.partitionBalance(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("bucket") -> (r.getAs[Long]("n"), r.getAs[Double]("balance")))
      .toMap
    val users = Tables.events(spark, sfDir).select("user_id").collect()
      .map(_.getAs[Long]("user_id"))
    // the repo's md5 key hash (the multiplicative spelling was a
    // relabeled user_id%32 histogram — an odd multiplier is a bijection
    // mod 32 — that could never detect imbalance)
    def md5Bucket(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 32
    }
    val expected = users.groupBy(md5Bucket)
      .map { case (b, us) => b -> us.length.toLong }
    assert(got.view.mapValues(_._1).toMap == expected)
    val total = users.length.toLong
    for ((b, (n, bal)) <- got)
      assert(bal == n.toDouble * 32 / total, b)
    assert(got.values.map(_._1).sum == total)
  }
}
