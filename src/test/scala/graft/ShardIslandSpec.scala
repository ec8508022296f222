package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Rendezvous sharding, vnode balance, activity islands — driver
  * recomputation on sf0.001.
  */
class ShardIslandSpec extends AnyFunSuite {
  import SparkTestSession._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  test("rendezvousShards moves docs only into the new shard") {
    val ids = Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0))
    def shard(id: Long, n: Int): Long =
      (0 until n).map(i => (h60(s"${id}_$i"), i.toLong)).max._2
    val expect = ids.groupBy(id => shard(id, 8)).view.mapValues { g =>
      val moved = g.count(id => shard(id, 9) != shard(id, 8)).toLong
      val wrong = g.count(id => { val s9 = shard(id, 9); s9 != shard(id, 8) && s9 != 8 }).toLong
      (g.length.toLong, moved, wrong)
    }.toMap
    val rows = Relational.rendezvousShards(Tables.documents(spark, sfDir)).collect()
    assert(rows.length == expect.size)
    var totalMoved = 0L
    for (r <- rows) {
      val (n, m, w) = expect(r.getLong(0))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_moved") == m)
      assert(r.getAs[Long]("n_moved_wrongly") == w)
      assert(w == 0L, "HRW must only move docs INTO the joining shard")
      totalMoved += m
    }
    // ~1/9 of docs move; allow generous slack on the small fixture
    assert(totalMoved.toDouble / ids.length < 0.25)
  }

  test("vnodeBalance reports lower imbalance for the vnode scheme") {
    val ring = 1152921504606846976L
    val ids = Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0))
    def owner(id: Long, vnodes: Int): Long = {
      val dh = h60(id.toString)
      (for { sh <- 0 until 8; v <- 0 until vnodes } yield {
        val diff = ((h60(s"p_${sh}_$v") - dh) % ring + ring) % ring
        (diff, sh.toLong)
      }).min._2
    }
    val plain = ids.groupBy(owner(_, 1)).view.mapValues(_.length.toLong)
    val rows = Relational.vnodeBalance(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getString(0), (r.getAs[Long]("n_shards"), r.getAs[Long]("max_load")))).toMap
    assert(rows("plain")._2 == plain.values.max)
    assert(rows.contains("vnode16"))
  }

  test("activityIslands partitions each top user's days into maximal runs") {
    val byUser = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(ts AS LONG) div 86400 AS d")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val counts = byUser.groupBy(_._1).view.mapValues(_.size).toSeq
    val top5 = counts.sortBy { case (u, n) => (-n, u) }.take(5).map(_._1).toSet
    val rows = Analytics.activityIslands(Tables.events(spark, sfDir))
      .orderBy("user_id", "island_start").collect()
    for (u <- top5) {
      val days = byUser.filter(_._1 == u).map(_._2).distinct.sorted
      val islands = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = days.head; var prev = days.head
      for (d <- days.tail) {
        if (d != prev + 1) { islands += ((start, prev)); start = d }
        prev = d
      }
      islands += ((start, prev))
      val got = rows.filter(_.getLong(0) == u).map(r => (r.getLong(1), r.getLong(2)))
      assert(got.toSeq == islands.toSeq, s"user $u")
    }
    assert(rows.map(_.getLong(0)).toSet == top5)
  }
}
