package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}
import graft.similarity.Similarity

/** Round-3 continuation: motif census, compaction plan, recall curve —
  * brute-force recomputation on sf0.001.
  */
class MotifPackingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("motifCensus counts users whose ordered path contains each motif") {
    val got = Analytics.motifCensus(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("motif") ->
        (r.getAs[Long]("n_matching"), r.getAs[Long]("n_users")))
      .toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("s"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("s"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type").substring(0, 1)))
    val paths = rows.groupBy(_._1).map { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).mkString
    }.toSeq
    Seq("vcp", "cp", "ss").foreach { m =>
      val exp = paths.count(_.contains(m)).toLong
      assert(got(m) == ((exp, paths.length.toLong)), s"motif $m")
    }
  }

  test("compactionPlan packs files greedily in calendar order") {
    val got = Relational.compactionPlan(Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("total_rows"),
          r.getAs[Long]("min_day"), r.getAs[Long]("max_day")))
      .toMap
    val files = Tables.events(spark, sfDir)
      .select(expr("CAST(CAST(CAST(ts AS DATE) AS TIMESTAMP) AS LONG) div 86400").as("day"),
        col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("rows"))
      .collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[String]("event_type"), r.getAs[Long]("rows")))
      .sortBy(f => (f._1, f._2))
    var cum = 0L
    val packed = files.map { f =>
      val bucket = cum / 2000L
      cum += f._3
      (bucket, f)
    }
    val expected = packed.groupBy(_._1).map { case (b, fs) =>
      b -> (fs.length.toLong, fs.map(_._2._3).sum,
        fs.map(_._2._1).min, fs.map(_._2._1).max)
    }
    assert(got == expected)
    // every bucket except possibly the last is at or above one file of target
    assert(got.values.map(_._2).sum == files.map(_._3).sum)
  }

  test("recallCurve counts exact-top-k hits the index reproduces") {
    val got = Similarity.recallCurve(Tables.embeddings(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[Long]("n_hits"), r.getAs[Double]("recall")))
      .toMap
    def ranks(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) -> r.getAs[Long]("rank"))
        .toMap
    val ex = ranks(Similarity.cosineTopK(Tables.embeddings(spark, sfDir), 10, 5))
    val iv = ranks(Similarity.ivfTopK(Tables.embeddings(spark, sfDir), 10, 5))
    (1L to 5L).foreach { k =>
      val hits = ex.count { case (key, re) => re <= k && iv.get(key).exists(_ <= k) }.toLong
      assert(got(k)._1 == hits, s"k=$k")
      assert(math.abs(got(k)._2 - hits.toDouble / (10.0 * k)) < 1e-12)
    }
    assert(got.size == 5)
  }
}
