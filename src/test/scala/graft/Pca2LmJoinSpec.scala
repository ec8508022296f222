package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}
import graft.similarity.Similarity

/** Round-3 continuation: deflated second PCA direction, bigram LM
  * evaluation, join-cardinality estimation — brute-force recomputation
  * on sf0.001.
  */
class Pca2LmJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def rnd(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  test("powerIterationDeflated reproduces the quantized deflation chain") {
    val got = Similarity.powerIterationDeflated(Tables.embeddings(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("loading2_milli")).toMap
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding"))
        .map(v => rnd(v.toDouble * 1000)).toArray)
    // simulate: gram matrix
    val s = Array.tabulate(64, 64)((i, j) => vecs.map(v => v(i) * v(j)).sum)
    def step(m: Array[Array[Long]], u: Array[Long]): Array[Long] = {
      val w = (0 until 64).map(i => (0 until 64).map(j => m(i)(j) * u(j)).sum).toArray
      val mx = w.map(math.abs).max
      w.map(x => rnd(1000.0 * x.toDouble / mx.toDouble))
    }
    val u2 = step(s, step(s, Array.fill(64)(1L)))
    val uc = u2.map(u => rnd(u.toDouble / 10.0))
    val uu = uc.map(u => u * u).sum
    val umu = (0 until 64).flatMap(i => (0 until 64).map(j => s(i)(j) * uc(i) * uc(j))).sum
    val d = Array.tabulate(64, 64)((i, j) =>
      s(i)(j) - rnd((umu.toDouble / uu.toDouble) * ((uc(i) * uc(j)).toDouble / uu.toDouble)))
    val w0 = Array.tabulate(64)(i => if ((i + 1) % 2 == 0) 1L else -1L)
    val v2 = step(d, step(d, w0))
    (0 until 64).foreach(i => assert(got(i + 1L) == v2(i), s"dim ${i + 1}"))
    // the second direction is not parallel to the first: cos < 0.9
    val dot12 = (0 until 64).map(i => u2(i).toDouble * v2(i)).sum
    val n1 = math.sqrt(u2.map(x => x.toDouble * x).sum)
    val n2 = math.sqrt(v2.map(x => x.toDouble * x).sum)
    assert(math.abs(dot12 / (n1 * n2)) < 0.9)
  }

  test("bigramEval accuracy is the held-out argmax hit rate") {
    val rows = Analytics.bigramEval(Tables.events(spark, sfDir)).collect()
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[java.sql.Timestamp]("ts"),
        x.getAs[Long]("event_id"), x.getAs[String]("event_type")))
    val pairs = evs.groupBy(_._1).values.toSeq.flatMap { g =>
      val sorted = g.sortBy(t => (t._2.getTime, t._3))
      sorted.zip(sorted.drop(1)).map { case (a, b) =>
        (a._4, b._4, b._2.toLocalDateTime.getDayOfMonth <= 15)
      }
    }
    val train = pairs.filter(_._3).groupBy(t => (t._1, t._2)).view.mapValues(_.size).toMap
    val preds = train.keys.map(_._1).toSet.map { p: String =>
      p -> train.filter(_._1._1 == p).toSeq
        .sortBy { case ((_, c), n) => (-n, c) }.head._1._2
    }.toMap
    rows.foreach { r =>
      val p = r.getAs[String]("event_type")
      val ev = pairs.filter(t => !t._3 && t._1 == p)
      assert(r.getAs[String]("pred") == preds(p))
      assert(r.getAs[Long]("n_eval") == ev.length)
      assert(r.getAs[Long]("n_hit") == ev.count(_._2 == preds(p)))
    }
    assert(rows.nonEmpty && rows.forall(r =>
      r.getAs[Double]("accuracy") >= 0 && r.getAs[Double]("accuracy") <= 1))
  }

  test("joinCardinalityEstimate actual is exact and est is the scaled key sample") {
    val r = Relational.joinCardinalityEstimate(
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir)).collect().head
    val oc = Tables.orders(spark, sfDir).groupBy("o_orderkey").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val lc = Tables.lineitem(spark, sfDir).groupBy("l_orderkey").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val keys = oc.keySet intersect lc.keySet
    def bucket(k: Long): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(k.toString.getBytes)
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val actual = keys.toSeq.map(k => oc(k) * lc(k)).sum
    val est = 10 * keys.toSeq.filter(bucket(_) == 0).map(k => oc(k) * lc(k)).sum
    assert(r.getAs[Long]("n_keys") == keys.size)
    assert(r.getAs[Long]("actual_pairs") == actual)
    assert(r.getAs[Long]("est_pairs") == est)
    assert(r.getAs[Double]("ratio") == est.toDouble / actual)
    // a 10% key sample lands within 3x of truth on this data
    assert(r.getAs[Double]("ratio") > 0.3 && r.getAs[Double]("ratio") < 3.0)
  }
}
