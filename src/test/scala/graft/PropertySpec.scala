package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Stages

/** Randomized (seeded, deterministic) checks of the numeric kernels
  * against independent reference implementations (BigDecimal / naive
  * loops).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("halfUpAvgDollarsSql equals BigDecimal HALF_UP average for random money lists") {
    val rnd = new Random(42)
    (1 to 25).foreach { _ =>
      val cents = List.fill(1 + rnd.nextInt(50))(1L + rnd.nextInt(500000).toLong)
      val df = cents.map(c => c / 100.0).toDF("value")
      val got = df
        .agg(org.apache.spark.sql.functions
          .expr(Stages.halfUpAvgDollarsSql(Stages.centsSql("value"))).as("avg"))
        .head.getDouble(0)
      val expected = (BigDecimal(cents.sum) / BigDecimal(cents.length) / 100)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == expected, s"cents=$cents got=$got expected=$expected")
    }
    // explicit midpoint cases (the ones double-rounding gets wrong)
    Seq(List(531L, 532L) -> 5.32, List(531L, 530L) -> 5.31, List(10L, 11L) -> 0.11)
      .foreach { case (cents, expected) =>
        val got = cents.map(c => c / 100.0).toDF("value")
          .agg(org.apache.spark.sql.functions
            .expr(Stages.halfUpAvgDollarsSql(Stages.centsSql("value"))).as("avg"))
          .head.getDouble(0)
        assert(got == expected, s"midpoint $cents → $got, want $expected")
      }
  }

  test("DotProduct equals a naive sequential fold") {
    val rnd = new Random(7)
    (1 to 25).foreach { _ =>
      val a = List.fill(16)(rnd.nextDouble() * 200 - 100)
      val b = List.fill(16)(rnd.nextDouble() * 200 - 100)
      val df = Seq((a, b)).toDF("a", "b")
      val got = df
        .select(graft.functions.VectorFunctions
          .dotProduct(df("a").cast("array<double>"), df("b").cast("array<double>")))
        .head.getDouble(0)
      var expected = 0.0
      a.zip(b).foreach { case (x, y) => expected += x * y }
      assert(got == expected)
    }
  }

  test("MinHash estimated jaccard tracks true jaccard for overlapping token sets") {
    val base = (1 to 60).map(i => s"tok$i")
    Seq(0.2, 0.5, 0.9).foreach { overlap =>
      val keep = (60 * overlap).toInt
      val setA = base
      val setB = base.take(keep) ++ (1 to (60 - keep)).map(i => s"other$i")
      // shingle-level truth differs from token-level; compare against
      // 3-gram sets computed the same way the operator does
      def grams(toks: Seq[String]) = toks.sliding(3).map(_.mkString(" ")).toSet
      val trueJ = {
        val (ga, gb) = (grams(setA), grams(setB))
        ga.intersect(gb).size.toDouble / ga.union(gb).size
      }
      val df = Seq((1L, setA.mkString(" ")), (2L, setB.mkString(" ")))
        .toDF("doc_id", "text")
      val sigs = graft.text.Dedup.minhashSignatures(df, 64)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y } / 64.0
      assert(math.abs(est - trueJ) < 0.25, s"overlap=$overlap est=$est true=$trueJ")
    }
  }

  test("NearestCentroid equals the compositional argmin spelling on random vectors") {
    import org.apache.spark.sql.functions._
    val rnd = new Random(11)
    val cs = graft.similarity.Similarity.centroids(8, 16)
    val vecs = (1 to 50).map(i => (i.toLong, List.fill(16)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val native = df
      .select(df("id"), graft.functions.VectorFunctions.nearestCentroid(df("v").cast("array<double>"), cs).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      val dists = cs.map { c =>
        var vv = 0.0; var dp = 0.0
        v.indices.foreach { j => vv += v(j) * v(j); dp += v(j) * c(j) }
        vv - 2.0 * dp + c.map(x => x * x).sum
      }
      val expected = dists.indexOf(dists.min)
      assert(native(id) == expected, s"vec $id: native=${native(id)} expected=$expected")
    }
  }

  test("MinHash signature values stay within the mod-p family range") {
    val toksA = (1 to 40).map(i => s"t$i")
    val dfA = Seq((1L, toksA.mkString(" "))).toDF("doc_id", "text")
    val sigs = graft.text.Dedup.minhashSignatures(dfA, 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // every position is a minimum of (h1 + j·h2) mod (2^31−1): in range,
    // and never the Long.MaxValue sentinel (some shingle always hashed)
    sigs.values.flatten.foreach(v => assert(v >= 0 && v < 2147483647L))
  }

  test("SimHash hamming distance is 0 for identical docs and small for near-identical") {
    val words = (1 to 80).map(i => s"w$i")
    val df = Seq(
      (1L, words.mkString(" ")),
      (2L, words.mkString(" ")),
      (3L, (words.drop(2) ++ Seq("x1", "x2")).mkString(" "))).toDF("doc_id", "text")
    val sigs = graft.text.Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) == 0)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 16)
  }
}
