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
    (1 to 25).foreach { i =>
      // negative money (refunds/adjustments) on odd trials: HALF_UP is
      // half AWAY FROM ZERO, which truncating integer division got wrong
      // for negative sums until round 9
      val sign = if (i % 2 == 1) -1L else 1L
      val cents = List.fill(1 + rnd.nextInt(50))(sign * (1L + rnd.nextInt(500000).toLong))
      val df = cents.map(c => c / 100.0).toDF("value")
      val got = df
        .agg(org.apache.spark.sql.functions
          .expr(Stages.halfUpAvgDollarsSql(Stages.centsSql("value"))).as("avg"))
        .head.getDouble(0)
      val expected = (BigDecimal(cents.sum) / BigDecimal(cents.length) / 100)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == expected, s"cents=$cents got=$got expected=$expected")
    }
    // explicit midpoint cases (the ones double-rounding gets wrong),
    // including the negative tie and the negative non-midpoint
    Seq(
      List(531L, 532L) -> 5.32, List(531L, 530L) -> 5.31, List(10L, 11L) -> 0.11,
      List(-531L, -532L) -> -5.32, // negative tie: away from zero
      List(-1L, -1L, 0L) -> -0.01, // −0.667 cents → −1 cent, not 0
      List(-1L, 0L, 0L) -> 0.0) // −0.333 cents → 0 (IEEE 0.0 == -0.0)
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

  test("chunkOverlap covers every character for random sizes and strides") {
    val rnd = new Random(7)
    (1 to 10).foreach { _ =>
      val size = 20 + rnd.nextInt(200)
      val stride = 1 + rnd.nextInt(size) // stride ≤ size → full coverage
      val texts = (1L to 5L).map(i =>
        (i, new Random(i).alphanumeric.take(1 + rnd.nextInt(600)).mkString))
      val df = texts.toDF("doc_id", "text")
      val chunks = graft.text.TextAnalysis.chunkOverlap(df, size, stride).collect()
        .groupBy(_.getAs[Long]("doc_id"))
      texts.foreach { case (id, text) =>
        val mine = chunks(id).sortBy(_.getAs[Long]("chunk_id"))
        val expectN = 1 + (math.max(text.length - size, 0) + stride - 1) / stride
        assert(mine.length == expectN, s"size=$size stride=$stride len=${text.length}")
        // coverage: last chunk reaches the end
        assert((expectN - 1) * stride + size >= text.length)
      }
    }
  }

  test("bitmapIndex reconstructs arbitrary user id sets exactly — negatives included") {
    val rnd = new Random(11)
    (1 to 5).foreach { _ =>
      // signed ids: the floor-mod bit + exact-pair word must round-trip
      // negative ids too (the old % spelling silently masked a negative
      // shift amount to bit 61 — extreme sweep, r10); the decode below
      // (id = word*32 + bit) is exactly the floor-division identity.
      val users = (1 to 40).map(_ => (rnd.nextInt(1000) - 500).toLong).distinct
      val df = users.map(u => (u, "t")).toDF("user_id", "event_type")
      val words = graft.engine.Relational.bitmapIndex(df).collect()
      val decoded = words.flatMap { w =>
        val (word, bits) = (w.getAs[Long]("word_id"), w.getAs[Long]("bits"))
        (0 until 32).filter(b => (bits & (1L << b)) != 0).map(b => word * 32 + b)
      }.toSet
      assert(decoded == users.toSet)
      assert(words.map(_.getAs[Long]("n_users")).sum == users.size)
    }
  }

  test("KS statistic is 0 for identical samples and 1 for disjoint ones") {
    val same = ((1 to 50).map(i => ("src0", i.toLong)) ++ (1 to 50).map(i => ("src1", i.toLong)))
    val dfSame = same.toDF("source", "n_chars")
    val r0 = graft.text.TextAnalysis.ksTest(dfSame, "src0", "src1").head()
    assert(r0.getAs[Long]("d_num") == 0 && r0.getAs[Double]("d_stat") == 0.0)
    val disjoint = ((1 to 50).map(i => ("src0", i.toLong)) ++ (1 to 50).map(i => ("src1", 1000L + i)))
    val r1 = graft.text.TextAnalysis.ksTest(disjoint.toDF("source", "n_chars"), "src0", "src1").head()
    assert(r1.getAs[Double]("d_stat") == 1.0)
  }
}
