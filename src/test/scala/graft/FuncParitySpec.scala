package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Relational, Tables}
import graft.text.TextAnalysis

/** Round 4: math/bitwise scalar batteries, ordinal explode, and the
  * binary-magnitude length histogram — brute-force checks on sf0.001.
  */
class FuncParitySpec extends AnyFunSuite {
  import SparkTestSession._

  test("ByteEntropyStats kernel equals the explode-per-character SQL spelling") {
    // the kernel replaced this exact plan — parity must hold on the real
    // corpus AND on handcrafted edge rows (repeat-only, single char,
    // non-ASCII codepoints)
    import spark.implicits._
    val edge = Seq("aaaa", "x", "ab ba", "héllo wörld", "๑๒๓", "mixed ascii ﬃ")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val real = Tables.documents(spark, sfDir).select(col("doc_id"), col("text")).limit(200)
    for (df <- Seq(edge, real)) {
      val viaSql = df
        .select(
          col("doc_id"),
          explode(expr("transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))"))
            .as("byte"))
        .groupBy(col("doc_id"), col("byte"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(
          sum(col("c")).as("n_bytes"),
          count(lit(1)).as("n_distinct"),
          sum(expr("CAST(round(c * ln(c) * 1000000) AS BIGINT)")).as("ent_micro"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val viaKernel = df
        .select(col("doc_id"), graft.functions.VectorFunctions.byteEntropyStats(col("text")).as("s"))
        .select(col("doc_id"), col("s.n_bytes"), col("s.n_distinct"), col("s.ent_micro"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(viaKernel == viaSql)
    }
  }

  test("ByteEntropyStats pins (0,0,0) for the empty payload") {
    // Deliberate divergence from the explode SQL spelling the kernel
    // replaced: `sequence(1, length(''))` = sequence(1, 0) defaults to
    // step −1 and yields [1, 0], so the old plan reported
    // n_bytes=2 / n_distinct=1 for "" — a sequence artifact, not a
    // statistic. The kernel returns the true sufficient statistics of
    // the empty byte multiset; downstream bits_per_byte is NULL (ln 0).
    import spark.implicits._
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val s = df
      .select(graft.functions.VectorFunctions.byteEntropyStats(col("text")).as("s"))
      .select(col("s.n_bytes"), col("s.n_distinct"), col("s.ent_micro"))
      .head
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) == ((0L, 0L, 0L)))
    val ent = graft.multimodal.Multimodal.payloadEntropy(df).head
    assert(ent.isNullAt(ent.fieldIndex("bits_per_byte")))
  }

  test("SigAgree kernel equals the zip_with/filter spelling") {
    import spark.implicits._
    // handcrafted edges: disagreement, empty signatures, self-agreement,
    // and NULL ELEMENTS (the kernel must skip null slots exactly like the
    // HOF, whose null comparisons are dropped by the filter — a null slot
    // may never count as agreement, even opposite a 0)
    val edge = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L, 4L), Seq[java.lang.Long](1L, 9L, 3L, 4L)),
      (Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]),
      (Seq[java.lang.Long](7L), Seq[java.lang.Long](7L)),
      (Seq[java.lang.Long](-1L, 0L, Long.MaxValue), Seq[java.lang.Long](-1L, 1L, Long.MaxValue)),
      (Seq[java.lang.Long](null, 0L, 5L), Seq[java.lang.Long](0L, null, 5L)),
      (Seq[java.lang.Long](null, null), Seq[java.lang.Long](null, null)))
      .toDF("sig_a", "sig_b")
    // real signatures: consecutive-doc pairs from the corpus
    val sigs = graft.text.Dedup.minhashSignatures(
      Tables.documents(spark, sfDir), 32)
    val real = sigs.select(col("doc_id"), col("sig").as("sig_a"))
      .join(
        sigs.select((col("doc_id") - 1).as("doc_id"), col("sig").as("sig_b")),
        "doc_id")
      .select(col("sig_a"), col("sig_b"))
      .limit(300)
    for (df <- Seq(edge, real)) {
      val rows = df
        .withColumn("via_hof",
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"))
        .withColumn("via_kernel",
          graft.functions.VectorFunctions.sigAgree(col("sig_a"), col("sig_b")))
        .collect()
      assert(rows.nonEmpty)
      for (r <- rows)
        assert(r.getAs[Int]("via_hof") == r.getAs[Int]("via_kernel"))
    }
    // a signature agrees with itself at every position
    val self = sigs.limit(50)
      .select(
        size(col("sig")).as("n"),
        graft.functions.VectorFunctions.sigAgree(col("sig"), col("sig")).as("agree"))
      .collect()
    assert(self.nonEmpty && self.forall(r => r.getAs[Int]("agree") == r.getAs[Int]("n")))
  }

  test("mathFuncs scalar identities hold row-wise") {
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture,
    // so identities are checked from each output row itself (q recovers
    // from q_hi + q_lo − 25) plus a multiset cross-check for the
    // cents-derived columns.
    val rows = Relational.mathFuncs(Tables.lineitem(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val q = r.getAs[Double]("q_hi") + r.getAs[Double]("q_lo") - 25.0
      assert(r.getAs[Double]("q_abs") == math.abs(q - 25.0))
      assert(r.getAs[Double]("q_abs") == r.getAs[Double]("q_hi") - r.getAs[Double]("q_lo"))
      assert(r.getAs[Long]("q_sign") == math.signum(q - 25.0).toLong)
      assert(r.getAs[Double]("q_sq") == q * q)
      assert(r.getAs[Double]("q_sqrt") == math.sqrt(q))
      val d = r.getAs[Long]("p_ceil_k") - r.getAs[Long]("p_floor_k")
      assert(d == 0L || d == 1L)
    }
    val got = rows.map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_linenumber"),
      r.getAs[Long]("p_floor_k"), r.getAs[Long]("p_bits"), r.getAs[Long]("k_mod7"))).sorted
    val expected = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")).collect()
      .map { r =>
        val cents = math.round(r.getDouble(2) * 100)
        (r.getLong(0), r.getInt(1).toLong, cents / 100000,
          java.lang.Long.toBinaryString(cents).length.toLong, r.getLong(0) % 7)
      }.sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("bitFuncs aggregates match a direct fold per group") {
    val rows = Relational.bitFuncs(Tables.lineitem(spark, sfDir)).collect()
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
        col("l_linenumber"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getInt(3))))
      .groupBy(_._1)
    assert(rows.length == base.size)
    for (r <- rows) {
      val xs = base((r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus")))
        .map(_._2)
      assert(r.getAs[Long]("n_rows") == xs.length.toLong)
      assert(r.getAs[Long]("key_and") == xs.map(_._1).reduce(_ & _))
      assert(r.getAs[Long]("key_or") == xs.map(_._1).reduce(_ | _))
      assert(r.getAs[Long]("key_xor") == xs.map(_._1).reduce(_ ^ _))
      assert(r.getAs[Long]("popcount_sum") ==
        xs.map(t => java.lang.Long.bitCount(t._1).toLong).sum)
      assert(r.getAs[Long]("low_byte_sum") == xs.map(_._1 & 255L).sum)
      assert(r.getAs[Long]("shifted_sum") == xs.map(t => (t._2 << 3).toLong).sum)
    }
  }

  test("topTwoAgg returns the two largest distinct prices per flag") {
    val rows = Relational.topTwoAgg(Tables.lineitem(spark, sfDir)).collect()
    val byFlag = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    assert(rows.length == byFlag.size)
    for (r <- rows) {
      val xs = byFlag(r.getAs[String]("l_returnflag")).map(_._2)
      val distinctSorted = xs.distinct.sorted.reverse
      assert(r.getAs[Long]("n_rows") == xs.length.toLong)
      assert(r.getAs[Double]("max_price") == distinctSorted(0) / 100.0)
      assert(r.getAs[Double]("second_price") == distinctSorted(1) / 100.0)
    }
  }

  test("TopTwoAggregator merge is associative across arbitrary splits") {
    val agg = graft.functions.TopTwoAggregator
    val xs = Seq(5L, 9L, 9L, 3L, 7L, 9L, 1L)
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    for (cut <- 1 until xs.length) {
      val (l, r) = xs.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(m == whole)
    }
    assert(whole == ((9L, 7L)))
  }

  test("argMinMax picks deterministic extreme ids via the composite key") {
    val rows = Relational.argMinMax(Tables.events(spark, sfDir)).collect()
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).groupBy(_._1)
    for (r <- rows) {
      val xs = byType(r.getAs[String]("event_type"))
      val maxRow = xs.maxBy(t => t._3 * 100000000L + t._2)
      val minRow = xs.minBy(t => t._3 * 100000000L + t._2)
      assert(r.getAs[Long]("max_event_id") == maxRow._2)
      assert(r.getAs[Long]("min_event_id") == minRow._2)
      assert(r.getAs[Long]("max_cents") == xs.map(_._3).max)
      assert(r.getAs[Long]("min_cents") == xs.map(_._3).min)
    }
  }

  test("boolAggs every/any/count_if agree with direct predicates") {
    val rows = Relational.boolAggs(Tables.events(spark, sfDir)).collect()
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    for (r <- rows) {
      val xs = byType(r.getAs[String]("event_type")).map(_._2)
      assert(r.getAs[Boolean]("all_positive") == xs.forall(_ > 0))
      assert(r.getAs[Boolean]("any_large") == xs.exists(_ > 100))
      assert(r.getAs[Long]("n_large") == xs.count(_ > 100).toLong)
    }
  }

  test("posExplode preserves token order and caps position") {
    val rows = TextAnalysis.posExplode(Tables.documents(spark, sfDir))
      .orderBy("doc_id", "pos").collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq)).toMap
    assert(rows.forall(_.getAs[Long]("pos") < 8L))
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    for ((id, rs) <- byDoc) {
      val expect = docs(id).take(8)
      assert(rs.sortBy(_.getAs[Long]("pos")).map(_.getAs[String]("token")).toSeq == expect)
    }
  }

  test("docLengthHistogram buckets by binary magnitude and covers all docs") {
    val rows = TextAnalysis.docLengthHistogram(Tables.documents(spark, sfDir)).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong)
    for (r <- rows) {
      val (lang, bits) = (r.getAs[String]("lang"), r.getAs[Long]("len_bits"))
      val members = docs.filter(d =>
        d._1 == lang && java.lang.Long.toBinaryString(d._2).length.toLong == bits)
      assert(members.length.toLong == r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("min_chars") == members.map(_._2).min)
      assert(r.getAs[Long]("max_chars") == members.map(_._2).max)
      // every member sits inside the doubling bucket [2^(bits-1), 2^bits)
      assert(members.forall(d => d._2 >= (1L << (bits - 1)) && d._2 < (1L << bits)))
    }
  }
}
