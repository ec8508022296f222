package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Joins, Relational, Tables}
import graft.similarity.Similarity
import graft.text.{Dedup, TextAnalysis}

/** Round-3 training-pipeline batch 2: decontamination, repetition stats,
  * MAD outliers, z-score normalization, event-time RANGE frames, fuzzy
  * entity matching, SQ8 / IVF-nprobe2 ANN, semantic dedup.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sfDir = "/root/testdata/sf0.001"

  test("nullNormCast yields NULL for empty AND malformed wire values (reference non-ANSI semantics)") {
    import spark.implicits._
    // the reference runs non-ANSI Spark, where a malformed value casts
    // to NULL; under this build's ANSI default a plain cast would throw
    // CAST_INVALID_INPUT and poison-pill the streaming fan-out — the
    // try_cast spelling must absorb garbage as NULL, not crash
    val df = Seq("12.5", "", "N/A", "not-a-number").toDF("raw")
    val got = df
      .select(graft.engine.Stages.nullNormCast(col("raw"), org.apache.spark.sql.types.DoubleType, "v"))
      .collect()
      .map(r => Option(r.getAs[java.lang.Double]("v")).map(_.toDouble))
    assert(got.toSeq == Seq(Some(12.5), None, None, None), got.toSeq.toString)
    val ts = Seq("2024-01-01 00:00:00", "not-a-time")
      .toDF("raw")
      .select(graft.engine.Stages.nullNormCast(col("raw"), org.apache.spark.sql.types.TimestampType, "t"))
      .collect()
    assert(ts(0).get(0) != null && ts(1).isNullAt(0))
  }

  test("repetitionStats: ratio identity holds and bounds are sane") {
    val rows = TextAnalysis.repetitionStats(Tables.documents(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct"))
      assert(u >= 1 && u <= n)
      assert(r.getAs[Double]("dup_ratio") == (n - u).toDouble / n.toDouble)
      val maxFreq = r.getAs[Long]("max_gram_freq")
      assert(maxFreq >= 1 && maxFreq <= n - u + 1)
      if (u == n) assert(maxFreq == 1)
    }
  }

  test("decontaminate flags exactly the corpus docs sharing an eval 5-gram") {
    val docs = Tables.documents(spark, sfDir)
    val hits = Dedup.decontaminate(docs, 10, 5).collect()
    hits.foreach(r => assert(r.getAs[Long]("doc_id") >= 10))
    // independent recompute via pairwise array intersection
    val g = docs
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn(
        "sh",
        array_distinct(transform(
          sequence(lit(1), greatest(size(col("toks")) - 4, lit(1))),
          i => concat_ws(" ", slice(col("toks"), i, lit(5))))))
      .select(col("doc_id"), col("sh"))
    val eval_ = g.filter(col("doc_id") < 10).withColumnRenamed("sh", "esh")
      .withColumnRenamed("doc_id", "eval_id")
    val expected = g.filter(col("doc_id") >= 10)
      .crossJoin(eval_)
      .filter(size(array_intersect(col("sh"), col("esh"))) > 0)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(hits.map(_.getAs[Long]("doc_id")).toSet == expected)
  }

  test("madOutliers: medians match built-in percentile and flags recount") {
    val li = Tables.lineitem(spark, sfDir)
    val out = Relational.madOutliers(li).collect()
    assert(out.nonEmpty)
    val base = li.select(
      col("l_returnflag"),
      expr(s"${graft.engine.Stages.centsSql("l_extendedprice")} div 100").as("x"))
    out.foreach { r =>
      val flag = r.getString(0)
      val med = r.getAs[Double]("median_dollars")
      val mad = r.getAs[Double]("mad_dollars")
      val medRef = base.filter(col("l_returnflag") === flag)
        .agg(expr("percentile(x, 0.5)")).head().getDouble(0)
      assert(med == medRef)
      val nOut = base.filter(col("l_returnflag") === flag)
        .filter(abs(col("x") - med) > mad * 10).count()
      assert(r.getAs[Long]("n_outliers") == nOut)
    }
  }

  test("zscoreNormalize: per-group z has zero mean and unit population stddev") {
    val z = Relational.zscoreNormalize(Tables.lineitem(spark, sfDir))
    val stats = z.groupBy("l_returnflag")
      .agg(avg("z").as("m"), stddev_pop("z").as("s"))
      .collect()
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("m")) < 1e-9)
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9)
    }
  }

  test("timeRangeWindow recomputes via an explicit interval self-join") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.timeRangeWindow(ev)
    val base = ev.select(
      col("user_id"), col("event_id"),
      col("ts").cast("long").as("epoch_s"),
      expr(graft.engine.Stages.centsSql("value")).as("cents"))
    val ref = base.as("a")
      .join(
        base.select(col("user_id"), col("epoch_s").as("b_epoch"), col("cents").as("b_cents")).as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b_epoch") >= col("a.epoch_s") - 3600 && col("b_epoch") <= col("a.epoch_s"))
      .groupBy(col("a.user_id").as("user_id"), col("a.event_id").as("event_id"))
      .agg((sum("b_cents") / lit(100.0)).as("ref_sum"), count(lit(1)).as("ref_n"))
    val joined = got.join(ref, Seq("user_id", "event_id"))
    assert(joined.filter(col("rolling_sum") =!= col("ref_sum") || col("n_in_range") =!= col("ref_n")).isEmpty)
    assert(got.count() == ev.count())
  }

  test("fuzzyBlockedMatch stays inside blocks with verified distances") {
    val cust = Tables.customer(spark, sfDir)
    val m = Joins.fuzzyBlockedMatch(cust, 2)
    val rows = m.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cust_a") < r.getAs[Long]("cust_b"))
      assert(r.getAs[Long]("edit_dist") <= 2)
    }
    // spot-verify one pair's distance with the builtin on literals
    val r0 = rows.head
    val names = cust.filter(
      col("c_custkey") === r0.getAs[Long]("cust_a") ||
        col("c_custkey") === r0.getAs[Long]("cust_b"))
      .select("c_name").collect().map(_.getString(0))
    val ref = spark.range(1)
      .select(levenshtein(lit(names(0)), lit(names(1))).cast("long")).head().getLong(0)
    assert(ref == r0.getAs[Long]("edit_dist"))
  }

  test("sq8TopK: integer distances, full rank coverage, codes bounded") {
    val emb = Tables.embeddings(spark, sfDir)
    val res = Similarity.sq8TopK(emb, 5, 3).collect()
    val byQ = res.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 5)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L))
      val d = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("sq_dist"))
      assert(d.sorted.toSeq == d.toSeq) // ascending with rank
      d.foreach(x => assert(x >= 0 && x <= 255L * 255L * 64L))
    }
    val codes = emb.select(Similarity.sq8Codes(col("embedding")).as("c"))
      .select(explode(col("c"))).collect().map(_.getLong(0))
    assert(codes.forall(c => c >= 0 && c <= 255))
  }

  test("ivfProbe2TopK dominates single-probe IVF recall per query") {
    val emb = Tables.embeddings(spark, sfDir)
    val one = Similarity.ivfTopK(emb, 5, 3).filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("cos_sim")).toMap
    val two = Similarity.ivfProbe2TopK(emb, 5, 3).filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("cos_sim")).toMap
    // probe-2 candidates are a superset, so its best hit can't be worse
    one.foreach { case (qid, c1) => assert(two(qid) >= c1) }
  }

  test("equalFreqBins partitions all rows into ordered, contiguous deciles") {
    val li = Tables.lineitem(spark, sfDir)
    val bins = Relational.equalFreqBins(li, 10).orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("bin")).toSeq == (1L to 10L))
    assert(bins.map(_.getAs[Long]("n_rows")).sum == li.count())
    // contiguity: each bin's hi is below the next bin's lo
    bins.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi_dollars") < b.getAs[Long]("lo_dollars"))
      case _ =>
    }
    // equal-frequency: no decile is off by more than 2% of total
    val n = li.count().toDouble
    bins.foreach(r => assert(math.abs(r.getAs[Long]("n_rows") - n / 10) < n * 0.02))
  }

  test("bottomKSample is a partitioning-invariant deterministic reservoir") {
    val ev = Tables.events(spark, sfDir)
    val s1 = Relational.bottomKSample(ev, 10).collect()
    s1.groupBy(_.getString(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length))
      val hs = sorted.map(_.getAs[Long]("h"))
      assert(hs.sorted.toSeq == hs.toSeq) // ascending hash = k minimum values
    }
    // merge property: the same rows come back under any repartitioning
    val s2 = Relational.bottomKSample(ev.repartition(7, col("value")), 10).collect()
    assert(s1.map(_.toString).sorted.toSeq == s2.map(_.toString).sorted.toSeq)
  }

  test("funnel3 keeps every step-1 user and orders step timestamps") {
    val ev = Tables.events(spark, sfDir)
    val f = Analytics.funnel3(ev, "signup", "purchase", "click").collect()
    val signupUsers = ev.filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(f.length == signupUsers)
    f.foreach { r =>
      val (t1, t2, t3) = (r.getString(1), r.getString(2), r.getString(3))
      if (t2 != null) assert(t1 <= t2) // ISO strings order like timestamps
      if (t3 != null) { assert(t2 != null && t2 <= t3) }
      assert(r.getAs[Boolean]("completed") == (t3 != null))
    }
  }

  test("packSequences tiles each source contiguously and conserves tokens") {
    val docs = Tables.documents(spark, sfDir)
    val packs = TextAnalysis.packSequences(docs, 512).collect()
    val totalTokens = docs
      .select(size(split(trim(col("text")), "\\s+")).cast("long")).collect().map(_.getLong(0)).sum
    assert(packs.map(_.getAs[Long]("n_tokens")).sum == totalTokens)
    packs.groupBy(_.getString(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("pack_id"))
      assert(sorted.map(_.getAs[Long]("pack_id")).toSeq == (0L until sorted.length))
      // doc ranges are disjoint and ascending across packs
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ =>
      }
    }
  }

  test("hardNegatives returns only cross-label neighbors, ranked") {
    val emb = Tables.embeddings(spark, sfDir)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hn = Similarity.hardNegatives(emb, 5, 3).collect()
    assert(hn.groupBy(_.getAs[Long]("qid")).size == 5)
    hn.foreach { r =>
      assert(labels(r.getAs[Long]("nid")) == r.getAs[Int]("neg_label"))
      assert(r.getAs[Int]("neg_label") != labels(r.getAs[Long]("qid")))
    }
    hn.groupBy(_.getAs[Long]("qid")).values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length))
      val sims = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sorted.reverse.toSeq == sims.toSeq)
    }
  }

  test("unpivotHourlyAvg equals the directly-computed long form") {
    val ev = Tables.events(spark, sfDir)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val viaPivot = Analytics.unpivotHourlyAvg(ev, types)
    val direct = ev
      .filter(col("event_type").isin(types: _*))
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"))
      .agg(expr(graft.engine.Stages.halfUpAvgDollarsSql(
        graft.engine.Stages.centsSql("value"))).as("avg_value"))
    assert(viaPivot.except(direct).isEmpty && direct.except(viaPivot).isEmpty)
  }

  test("semanticDedupSummary: counts reconcile and block minima survive") {
    val emb = Tables.embeddings(spark, sfDir)
    val sum_ = Similarity.semanticDedupSummary(emb, 0.3).collect()
    assert(sum_.map(_.getAs[Long]("n_vecs")).sum == emb.count())
    sum_.foreach(r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") == r.getAs[Long]("n_vecs")))
    // the lowest vec_id of a label has no lower-id neighbor → never dropped
    val dropped = Similarity.cosineNearDups(emb, 0.3)
      .select(col("label"), col("vec_b").as("vec_id")).distinct()
    val minIds = emb.groupBy("label").agg(min("vec_id").as("vec_id"))
    assert(minIds.join(dropped, Seq("label", "vec_id")).isEmpty)
  }
}
