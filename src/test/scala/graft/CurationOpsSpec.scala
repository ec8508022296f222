package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}
import graft.text.TextAnalysis

/** Round-3 curation/graph operators: ordered path strings (LISTAGG),
  * integer PageRank, exact median+mode, weighted/quota sampling,
  * correlated-subquery decorrelation, overlapping chunking, and the
  * letter-collision diversity statistic.
  */
class CurationOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sfDir = "/root/testdata/sf0.001"

  test("pathString emits each user's events in (ts, event_id) order") {
    val ev = Tables.events(spark, sfDir)
    val paths = Analytics.pathString(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("n_events"), r.getAs[String]("path")))
      .toMap
    val manual = ev.select("user_id", "ts", "event_id", "event_type").collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rows) =>
        u -> rows
          .sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("event_id")))
          .map(_.getAs[String]("event_type"))
          .mkString(">")
      }
    manual.foreach { case (u, p) =>
      assert(paths(u)._2 == p, s"user $u")
      assert(paths(u)._1 == p.split(">", -1).length)
    }
  }

  test("pageRank conserves scaled mass up to leakage and is deterministic") {
    val ev = Tables.events(spark, sfDir)
    val scale = 1000000000L
    val r1 = Analytics.pageRank(ev, 5, scale).collect()
    val r2 = Analytics.pageRank(ev, 5, scale).collect()
    assert(r1.map(_.getAs[Long]("r")).toSeq == r2.map(_.getAs[Long]("r")).toSeq)
    // the distributed fallback computes the identical integer fixpoint
    val dist = Analytics.pageRankDistributed(ev, 5, scale).orderBy("rank").collect()
    assert(
      dist.map(r => (r.getAs[Long]("rank"), r.getAs[String]("node"), r.getAs[Long]("r"))).toSeq ==
        r1.sortBy(_.getAs[Long]("rank"))
          .map(r => (r.getAs[Long]("rank"), r.getAs[String]("node"), r.getAs[Long]("r")))
          .toSeq)
    val total = r1.map(_.getAs[Long]("r")).sum
    assert(total > 0 && total <= scale, s"mass $total vs scale $scale")
    // ranks are strictly ordered by (r desc, node asc)
    val sorted = r1.sortBy(_.getAs[Long]("rank"))
    assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to r1.length).toSeq)
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("r") > b.getAs[Long]("r") ||
        (a.getAs[Long]("r") == b.getAs[Long]("r") &&
          a.getAs[String]("node") < b.getAs[String]("node")))
    }
  }

  test("medianMode matches a row-level recomputation") {
    val li = Tables.lineitem(spark, sfDir)
    val got = Relational.medianMode(li).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("median_qty"), r.getAs[Long]("mode_qty"), r.getAs[Long]("mode_n")))
      .toMap
    val rows = li.select("l_returnflag", "l_quantity").collect()
      .map(r => r.getAs[String]("l_returnflag") -> math.round(r.getAs[Double]("l_quantity")))
    rows.groupBy(_._1).foreach { case (flag, fr) =>
      val qs = fr.map(_._2).sorted
      val n = qs.length
      val median =
        if (n % 2 == 1) qs(n / 2).toDouble else (qs(n / 2 - 1) + qs(n / 2)) / 2.0
      val counts = fr.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val (modeQ, modeN) = counts.toSeq.sortBy { case (q, c) => (-c, q) }.head
      assert(got(flag)._1 == median, s"median $flag")
      assert(got(flag)._2 == modeQ && got(flag)._3 == modeN, s"mode $flag")
    }
  }

  test("weightedSample and quotaSample cap per group and favor heavy rows") {
    val docs = Tables.documents(spark, sfDir)
    val ws = Relational.weightedSample(docs, 10)
    val byGroup = ws.groupBy("source").count().collect().map(_.getAs[Long]("count"))
    assert(byGroup.forall(_ <= 10))
    // weighted: kept docs skew longer than the corpus mean
    val keptMean = ws.agg(avg("n_chars")).head.getDouble(0)
    val allMean = docs.agg(avg("n_chars")).head.getDouble(0)
    assert(keptMean > allMean, s"weighted sample mean $keptMean vs corpus $allMean")
    val qs = Relational.quotaSample(docs, 5)
    val quota = qs.groupBy("source").count().collect().map(_.getAs[Long]("count"))
    assert(quota.forall(_ <= 5))
    assert(qs.select("doc_id").distinct().count() == qs.count())
  }

  test("correlatedAboveAvg keeps exactly the orders above 2x their customer mean") {
    val orders = Tables.orders(spark, sfDir)
    val got = Relational.correlatedAboveAvg(spark, orders).collect()
      .map(_.getAs[Long]("o_orderkey")).toSet
    val rows = orders.select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("o_custkey"),
        math.round(r.getAs[Double]("o_totalprice") * 100)))
    val byCust = rows.groupBy(_._2)
    val expect = rows.filter { case (_, ck, cents) =>
      val grp = byCust(ck)
      cents * grp.length > 2 * grp.map(_._3).sum
    }.map(_._1).toSet
    assert(got == expect)
  }

  test("chunkOverlap windows cover the text with the configured stride") {
    val docs = Tables.documents(spark, sfDir)
    val chunks = TextAnalysis.chunkOverlap(docs, 200, 150).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    docs.select("doc_id", "text").collect().foreach { r =>
      val (id, text) = (r.getAs[Long]("doc_id"), r.getAs[String]("text"))
      val mine = chunks(id).sortBy(_.getAs[Long]("chunk_id"))
      val expectN = 1 + (math.max(text.length - 200, 0) + 149) / 150
      assert(mine.length == expectN, s"doc $id")
      mine.zipWithIndex.foreach { case (c, i) =>
        val sub = text.substring(i * 150, math.min(i * 150 + 200, text.length))
        assert(c.getAs[Long]("chunk_chars") == sub.length)
      }
      // strides cover the tail: last chunk reaches the end of the text
      assert((expectN - 1) * 150 + 200 >= text.length)
    }
  }

  test("interleaveSources assigns unique cycling global positions") {
    val docs = Tables.documents(spark, sfDir)
    val il = Relational.interleaveSources(docs).collect()
    assert(il.length == docs.count())
    val pos = il.map(_.getAs[Long]("global_pos"))
    assert(pos.distinct.length == pos.length)
    // consecutive occupied positions never repeat a source within one cycle
    val nSources = docs.select("source").distinct().count().toInt
    il.groupBy(r => (r.getAs[Long]("global_pos") % nSources)).foreach { case (slot, rows) =>
      assert(rows.map(_.getAs[String]("source")).distinct.length == 1, s"slot $slot")
    }
  }

  test("firstTouch is the (ts, event_id)-min event per (user, type)") {
    val ev = Tables.events(spark, sfDir)
    val ft = Relational.firstTouch(ev)
    val viaWindow = ev
      .withColumn(
        "rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts").asc, col("event_id").asc)))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id")
    assert(ft.select("user_id", "event_type", "event_id").except(viaWindow).isEmpty)
    assert(ft.count() == viaWindow.count())
  }

  test("shareOfTotal shares sum to 1 and scale to group revenue") {
    val st = Relational.shareOfTotal(Tables.lineitem(spark, sfDir)).collect()
    val totalShare = st.map(_.getAs[Double]("share")).sum
    assert(math.abs(totalShare - 1.0) < 1e-9)
    val revs = st.map(_.getAs[Double]("revenue"))
    assert(revs.forall(_ > 0))
  }

  test("snowflakeRevenue partitions orders across regions completely") {
    val sf = Relational
      .snowflakeRevenue(
        Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
        Tables.customer(spark, sfDir), Tables.nation(spark, sfDir), Tables.region(spark, sfDir))
      .collect()
    // every order lands in exactly one region: distinct-order counts sum to the total
    val distinctOrders = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select("o_orderkey").distinct().count()
    assert(sf.map(_.getAs[Long]("n_orders")).sum == distinctOrders)
  }

  test("dailyDelta deltas telescope back to the last day's count") {
    val dd = Analytics.dailyDelta(Tables.events(spark, sfDir)).orderBy("day_epoch").collect()
    assert(dd.head.isNullAt(dd.head.fieldIndex("prev_n")))
    dd.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("prev_n") == a.getAs[Long]("n"))
      assert(b.getAs[Long]("delta") == b.getAs[Long]("n") - a.getAs[Long]("n"))
    }
  }

  test("pairSupport counts users with both types, ordered pairs only") {
    val ev = Tables.events(spark, sfDir)
    val ps = Analytics.pairSupport(ev, 10).collect()
    ps.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val manual = ev.select("user_id", "event_type").distinct().collect()
        .groupBy(_.getAs[Long]("user_id"))
        .count { case (_, rows) =>
          val ts = rows.map(_.getAs[String]("event_type")).toSet
          ts.contains(a) && ts.contains(b)
        }
      assert(r.getAs[Long]("support") == manual, s"pair ($a,$b)")
    }
  }

  test("skyline keeps exactly the non-dominated (price, qty) points") {
    val li = Tables.lineitem(spark, sfDir)
    val sky = Relational.skyline(li).collect()
      .map(r => (r.getAs[Long]("price_dollars"), r.getAs[Long]("qty")))
    val points = li.select("l_extendedprice", "l_quantity").collect()
      .map(r => (math.round(r.getAs[Double]("l_extendedprice") * 100) / 100,
        math.round(r.getAs[Double]("l_quantity"))))
    val expect = points.distinct.filter { case (x, y) =>
      !points.exists { case (x2, y2) => x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.sorted
    assert(sky.sorted.toSeq == expect.toSeq)
  }

  test("bitmap index words reconstruct the exact user sets") {
    val ev = Tables.events(spark, sfDir)
    val bm = Relational.bitmapIndex(ev).collect()
    val byType = ev.select("event_type", "user_id").distinct().collect()
      .groupBy(_.getAs[String]("event_type"))
    bm.groupBy(_.getAs[String]("event_type")).foreach { case (t, words) =>
      val users = words.flatMap { w =>
        val (word, bits) = (w.getAs[Long]("word_id"), w.getAs[Long]("bits"))
        (0 until 32).filter(b => (bits & (1L << b)) != 0).map(b => word * 32 + b)
      }.toSet
      val expect = byType(t).map(_.getAs[Long]("user_id")).toSet
      assert(users == expect, s"type $t")
      assert(words.map(_.getAs[Long]("n_users")).sum == expect.size)
    }
  }

  test("slidingDistinctUsers equals a brute-force per-window distinct") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.slidingDistinctUsers(ev, 3).collect()
      .map(r => r.getAs[Long]("win_end_hour") -> r.getAs[Long]("n_users")).toMap
    val pairs = ev.select(expr("CAST(ts AS LONG) div 3600").as("h"), col("user_id")).collect()
      .map(r => (r.getAs[Long]("h"), r.getAs[Long]("user_id"))).distinct
    // windows ending past the last OBSERVED hour are clipped (phantom
    // post-range windows would read as a spurious end-of-report cliff)
    val maxH = pairs.map(_._1).max
    val brute = pairs.flatMap { case (h, u) => (h to math.min(h + 2, maxH)).map(w => (w, u)) }
      .distinct.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(got == brute)
    assert(!got.keySet.exists(_ > maxH), "phantom post-range windows must be clipped")
  }

  test("abTest counts match a manual split and z has the right sign") {
    val ev = Tables.events(spark, sfDir)
    val row = Analytics.abTest(ev).head()
    val users = ev.select("user_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val byVariant = users.map(_._1).distinct.groupBy(_ % 2)
    val converted = users.filter(_._2 == "purchase").map(_._1).distinct.groupBy(_ % 2)
    assert(row.getAs[Long]("n1") == byVariant(0L).length)
    assert(row.getAs[Long]("n2") == byVariant(1L).length)
    assert(row.getAs[Long]("c1") == converted.getOrElse(0L, Array[Long]()).length)
    assert(row.getAs[Long]("c2") == converted.getOrElse(1L, Array[Long]()).length)
    val (n1, c1, n2, c2) = (row.getAs[Long]("n1"), row.getAs[Long]("c1"),
      row.getAs[Long]("n2"), row.getAs[Long]("c2"))
    if (c1 + c2 == 0 || c1 + c2 == n1 + n2) {
      assert(row.isNullAt(row.fieldIndex("z"))) // degenerate pool: zero variance
    } else {
      val (ra, rb, z) =
        (row.getAs[Double]("rate_a"), row.getAs[Double]("rate_b"), row.getAs[Double]("z"))
      assert((ra > rb) == (z > 0) || ra == rb)
    }
  }

  test("cdcMerge drops keys whose latest event is a tombstone") {
    val ev = Tables.events(spark, sfDir)
    val merged = Analytics.cdcMerge(ev, "error")
    val latest = Relational.latestByKey(ev)
    assert(merged.count() == latest.filter(col("event_type") =!= "error").count())
    assert(merged.filter(col("event_type") === "error").count() == 0)
    assert(merged.select("user_id", "event_id")
      .except(latest.select("user_id", "event_id")).isEmpty)
  }

  test("profileEvents tallies one row of corpus statistics") {
    val ev = Tables.events(spark, sfDir)
    val p = Relational.profileEvents(ev).head()
    assert(p.getAs[Long]("n_rows") == ev.count())
    assert(p.getAs[Long]("n_users") == ev.select("user_id").distinct().count())
    assert(p.getAs[Long]("n_value_nonnull") == ev.filter(col("value").isNotNull).count())
    assert(p.getAs[Long]("min_ts_epoch") <= p.getAs[Long]("max_ts_epoch"))
  }

  test("histogram2d cell counts sum to the corpus size") {
    val li = Tables.lineitem(spark, sfDir)
    val h = Relational.histogram2d(li).collect()
    assert(h.map(_.getAs[Long]("n")).sum == li.count())
    assert(h.map(r => (r.getAs[Long]("price_bin"), r.getAs[Long]("qty_bin"))).distinct.length == h.length)
  }

  test("featureHash buckets partition token counts completely") {
    val docs = Tables.documents(spark, sfDir)
    val fh = TextAnalysis.featureHash(docs, 256)
    val totalTokens = docs
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(fh.agg(sum("n")).head.getLong(0) == totalTokens)
    assert(fh.filter(col("bucket") < 0 || col("bucket") >= 256).count() == 0)
  }

  test("bigramLm probabilities are conditional: per-prefix they sum to <= 1") {
    val lm = TextAnalysis.bigramLm(Tables.documents(spark, sfDir), 20).collect()
    lm.foreach { r =>
      val p = r.getAs[Double]("p_cond")
      assert(p > 0 && p <= 1.0)
      assert(r.getAs[Long]("n_ab") >= 5)
      assert(r.getAs[Long]("n_ab") <= r.getAs[Long]("n_a"))
      assert(p == r.getAs[Long]("n_ab").toDouble / r.getAs[Long]("n_a").toDouble)
    }
    assert(lm.map(_.getAs[Long]("rank")).toSeq == (1L to lm.length).toSeq)
  }

  test("hourlyProfile folds the corpus onto 24 slots") {
    val ev = Tables.events(spark, sfDir)
    val hp = Analytics.hourlyProfile(ev).collect()
    assert(hp.length <= 24)
    assert(hp.map(_.getAs[Long]("n_events")).sum == ev.count())
    assert(hp.forall(r => r.getAs[Long]("hour_of_day") >= 0 && r.getAs[Long]("hour_of_day") < 24))
  }

  test("dailyAutocorr matches corr over the lagged daily series") {
    val ev = Tables.events(spark, sfDir)
    val row = Analytics.dailyAutocorr(ev).head()
    val daily = ev.select(expr("CAST(ts AS LONG) div 86400").as("d")).groupBy("d").count()
      .collect().map(r => r.getAs[Long]("d") -> r.getAs[Long]("count")).sortBy(_._1)
    val pairs = daily.sliding(2).collect {
      case Array((d1, x), (d2, y)) if d2 == d1 + 1 => (x.toDouble, y.toDouble)
    }.toSeq
    assert(row.getAs[Long]("n_pairs") == pairs.length)
    val n = pairs.length.toDouble
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum / n
    val sdx = math.sqrt(pairs.map { case (x, _) => (x - mx) * (x - mx) }.sum / n)
    val sdy = math.sqrt(pairs.map { case (_, y) => (y - my) * (y - my) }.sum / n)
    assert(math.abs(row.getAs[Double]("corr_xy") - cov / (sdx * sdy)) < 1e-9)
  }

  test("knnClassify predicts the majority label of the exact top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val knn = graft.similarity.Similarity.knnClassify(emb, 10, 5).collect()
    assert(knn.length == 10)
    val topk = graft.similarity.Similarity.cosineTopK(emb, 10, 5).collect()
      .groupBy(_.getAs[Long]("qid"))
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    knn.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val votes = topk(qid).map(t => labels(t.getAs[Long]("nid")))
        .groupBy(identity).view.mapValues(_.length).toMap
      val (pred, n) = votes.toSeq.sortBy { case (l, c) => (-c, l) }.head
      assert(r.getAs[Long]("pred_label") == pred && r.getAs[Long]("votes") == n, s"qid $qid")
      assert(r.getAs[Boolean]("correct") == (labels(qid).toLong == r.getAs[Long]("pred_label")))
    }
  }

  test("cosineTopK survives a zero-norm vector with a NULL similarity") {
    import spark.implicits._
    // one all-zero corpus vector: cos = dot/nullif(norms, 0) must be
    // NULL (DuckDB's /0 convention), not an ANSI DIVIDE_BY_ZERO that
    // kills the job — the extreme-sweep r10 crasher class that felled
    // the whole ANN family through the shared norm division.
    val emb = Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(0.5f, 0.5f), 0),
      (2L, Seq(0f, 0f), 1),
      (3L, Seq(-1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.similarity.Similarity.cosineTopK(emb, 1, 3).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.map(_.getAs[Long]("nid")).toSeq == Seq(1L, 3L, 2L)) // NULL sim ranks last
    assert(rows.take(2).forall(!_.isNullAt(rows.head.fieldIndex("cos_sim"))))
    assert(rows.last.isNullAt(rows.last.fieldIndex("cos_sim")))
  }

  test("annRecall is the per-query overlap of LSH with brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val rec = graft.similarity.Similarity.annRecall(emb, 10, 5).collect()
    assert(rec.length == 10)
    val bf = graft.similarity.Similarity.cosineTopK(emb, 10, 5).collect()
      .groupBy(_.getAs[Long]("qid"))
    val lsh = graft.similarity.Similarity.lshBucketTopK(emb, 10, 5).collect()
      .groupBy(_.getAs[Long]("qid"))
    rec.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val exact = bf(qid).map(_.getAs[Long]("nid")).toSet
      val approx = lsh.getOrElse(qid, Array()).map(_.getAs[Long]("nid")).toSet
      assert(r.getAs[Long]("n_hit") == (exact & approx).size, s"qid $qid")
      assert(r.getAs[Double]("recall") == (exact & approx).size.toDouble / exact.size)
    }
  }

  test("langConfusion row counts sum to the corpus and diagonal dominates") {
    val docs = Tables.documents(spark, sfDir)
    val cm = TextAnalysis.langConfusion(docs).collect()
    assert(cm.map(_.getAs[Long]("n")).sum == docs.count())
    val diag = cm.filter(r => r.getAs[String]("true_lang") == r.getAs[String]("pred_lang"))
      .map(_.getAs[Long]("n")).sum
    assert(diag > 0, "identifier should get at least some documents right")
  }

  test("sourceStats tallies docs, tokens, and exact-duplicate mass per source") {
    val docs = Tables.documents(spark, sfDir)
    val st = TextAnalysis.sourceStats(docs).collect()
    assert(st.map(_.getAs[Long]("n_docs")).sum == docs.count())
    st.foreach { r =>
      assert(r.getAs[Long]("n_dup_docs") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_uniq_texts"))
      assert(r.getAs[Long]("max_chars") <= r.getAs[Long]("total_chars"))
    }
  }

  test("notInSubquery matches the set-difference semantics on non-null keys") {
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val got = graft.engine.Joins.notInSubquery(spark, cust, supp).collect()
      .map(_.getAs[Long]("c_custkey")).toSet
    assert(got.nonEmpty, "fixture must make the NOT IN non-degenerate")
    val suppNations = supp.filter(col("s_acctbal") >= 5000)
      .select("s_nationkey").collect().map(_.getAs[Int]("s_nationkey")).toSet
    val expect = cust.collect()
      .filter(r => !suppNations.contains(r.getAs[Int]("c_nationkey")))
      .map(_.getAs[Long]("c_custkey")).toSet
    assert(got == expect)
  }

  test("ksTest computes the exact KS supremum over the merged grid") {
    val docs = Tables.documents(spark, sfDir)
    val row = TextAnalysis.ksTest(docs, "src0", "src1").head()
    val lens = docs.filter(col("source").isin("src0", "src1"))
      .select("source", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))
    val (xa, xb) = (lens.filter(_._1 == "src0").map(_._2), lens.filter(_._1 == "src1").map(_._2))
    val gridVals = (xa ++ xb).distinct.sorted
    val (na, nb) = (xa.length.toLong, xb.length.toLong)
    val dNum = gridVals.map { v =>
      math.abs(xa.count(_ <= v) * nb - xb.count(_ <= v) * na)
    }.max
    assert(row.getAs[Long]("na") == na && row.getAs[Long]("nb") == nb)
    assert(row.getAs[Long]("d_num") == dNum)
    assert(row.getAs[Double]("d_stat") == dNum.toDouble / (na * nb).toDouble)
  }

  test("vocabOverlap Jaccard agrees with set arithmetic on a sample pair") {
    val docs = Tables.documents(spark, sfDir)
    val vo = TextAnalysis.vocabOverlap(docs).collect()
    val vocab = docs.select(col("source"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("t")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sources = vocab.keys.toSeq.sorted
    assert(vo.length == sources.combinations(2).size)
    vo.take(5).foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      val inter = (vocab(a) & vocab(b)).size.toLong
      assert(r.getAs[Long]("n_shared") == inter, s"pair ($a,$b)")
      assert(r.getAs[Long]("n_a") == vocab(a).size && r.getAs[Long]("n_b") == vocab(b).size)
    }
  }

  test("payloadSlices covers every byte window at the configured stride") {
    val docs = Tables.documents(spark, sfDir)
    val media = graft.multimodal.Multimodal.mediaTable(docs)
    val slices = graft.multimodal.Multimodal.payloadSlices(media, 64, 128).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    docs.select("doc_id", "text").collect().foreach { r =>
      val (id, text) = (r.getAs[Long]("doc_id"), r.getAs[String]("text"))
      val mine = slices(id).sortBy(_.getAs[Long]("slice_id"))
      assert(mine.length == 1 + (text.length - 1) / 128, s"doc $id")
      mine.foreach { s =>
        val off = s.getAs[Long]("byte_off").toInt
        val expect = text.substring(off, math.min(off + 64, text.length))
        assert(s.getAs[Long]("n_bytes") == expect.getBytes("UTF-8").length)
      }
    }
  }

  test("payloadSlices and payloadEntropy agree on the empty payload (zero slices; (0,0,NULL) row)") {
    import spark.implicits._
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val media = graft.multimodal.Multimodal.mediaTable(docs)
    val slices = graft.multimodal.Multimodal.payloadSlices(media, 64, 128).collect()
    // doc 2 must emit ZERO slices — one bogus md5('') slice would link
    // every empty payload as a near-dup pair (the oracles guard the same
    // edge with WHERE length(text) > 0)
    assert(slices.map(_.getAs[Long]("doc_id")).toSet == Set(1L), slices.mkString(","))
    val ent = graft.multimodal.Multimodal.payloadEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("n_distinct"),
          Option(r.getAs[java.lang.Double]("bits_per_byte")))).toMap
    // the empty payload keeps its ROW (the kernel's documented contract;
    // the oracle's LEFT JOIN spelling mirrors it) with NULL entropy
    assert(ent(2L) == ((0L, 0L, None)), ent.toString)
    assert(ent(1L)._1 == 3L && ent(1L)._3.isDefined)
  }

  test("sliceNearDup pairs match a direct slice-set recomputation") {
    val docs = Tables.documents(spark, sfDir)
    val media = graft.multimodal.Multimodal.mediaTable(docs)
    val got = graft.multimodal.Multimodal.sliceNearDup(media).collect()
      .map(r => ((r.getAs[Long]("da"), r.getAs[Long]("db")),
        (r.getAs[Long]("shared"), r.getAs[Long]("na"), r.getAs[Long]("nb"),
          r.getAs[Long]("overlap_permille")))).toMap
    val sets = docs.select("doc_id", "text").collect().map { r =>
      val (id, t) = (r.getAs[Long]("doc_id"), r.getAs[String]("text"))
      id -> (0 to (t.length - 1) / 128)
        .map(i => t.substring(i * 128, math.min(i * 128 + 64, t.length))).toSet
    }.toMap
    val bySlice = sets.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val pairShared = scala.collection.mutable.Map.empty[(Long, Long), Long]
    bySlice.values.filter(ds => ds.size >= 2 && ds.size <= 50).foreach { ds =>
      val sorted = ds.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length) {
        val k = (sorted(i), sorted(j))
        pairShared(k) = pairShared.getOrElse(k, 0L) + 1
      }
    }
    val want = pairShared.filter(_._2 >= 2)
    assert(got.nonEmpty && got.keySet == want.keySet.toSet)
    want.foreach { case (k @ (a, b), sh) =>
      val (gs, na, nb, op) = got(k)
      assert(gs == sh && na == sets(a).size && nb == sets(b).size, s"pair $k")
      val m = math.min(na, nb)
      assert(op == (2000 * sh + m) / (2 * m), s"permille $k")
    }
  }

  test("sliceContainment and sliceDedupRatio match direct recomputations") {
    val docs = Tables.documents(spark, sfDir)
    val media = graft.multimodal.Multimodal.mediaTable(docs)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def sliceList(t: String): Seq[String] =
      (0 to (t.length - 1) / 128).map(i => t.substring(i * 128, math.min(i * 128 + 64, t.length)))
    val sets = texts.map { case (id, t) => id -> sliceList(t).toSet }
    // containment: >=80% of the smaller side's distinct slices shared
    val bySlice = sets.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val shared = scala.collection.mutable.Map.empty[(Long, Long), Long]
    bySlice.values.filter(ds => ds.size >= 2 && ds.size <= 50).foreach { ds =>
      val sorted = ds.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length) {
        val k = (sorted(i), sorted(j))
        shared(k) = shared.getOrElse(k, 0L) + 1
      }
    }
    val want = shared.toSeq.flatMap { case ((a, b), sh) =>
      val (na, nb) = (sets(a).size.toLong, sets(b).size.toLong)
      Seq(
        if (1000 * sh >= 800 * na) Some((a, b, sh, na, nb)) else None,
        if (1000 * sh >= 800 * nb) Some((b, a, sh, nb, na)) else None).flatten
    }.toSet
    val got = graft.multimodal.Multimodal.sliceContainment(media).collect()
      .map(r => (r.getAs[Long]("inner_doc"), r.getAs[Long]("outer_doc"),
        r.getAs[Long]("shared"), r.getAs[Long]("n_inner"), r.getAs[Long]("n_outer"))).toSet
    assert(got.nonEmpty && got == want)
    // dedup ratio: one copy of each distinct slice (per-occurrence counts)
    val all = texts.values.flatMap(sliceList).toSeq
    val distinctBytes = all.distinct.map(_.getBytes("UTF-8").length.toLong).sum
    val totalBytes = all.map(_.getBytes("UTF-8").length.toLong).sum
    val row = graft.multimodal.Multimodal.sliceDedupRatio(media).head()
    assert(row.getAs[Long]("total_slices") == all.size.toLong)
    assert(row.getAs[Long]("distinct_slices") == all.distinct.size.toLong)
    assert(row.getAs[Long]("total_bytes") == totalBytes)
    assert(row.getAs[Long]("distinct_bytes") == distinctBytes)
    assert(row.getAs[Long]("savings_permille") ==
      (2000 * (totalBytes - distinctBytes) + totalBytes) / (2 * totalBytes))
  }

  test("dailyTopSpenders ranks exact per-day spend with at most k rows per day") {
    val ev = Tables.events(spark, sfDir)
    val top = Analytics.dailyTopSpenders(ev, 3).collect()
    val perDay = top.groupBy(_.getAs[Long]("day_epoch"))
    perDay.values.foreach { rows =>
      assert(rows.length <= 3)
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rows.length).toSeq)
      val spends = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("spend"))
      assert(spends.zip(spends.tail).forall { case (a, b) => a >= b })
    }
    // cross-check one day against a manual tally
    val (day, rows) = perDay.head
    val manual = ev.filter(col("value").isNotNull)
      .filter(expr(s"CAST(ts AS LONG) div 86400 = $day"))
      .collect().groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(r => math.round(r.getAs[Double]("value") * 100)).sum).toMap
    rows.foreach { r =>
      assert(manual(r.getAs[Long]("user_id")) == math.round(r.getAs[Double]("spend") * 100))
    }
  }

  test("trigramPaths counts order-3 sequences consistently with transitions") {
    val ev = Tables.events(spark, sfDir)
    val tri = Analytics.trigramPaths(ev, 15).collect()
    assert(tri.nonEmpty)
    val manual = ev.select("user_id", "ts", "event_id", "event_type").collect()
      .groupBy(_.getAs[Long]("user_id"))
      .values.flatMap { rows =>
        val seq = rows.sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("event_id")))
          .map(_.getAs[String]("event_type"))
        seq.sliding(3).filter(_.length == 3).map(s => (s(0), s(1), s(2)))
      }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    tri.foreach { r =>
      val key = (r.getAs[String]("t1"), r.getAs[String]("t2"), r.getAs[String]("t3"))
      assert(manual(key) == r.getAs[Long]("n"), s"trigram $key")
    }
  }

  test("timeToConvert cohorts count all signups, converted or not") {
    val ev = Tables.events(spark, sfDir)
    val ttc = Analytics.timeToConvert(ev).collect()
    val signupUsers = ev.filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(ttc.map(_.getAs[Long]("n_users")).sum == signupUsers)
    ttc.foreach { r =>
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_users"))
      if (r.getAs[Long]("n_converted") > 0)
        assert(r.getAs[Double]("median_hours") >= 0)
      else assert(r.isNullAt(r.fieldIndex("median_hours")))
    }
  }

  test("scalableGlobalRank equals the window row_number without one") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val ranked = Relational
      .scalableGlobalRank(li, col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    val viaWindow = li.withColumn(
      "rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc))
        .cast("long"))
    assert(ranked.count() == li.count())
    assert(ranked.except(viaWindow).isEmpty && viaWindow.except(ranked).isEmpty)
    // and the plan truly has no Window node
    val p = ranked.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"global rank must not plan a window:\n$p")
  }

  test("latest-by-key merges incrementally: apply(base, delta) == batch over the union") {
    // incremental materialization algebra: the latest-state table of the
    // full corpus equals latestByKey over (yesterday's states ∪ today's
    // events) — the MERGE/upsert loop a 100 TB pipeline runs nightly
    val ev = Tables.events(spark, sfDir)
    val cut = ev.agg(expr("percentile(CAST(ts AS LONG), 0.5)")).head.getDouble(0).toLong
    val base = Relational.latestByKey(ev.filter(col("ts").cast("long") <= cut))
    val delta = ev.filter(col("ts").cast("long") > cut)
    val merged = Relational.latestByKey(base.unionByName(delta.select(
      col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))))
    val full = Relational.latestByKey(ev)
    assert(merged.except(full).isEmpty && full.except(merged).isEmpty)
  }

  test("join delta algebra: Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB") {
    // incremental view maintenance for an inner equi-join: tonight's
    // delta of orders⋈lineitem equals the three delta joins — the
    // identity that lets a 100 TB pipeline maintain a joined view by
    // joining only the day's increments against yesterday's snapshots
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val cut = orders.agg(expr("percentile(o_orderkey, 0.5)")).head.getDouble(0).toLong
    val (o0, dO) = (orders.filter(col("o_orderkey") <= cut), orders.filter(col("o_orderkey") > cut))
    val (l0, dL) = (lineitem.filter(col("l_orderkey") <= cut), lineitem.filter(col("l_orderkey") > cut))
    def j(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.join(b, col("o_orderkey") === col("l_orderkey"))
    val full = j(orders, lineitem)
    val old = j(o0, l0)
    val incremental = old
      .unionByName(j(dO, l0)).unionByName(j(o0, dL)).unionByName(j(dO, dL))
    assert(incremental.count() == full.count())
    assert(incremental.except(full).isEmpty && full.except(incremental).isEmpty)
    // the delta terms are non-degenerate: new keys joined new lineitems
    assert(j(dO, dL).count() > 0 && old.count() > 0)
  }

  test("charDiversity equals a direct per-document recomputation") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextAnalysis.charDiversity(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_letters"), r.getAs[Long]("collisions"), r.getAs[Double]("collision_rate")))
      .toMap
    docs.select("doc_id", "text").collect().foreach { r =>
      val (id, text) = (r.getAs[Long]("doc_id"), r.getAs[String]("text"))
      val counts = ('a' to 'z').map(ch => text.count(_ == ch).toLong)
      val total = counts.sum
      val coll = counts.map(c => c * (c - 1)).sum
      assert(got(id)._1 == total && got(id)._2 == coll, s"doc $id")
      assert(got(id)._3 == coll.toDouble / (total * (total - 1)).toDouble)
    }
  }
}
