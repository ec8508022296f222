package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Joins, Relational, Tables}
import graft.text.TextAnalysis

/** Round-3 extension operators: CDC latest-by-key, stratified sampling,
  * grouping sets, sufficient-statistics moments, funnel, bloom-prefiltered
  * semi-join, TF-IDF, array battery.
  */
class ExtensionOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sfDir = "/root/testdata/sf0.001"

  test("setOpsBag multiplicities follow min(purchase, view) − errors per user") {
    val ev = Tables.events(spark, sfDir)
    val byUser = ev.select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(g => g.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    val expected = byUser.flatMap { case (u, c) =>
      val m = math.min(c.getOrElse("purchase", 0L), c.getOrElse("view", 0L)) -
        c.getOrElse("error", 0L)
      if (m > 0) Some(u -> m) else None
    }
    val got = Relational.setOpsBag(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("multiplicity")).toMap
    assert(got == expected)
  }

  test("latestByKey returns exactly one row per user, the (ts, event_id)-max event") {
    val ev = Tables.events(spark, sfDir)
    val latest = Relational.latestByKey(ev)
    assert(latest.count() == ev.select("user_id").distinct().count())
    // cross-check against the window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val viaWindow = ev
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "event_id")
    assert(latest.select("user_id", "event_id").except(viaWindow).isEmpty)
  }

  test("stratifiedHashSample applies per-stratum rates and is deterministic") {
    val ev = Tables.events(spark, sfDir)
    val s1 = Relational.stratifiedHashSample(ev, Map("error" -> 10, "purchase" -> 4), 1, 20)
    val s2 = Relational.stratifiedHashSample(ev, Map("error" -> 10, "purchase" -> 4), 1, 20)
    assert(s1.collect().toSeq == s2.collect().toSeq) // pure function of the key
    val byType = s1.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // error keeps ~10/20, purchase ~4/20, the rest ~1/20 (±50% slack at sf0.001)
    assert(byType("error").toDouble / totals("error") > 0.25)
    assert(byType.getOrElse("view", 0L).toDouble / totals("view") < 0.15)
  }

  test("groupingSetsStats emits leaf, status-subtotal, and grand-total rows") {
    val gs = Relational.groupingSetsStats(Tables.orders(spark, sfDir)).collect()
    val gids = gs.map(_.getAs[Long]("gid")).toSet
    assert(gids == Set(0L, 1L, 3L))
    val grand = gs.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    val leafSum = gs.filter(_.getAs[Long]("gid") == 0L).map(_.getAs[Long]("n_orders")).sum
    assert(leafSum == grand.head.getAs[Long]("n_orders"))
  }

  test("sufficientStatsCorr matches Spark's built-in corr to float tolerance") {
    val li = Tables.lineitem(spark, sfDir)
    val ours = Relational.sufficientStatsCorr(li).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("corr_xy")).toMap
    val builtin = li
      .withColumn("x", expr(s"${graft.engine.Stages.centsSql("l_extendedprice")} div 100"))
      .groupBy("l_returnflag")
      .agg(corr(col("x").cast("double"), col("l_quantity")).as("c"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("c")).toMap
    ours.foreach { case (flag, c) =>
      assert(math.abs(c - builtin(flag)) < 1e-9, s"corr mismatch for $flag: $c vs ${builtin(flag)}")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("funnel keeps every signup user and orders conversions correctly") {
    val ev = Tables.events(spark, sfDir)
    val f = Analytics.funnel(ev, "signup", "purchase", 168)
    assert(f.count() == ev.filter(col("event_type") === "signup").select("user_id").distinct().count())
    // converted ⇒ a purchase exists at/after the first signup, within 7 days
    val bad = f.filter(col("converted") &&
      (col("first_b_after").isNull || col("first_b_after") < col("first_a")))
    assert(bad.isEmpty)
  }

  test("bloomPrefilteredSemiJoin returns exactly the plain semi-join rows") {
    val li = Tables.lineitem(spark, sfDir)
    val dim = Tables.supplier(spark, sfDir).filter(col("s_acctbal") >= 5000)
    val viaBloom = Joins.bloomPrefilteredSemiJoin(li, dim, col("l_suppkey"), col("s_suppkey"), 1000L)
    val plain = li.join(dim, col("l_suppkey") === col("s_suppkey"), "left_semi")
    assert(viaBloom.count() == plain.count())
    assert(viaBloom.select("l_orderkey", "l_linenumber")
      .except(plain.select("l_orderkey", "l_linenumber")).isEmpty)
  }

  test("tfidfTopTerms ranks k terms per doc with df-consistent scores") {
    val docs = Tables.documents(spark, sfDir)
    val t = TextAnalysis.tfidfTopTerms(docs, 3)
    val n = docs.count().toDouble
    val rows = t.collect()
    assert(rows.map(_.getAs[Long]("rank")).forall(r => r >= 1 && r <= 3))
    rows.foreach { r =>
      val expected = r.getAs[Long]("tf").toDouble * (n / r.getAs[Long]("df").toDouble)
      assert(r.getAs[Double]("score") == expected)
    }
    // every doc with ≥3 distinct tokens gets 3 rows
    assert(t.groupBy("doc_id").count().filter(col("count") =!= 3).isEmpty)
  }

  test("skewedDistinct equals the built-in countDistinct per group") {
    val ev = Tables.events(spark, sfDir)
    val salted = Relational.skewedDistinct(ev).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_users"), r.getAs[Long]("n_events"))).toMap
    val plain = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("u"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("u"), r.getAs[Long]("n"))).toMap
    assert(salted == plain)
  }

  test("heavyHittersCheck ranks exact counts and the CMS stays within tolerance") {
    val hh = Relational.heavyHittersCheck(Tables.events(spark, sfDir), 10).collect()
    assert(hh.length == 10)
    assert(hh.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    assert(hh.sliding(2).forall(p => p(0).getAs[Long]("n") >= p(1).getAs[Long]("n")))
    assert(hh.forall(_.getAs[Boolean]("cms_within_tol")))
  }

  test("bigramPmi top pairs have df-consistent counts and ordered scores") {
    val pmi = TextAnalysis.bigramPmi(Tables.documents(spark, sfDir), 15).collect()
    assert(pmi.length == 15)
    assert(pmi.sliding(2).forall(p =>
      p(0).getAs[Double]("pmi_ratio") >= p(1).getAs[Double]("pmi_ratio")))
    pmi.foreach { r =>
      assert(r.getAs[Long]("n_ab") <= r.getAs[Long]("n_a"))
      assert(r.getAs[Long]("n_ab") <= r.getAs[Long]("n_b"))
      assert(r.getAs[Double]("pmi_ratio") > 0)
    }
  }

  test("scd2 builds contiguous validity chains with one current row per key") {
    val h = Analytics.scd2(Tables.events(spark, sfDir))
    val perUser = h.collect().groupBy(_.getAs[Long]("user_id"))
    perUser.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq == (1L to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"))
        case _ =>
      }
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
    }
  }

  test("transitionsTopK counts every in-sequence pair exactly once") {
    val ev = Tables.events(spark, sfDir)
    val t = Analytics.transitionsTopK(ev, 1000) // k > |types|² → full matrix
    val totalTransitions = t.agg(sum(col("n"))).head().getLong(0)
    val expected = ev.count() - ev.select("user_id").distinct().count() // n-1 per user
    assert(totalTransitions == expected)
  }

  test("gapFilledHourly covers the full hour range with zero-filled gaps") {
    val g = Analytics.gapFilledHourly(Tables.events(spark, sfDir)).collect()
    val hours = g.map(_.getAs[Long]("hour_epoch"))
    assert(hours.max - hours.min + 1 == hours.length, "missing hours in gap-filled series")
    assert(g.map(_.getAs[Long]("n")).sum == Tables.events(spark, sfDir).count())
    g.foreach(r => assert(r.getAs[Long]("hour_start_epoch") == r.getAs[Long]("hour_epoch") * 3600))
  }

  test("retentionCohorts: week-0 cohort sizes sum to the distinct user count") {
    val ev = Tables.events(spark, sfDir)
    val r = Analytics.retentionCohorts(ev)
    val week0Users = r.filter(col("week_offset") === 0).agg(sum(col("n_users"))).head().getLong(0)
    assert(week0Users == ev.select("user_id").distinct().count()) // everyone is active in their own first week
    assert(r.filter(col("week_offset") < 0).isEmpty)
  }

  test("degenerate inputs: 1-token docs, <3-token docs, zero-variance groups") {
    import spark.implicits._
    val tiny = Seq((1L, "solo"), (2L, "just two"), (3L, "a a b c")).toDF("doc_id", "text")
    // single-token docs contribute no bigrams and must not throw (ANSI)
    val pmi = TextAnalysis.bigramPmi(tiny, 10).collect()
    assert(pmi.nonEmpty && pmi.forall(_.getAs[Long]("n_ab") >= 1))
    // <3-token docs yield NULL tok3, like the oracle's list index
    val af = TextAnalysis.arrayFuncs(tiny).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(af(1L).isNullAt(af(1L).fieldIndex("tok3")))
    assert(af(3L).getAs[String]("tok3") == "b")
    // a zero-variance group gets NULL correlation, not DIVIDE_BY_ZERO
    val li = Seq(("A", 10.0, 5.0), ("B", 10.0, 1.0), ("B", 20.0, 2.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val corr = Relational.sufficientStatsCorr(li).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(corr("A").isNullAt(corr("A").fieldIndex("corr_xy")))
    assert(math.abs(corr("B").getAs[Double]("corr_xy") - 1.0) < 1e-12)
  }

  test("pqTopK: k ranked neighbors per query with ascending ADC distances") {
    val pq = graft.similarity.Similarity.pqTopK(Tables.embeddings(spark, sfDir), 10, 5).collect()
    val perQ = pq.groupBy(_.getAs[Long]("qid"))
    assert(perQ.size == 10)
    perQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      assert(sorted.sliding(2).forall(p =>
        p(0).getAs[Double]("approx_dist") <= p(1).getAs[Double]("approx_dist")))
    }
    // encode really is m small codes per vector
    val books = graft.similarity.Similarity.pqCodebooks(8, 16, 8)
    assert(books.length == 8 && books.forall(_.length == 16))
  }

  test("ivfPqTopK only scores candidates in the query's coarse cell") {
    import graft.similarity.Similarity
    val e = Tables.embeddings(spark, sfDir)
    val cellOf = e.select(
      col("vec_id"),
      Similarity.cellId(col("embedding").cast("array<double>"), Similarity.centroids(8, 64)).as("cell"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    val rows = Similarity.ivfPqTopK(e, 10, 5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(cellOf(r.getAs[Long]("qid")) == cellOf(r.getAs[Long]("nid")),
        s"neighbor outside the query's cell: $r")
    }
  }

  test("arrayFuncs battery is internally consistent") {
    val a = TextAnalysis.arrayFuncs(Tables.documents(spark, sfDir)).collect()
    a.foreach { r =>
      assert(r.getAs[Long]("n_uniq") <= r.getAs[Long]("n_toks"))
      assert(r.getAs[Long]("sum_tok_len") >= r.getAs[Long]("n_toks")) // every token ≥1 char
      val pos = r.getAs[Long]("pos_data")
      assert(pos >= 0 && pos <= r.getAs[Long]("n_toks"))
    }
  }
}
