package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Inference, Tables}

/** Round 4: Brown–Forsythe, Kruskal–Wallis, Tukey contrasts, Cohen's d —
  * brute-force recomputation on sf0.001, mirroring the engine's exact
  * quantization (round((s/n)·s) Rayleigh terms) so comparisons are tight.
  */
class InferenceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def centsByType(): Map[String, Seq[Long]] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (t, xs) => (t, xs.map(_._2).toSeq) }

  private def rayleighQ(n: Long, s: Long): Long =
    math.round((s.toDouble / n.toDouble) * s.toDouble)

  private def fStat(groups: Seq[Seq[Long]]): Double = {
    val k = groups.size.toLong
    val nn = groups.map(_.size.toLong).sum
    val ss = groups.map(_.sum).sum
    val rbq = groups.map(g => rayleighQ(g.size.toLong, g.sum)).sum
    val qq = groups.map(_.map(x => x * x).sum).sum
    ((rbq.toDouble - (ss.toDouble / nn.toDouble) * ss.toDouble) / (k - 1).toDouble) /
      ((qq.toDouble - rbq.toDouble) / (nn - k).toDouble)
  }

  private def interpMedian(xs: Seq[Long]): Double = {
    val s = xs.sorted
    val pos = 0.5 * (s.length - 1)
    val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
    s(lo) + (s(hi) - s(lo)) * (pos - lo)
  }

  test("brownForsythe matches the direct median-deviation ANOVA") {
    val row = Inference.brownForsythe(Tables.events(spark, sfDir)).collect().head
    val byType = centsByType()
    val devs = byType.toSeq.sortBy(_._1).map { case (_, xs) =>
      val med2 = math.round(2 * interpMedian(xs))
      xs.map(x => math.abs(2 * x - med2))
    }
    assert(row.getAs[Long]("k") == byType.size.toLong)
    assert(row.getAs[Long]("n") == byType.values.map(_.size.toLong).sum)
    assert(math.abs(row.getAs[Double]("f_stat") - fStat(devs)) < 1e-9)
  }

  test("kruskalWallis matches direct average-rank computation") {
    val row = Inference.kruskalWallis(Tables.events(spark, sfDir)).collect().head
    val byType = centsByType()
    val all = byType.values.flatten.toSeq
    val nn = all.size.toLong
    // average rank per distinct value (1-based), doubled to stay integral
    val counts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ordered = counts.keys.toSeq.sorted
    val twoRank: Map[Long, Long] = {
      var below = 0L
      ordered.map { v =>
        val t = counts(v)
        val r2 = 2 * below + t + 1
        below += t
        (v, r2)
      }.toMap
    }
    // engine computes round((s/n)*s) with s=2R, then kwHSql divides by 4
    val r2qExact = byType.values.map { xs =>
      val twoR = xs.map(twoRank).sum
      math.round((twoR.toDouble / xs.size.toDouble) * twoR.toDouble)
    }.sum
    val tie3 = counts.values.map(t => t * t * t - t).sum
    val h = ((12.0 / (nn.toDouble * (nn + 1).toDouble)) * (r2qExact.toDouble / 4.0)
      - 3.0 * (nn + 1).toDouble) /
      (1.0 - tie3.toDouble / (nn.toDouble * nn.toDouble * nn.toDouble - nn.toDouble))
    assert(row.getAs[Long]("n") == nn)
    assert(row.getAs[Long]("k") == byType.size.toLong)
    assert(math.abs(row.getAs[Double]("h_stat") - h) < 1e-9)
  }

  test("tukeyContrasts emits every unordered pair with the pooled-MSE q statistic") {
    val rows = Inference.tukeyContrasts(Tables.events(spark, sfDir))
      .orderBy("type_a", "type_b").collect()
    val byType = centsByType()
    val types = byType.keys.toSeq.sorted
    assert(rows.length == types.size * (types.size - 1) / 2)
    val k = types.size.toLong
    val nn = byType.values.map(_.size.toLong).sum
    val rbq = byType.values.map(xs => rayleighQ(xs.size.toLong, xs.sum)).sum
    val qq = byType.values.map(_.map(x => x * x).sum).sum
    val mse = (qq.toDouble - rbq.toDouble) / (nn - k).toDouble
    for (r <- rows) {
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(a < b)
      val (xa, xb) = (byType(a), byType(b))
      val ma = xa.sum.toDouble / xa.size.toDouble
      val mb = xb.sum.toDouble / xb.size.toDouble
      val q = math.abs(ma - mb) /
        math.sqrt(mse / 2.0 * (1.0 / xa.size.toDouble + 1.0 / xb.size.toDouble))
      assert(math.abs(r.getAs[Double]("mean_a") - ma / 100.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("q_stat") - q) < 1e-9)
    }
  }

  test("oddsRatio cells partition the events and ratios match the closed form") {
    val row = Inference.oddsRatio(Tables.events(spark, sfDir)).collect().head
    val rows = Tables.events(spark, sfDir)
      .select(
        expr("pmod(datediff(CAST(ts AS DATE), DATE'1970-01-05'), 7) >= 5").as("wk"),
        expr("CAST(round(value * 100) AS BIGINT) > 10000").as("hi"))
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)))
    val a = rows.count(t => t._1 && t._2).toLong
    val b = rows.count(t => t._1 && !t._2).toLong
    val c = rows.count(t => !t._1 && t._2).toLong
    val d = rows.count(t => !t._1 && !t._2).toLong
    assert((row.getAs[Long]("a"), row.getAs[Long]("b"), row.getAs[Long]("c"),
      row.getAs[Long]("d")) == ((a, b, c, d)))
    assert(a + b + c + d == rows.length.toLong)
    assert(math.abs(row.getAs[Double]("odds_ratio") -
      (a.toDouble / b) * (d.toDouble / c)) < 1e-12)
    assert(math.abs(row.getAs[Double]("risk_ratio") -
      (a.toDouble / (a + b)) / (c.toDouble / (c + d))) < 1e-12)
    assert(math.abs(row.getAs[Double]("se2_log_or") -
      (1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)) < 1e-15)
  }

  test("binomialTest z matches the continuity-corrected closed form per type") {
    val rows = Inference.binomialTest(Tables.events(spark, sfDir)).collect()
    val byType = centsByType()
    assert(rows.length == byType.size)
    for (r <- rows) {
      val xs = byType(r.getAs[String]("event_type"))
      val n = xs.size.toLong
      val x = xs.count(_ > 10000L).toLong
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("x") == x)
      val diff = x - n * 0.25
      val z = (diff - 0.5 * math.signum(diff)) / math.sqrt(n * 0.25 * 0.75)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-9)
    }
  }

  test("ebShrinkage pulls small-n parts toward the corpus rate") {
    val rows = Inference.ebShrinkage(Tables.lineitem(spark, sfDir)).collect()
    val mu = rows.head.getAs[Double]("mu")
    val m = rows.head.getAs[Double]("m_prior")
    assert(m >= 0.0)
    for (r <- rows) {
      val (n, x) = (r.getAs[Long]("n"), r.getAs[Long]("x"))
      val pShrunk = (x + m * mu) / (n + m)
      assert(math.abs(r.getAs[Double]("p_shrunk") - pShrunk) < 1e-12)
      // posterior lies between the raw rate and the prior mean
      val pRaw = r.getAs[Double]("p_raw")
      assert(pShrunk >= math.min(pRaw, mu) - 1e-12 && pShrunk <= math.max(pRaw, mu) + 1e-12)
    }
    // a 1-row part must sit closer to mu than a large part with the same raw rate distance
    val total = rows.map(_.getAs[Long]("x")).sum.toDouble / rows.map(_.getAs[Long]("n")).sum
    assert(math.abs(mu - total) < 1e-12)
  }

  test("rollingCorr matches a direct trailing-window Pearson per flag") {
    val out = Inference.rollingCorr(Tables.lineitem(spark, sfDir))
      .orderBy("l_returnflag", "day_epoch").collect()
    val daily = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), expr("CAST(l_shipdate AS DATE)").as("d"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("y"))
      .collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[java.sql.Date]("d").toLocalDate,
        r.getAs[Long]("x"), r.getAs[Long]("y")))
      .groupBy(_._1)
      .map { case (f, xs) => (f, xs.sortBy(_._2.toEpochDay).toVector) }
    for (r <- out) {
      val series = daily(r.getAs[String]("l_returnflag"))
      val idx = series.indexWhere(_._2.toEpochDay == r.getAs[Long]("day_epoch"))
      val win = series.slice(math.max(0, idx - 6), idx + 1)
      assert(r.getAs[Long]("n_days") == win.size.toLong)
      val wn = win.size.toDouble
      val sx = win.map(_._3).sum.toDouble
      val sy = win.map(_._4).sum.toDouble
      val sxx = win.map(t => t._3 * t._3).sum.toDouble
      val syy = win.map(t => t._4 * t._4).sum.toDouble
      val sxy = win.map(t => t._3 * t._4).sum.toDouble
      val (vx, vy) = (wn * sxx - sx * sx, wn * syy - sy * sy)
      if (win.size < 3 || vx <= 0 || vy <= 0) assert(r.isNullAt(r.fieldIndex("r")))
      else {
        val expect = (wn * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy))
        assert(math.abs(r.getAs[Double]("r") - expect) < 1e-9)
      }
    }
  }

  test("jarqueBera matches the moment closed form per type") {
    val rows = graft.engine.Analytics.jarqueBera(Tables.events(spark, sfDir)).collect()
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(round(value) AS BIGINT)").as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    for (r <- rows) {
      val xs = byType(r.getAs[String]("event_type"))
      val n = xs.size.toDouble
      val mu = xs.sum / n
      def cm(p: Int) = xs.map(x => math.pow(x - mu, p)).sum / n
      val (m2, m3, m4) = (cm(2), cm(3), cm(4))
      val s = m3 / (m2 * math.sqrt(m2))
      val k = m4 / (m2 * m2) - 3
      val jb = n / 6.0 * (s * s + k * k / 4.0)
      assert(math.abs(r.getAs[Double]("skewness") - s) < 1e-6)
      assert(math.abs(r.getAs[Double]("excess_kurtosis") - k) < 1e-6)
      assert(math.abs(r.getAs[Double]("jb") - jb) < math.abs(jb) * 1e-6 + 1e-6)
    }
  }

  test("discQuantiles picks the smallest value reaching each CDF level") {
    val out = graft.engine.Relational.discQuantiles(Tables.lineitem(spark, sfDir)).collect()
    val byFlag = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.length == byFlag.size)
    for (r <- out) {
      val xs = byFlag(r.getAs[String]("l_returnflag"))
      val n = xs.size
      assert(r.getAs[Long]("n_rows") == n.toLong)
      for (q <- Seq(25, 50, 75, 95)) {
        // smallest x with 100*rank >= q*n, rank = count of values <= x
        val idx = math.ceil(q * n / 100.0).toInt - 1
        val expect = xs(math.max(idx, 0)) / 100.0
        assert(r.getAs[Double](s"p$q") == expect, s"p$q flag=${r.getString(0)}")
      }
    }
  }

  test("cramersV matches the direct contingency computation") {
    val row = graft.text.TextAnalysis.cramersV(Tables.documents(spark, sfDir)).collect().head
    val cells = Tables.documents(spark, sfDir)
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = cells.length.toDouble
    val byCell = cells.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowT = cells.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val colT = cells.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val chi2Micro = byCell.map { case ((s, l), obs) =>
      val e = rowT(s).toDouble * colT(l).toDouble / n
      math.round((obs - e) * (obs - e) / e * 1e6)
    }.sum
    val chi2 = chi2Micro / 1e6
    val v = math.sqrt(chi2 / (n * math.min(rowT.size - 1, colT.size - 1)))
    assert(row.getAs[Long]("n") == cells.length.toLong)
    assert(row.getAs[Long]("r") == rowT.size.toLong)
    assert(row.getAs[Long]("c") == colT.size.toLong)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-6)
    assert(math.abs(row.getAs[Double]("v") - v) < 1e-9)
    assert(row.getAs[Double]("v") >= 0.0 && row.getAs[Double]("v") <= 1.0)
  }

  test("twoProportionTest z matches the pooled closed form") {
    val row = Inference.twoProportionTest(Tables.events(spark, sfDir)).collect().head
    val (n1, x1, n2, x2) = (row.getAs[Long]("n1"), row.getAs[Long]("x1"),
      row.getAs[Long]("n2"), row.getAs[Long]("x2"))
    assert(n1 + n2 == Tables.events(spark, sfDir).count())
    val (p1, p2) = (x1.toDouble / n1, x2.toDouble / n2)
    val p = (x1 + x2).toDouble / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(p * (1 - p) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-9)
  }

  test("mcnemar cells partition the documents and the statistic matches") {
    val row = graft.text.TextAnalysis.mcnemar(Tables.documents(spark, sfDir)).collect().head
    val docs = Tables.documents(spark, sfDir)
      .select(col("n_chars"), col("text")).collect()
      .map(r => (r.getLong(0) > 300L, r.getString(1).trim.split("\\s+").length > 55))
    val b = docs.count(t => t._1 && !t._2).toLong
    val c = docs.count(t => !t._1 && t._2).toLong
    assert(row.getAs[Long]("b") == b)
    assert(row.getAs[Long]("c") == c)
    assert(row.getAs[Long]("a") + row.getAs[Long]("b") + row.getAs[Long]("c") +
      row.getAs[Long]("d") == docs.length.toLong)
    if (b + c > 0) {
      val stat = math.pow(math.abs(b.toDouble - c) - 1.0, 2) / (b + c).toDouble
      assert(math.abs(row.getAs[Double]("stat") - stat) < 1e-9)
    }
  }

  test("hellingerDistance is in [0,1] and matches the bucket recount") {
    val row = Inference.hellingerDistance(Tables.events(spark, sfDir)).collect().head
    val buckets = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT) div 1000").as("bkt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byB = buckets.groupBy(_._2)
    val na = buckets.count(_._1 == "purchase").toLong
    val nb = buckets.count(_._1 == "view").toLong
    val bcMilli = byB.values.map { xs =>
      val a = xs.count(_._1 == "purchase").toLong
      val b = xs.count(_._1 == "view").toLong
      math.round(math.sqrt(a.toDouble * b.toDouble) * 1000)
    }.sum
    val bc = bcMilli / 1000.0 / math.sqrt(na.toDouble * nb.toDouble)
    assert(row.getAs[Long]("na") == na && row.getAs[Long]("nb") == nb)
    assert(row.getAs[Long]("n_buckets") == byB.size.toLong)
    assert(math.abs(row.getAs[Double]("bc") - bc) < 1e-12)
    val h = row.getAs[Double]("hellinger")
    assert(math.abs(h - math.sqrt(math.max(1.0 - bc, 0.0))) < 1e-12)
    assert(h >= 0.0 && h <= 1.0)
  }

  test("prefixClusters finds exactly the shared-prefix groups") {
    val rows = graft.text.Dedup.prefixClusters(Tables.documents(spark, sfDir)).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").take(8).mkString(" ")))
    val groups = docs.groupBy(_._2).filter(_._2.length >= 2)
    assert(rows.length == groups.size)
    val byKeeper = rows.map(r => (r.getAs[Long]("keeper_doc_id"), r.getAs[Long]("n_docs"))).toMap
    for ((_, members) <- groups) {
      val ids = members.map(_._1)
      assert(byKeeper(ids.min) == ids.length.toLong)
    }
  }

  test("deltaMethodRatio matches the direct day-level delta formula") {
    val row = Inference.deltaMethodRatio(Tables.events(spark, sfDir)).collect().head
    val daily = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS DATE)").as("d"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("d").agg(sum("c").as("x"), count(lit(1)).as("y"))
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    val n = daily.length.toDouble
    val (sx, sy) = (daily.map(_._1).sum.toDouble, daily.map(_._2).sum.toDouble)
    val r0 = sx / sy
    val vx = (daily.map(t => t._1.toDouble * t._1).sum - (sx / n) * sx) / (n - 1)
    val vy = (daily.map(t => t._2.toDouble * t._2).sum - (sy / n) * sy) / (n - 1)
    val cxy = (daily.map(t => t._1.toDouble * t._2).sum - (sx / n) * sy) / (n - 1)
    val se2 = (vx - 2 * r0 * cxy + r0 * r0 * vy) / (n * (sy / n) * (sy / n))
    assert(row.getAs[Long]("n_days") == daily.length.toLong)
    assert(math.abs(row.getAs[Double]("ratio_cents") - r0) < 1e-9)
    assert(math.abs(row.getAs[Double]("se2_ratio") - se2) < math.abs(se2) * 1e-9)
  }

  test("tost t statistics bracket the Welch difference by the margin") {
    val row = Inference.tost(Tables.events(spark, sfDir)).collect().head
    val byType = centsByType()
    def stats(xs: Seq[Long]): (Double, Double, Double) = {
      val n = xs.size.toDouble
      val m = xs.sum.toDouble / n
      val v = (xs.map(x => x.toDouble * x).sum - (xs.sum / n) * xs.sum.toDouble) / (n - 1)
      (n, m, v)
    }
    val (n1, m1, v1) = stats(byType("purchase"))
    val (n2, m2, v2) = stats(byType("view"))
    val se = math.sqrt(v1 / n1 + v2 / n2)
    val diff = m1 - m2
    assert(math.abs(row.getAs[Double]("t_lower") - (diff + 500.0) / se) < 1e-9)
    assert(math.abs(row.getAs[Double]("t_upper") - (diff - 500.0) / se) < 1e-9)
    // identity: t_lower - t_upper = 2*margin/se
    assert(math.abs(
      row.getAs[Double]("t_lower") - row.getAs[Double]("t_upper") - 1000.0 / se) < 1e-9)
  }

  test("diffInDiff cells partition the events and the estimate matches") {
    val row = Inference.diffInDiff(Tables.events(spark, sfDir)).collect().head
    val total = Tables.events(spark, sfDir).count()
    assert(row.getAs[Long]("n00") + row.getAs[Long]("n01") +
      row.getAs[Long]("n10") + row.getAs[Long]("n11") == total)
    val cells = Tables.events(spark, sfDir)
      .select(
        expr("cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint) % 2").as("arm"),
        expr("CAST(ts AS LONG)").as("t"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (t0, t1) = (cells.map(_._2).min, cells.map(_._2).max)
    def mean(a: Long, late: Boolean): Double = {
      val xs = cells.filter(c => c._1 == a && ((c._2 * 2 >= t0 + t1) == late)).map(_._3)
      xs.sum.toDouble / xs.length
    }
    val did = (mean(1, late = true) - mean(1, late = false)) -
      (mean(0, late = true) - mean(0, late = false))
    assert(math.abs(row.getAs[Double]("did_cents") - did) < 1e-9)
    assert(row.getAs[Double]("se2_did") > 0.0)
  }

  test("waldIV is the reduced form over the first stage") {
    val row = Inference.waldIV(Tables.events(spark, sfDir)).collect().head
    val fs = row.getAs[Double]("first_stage")
    val rf = row.getAs[Double]("reduced_form")
    assert(math.abs(row.getAs[Double]("wald") - rf / fs) < 1e-9)
    assert(row.getAs[Long]("nz1") + row.getAs[Long]("nz0") ==
      Tables.events(spark, sfDir).count())
  }

  test("neymanAllocation shares are proportional to n*sd and sum to ~1") {
    val rows = Inference.neymanAllocation(Tables.events(spark, sfDir)).collect()
    val byType = centsByType()
    val terms = byType.map { case (t, xs) =>
      val n = xs.size.toDouble
      val m = xs.sum.toDouble / n
      val v = (xs.map(x => x.toDouble * x).sum - (xs.sum / n) * xs.sum.toDouble) / (n - 1)
      (t, math.round(n * math.sqrt(v)))
    }
    val total = terms.values.sum.toDouble
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    for (r <- rows) {
      val t = terms(r.getAs[String]("event_type"))
      assert(math.abs(r.getAs[Double]("share") - t / total) < 1e-12)
      assert(r.getAs[Long]("n_alloc") == math.round(1000.0 * t / total))
    }
  }

  test("fdrScreen BH cutoff flags exactly the prefix ranks") {
    val rows = Inference.fdrScreen(Tables.lineitem(spark, sfDir))
      .orderBy("rank").collect()
    val m = rows.length
    // ranks are 1..m, discoveries form a prefix
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to m.toLong))
    val flags = rows.map(_.getAs[Boolean]("discovered"))
    val k = flags.count(identity)
    assert(flags.take(k).forall(identity) && flags.drop(k).forall(!_))
    // the BH condition holds at rank k and fails for every rank beyond
    val okAt = rows.map(r => r.getAs[Double]("p_cheb") <=
      0.1 * r.getAs[Long]("rank").toDouble / m)
    if (k > 0) assert(okAt(k - 1))
    assert(!okAt.drop(k).exists(identity))
    // Chebyshev bound: p = min(1, 1/z^2)
    for (r <- rows) {
      val z = r.getAs[Double]("z")
      assert(math.abs(r.getAs[Double]("p_cheb") - math.min(1.0, 1.0 / (z * z))) < 1e-15)
    }
  }

  test("dowSeasonalityStrength eta2 is SSB/SST over the weekday groups") {
    val row = Inference.dowSeasonalityStrength(Tables.events(spark, sfDir)).collect().head
    val daily = Tables.events(spark, sfDir)
      .select(expr("CAST(ts AS DATE)").as("d"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .groupBy("d").agg(sum("c").as("rev"))
      .select(expr("pmod(datediff(d, DATE'1970-01-05'), 7)").as("dow"), col("rev"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val groups = daily.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val f = fStat(groups.map(_.toSeq))
    assert(row.getAs[Long]("k") == groups.size.toLong)
    assert(row.getAs[Long]("n_days") == daily.length.toLong)
    assert(math.abs(row.getAs[Double]("f_stat") - f) < math.abs(f) * 1e-9)
    val e = row.getAs[Double]("eta2")
    assert(e >= 0.0 && e <= 1.0)
    // identity: F = (eta2/(k-1)) / ((1-eta2)/(n-k))
    val k = groups.size
    val n = daily.length
    val fFromEta = (e / (k - 1)) / ((1 - e) / (n - k))
    assert(math.abs(fFromEta - row.getAs[Double]("f_stat")) < math.abs(f) * 1e-6)
  }

  test("captureRecapture matches the direct period-overlap counts") {
    val row = Inference.captureRecapture(Tables.events(spark, sfDir)).collect().head
    val users = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (t0, t1) = (users.map(_._2).min, users.map(_._2).max)
    val a = users.filter(_._2 * 2 < t0 + t1).map(_._1).toSet
    val b = users.filter(_._2 * 2 >= t0 + t1).map(_._1).toSet
    val m = (a & b).size.toLong
    assert(row.getAs[Long]("na") == a.size.toLong)
    assert(row.getAs[Long]("nb") == b.size.toLong)
    assert(row.getAs[Long]("m") == m)
    val nHat = (a.size + 1.0) * (b.size + 1.0) / (m + 1.0) - 1.0
    assert(math.abs(row.getAs[Double]("n_hat") - nHat) < 1e-9)
    // the estimate can never be below the observed union
    assert(nHat >= (a ++ b).size.toDouble - 1e-9)
  }

  test("liftDeciles gains are monotone and the base rate recovers") {
    val rows = graft.engine.Analytics.liftDeciles(Tables.events(spark, sfDir))
      .orderBy("decile").collect()
    assert(rows.length == 10)
    val n = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == n)
    // equal-count deciles within 1
    val sizes = rows.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1)
    val gains = rows.map(_.getAs[Double]("cum_gain"))
    assert(gains.zip(gains.tail).forall { case (a2, b2) => b2 >= a2 - 1e-12 })
    assert(math.abs(gains.last - 1.0) < 1e-12)
    // weighted mean of rates == base rate
    val pos = rows.map(_.getAs[Long]("n_pos")).sum.toDouble
    for (r <- rows)
      assert(math.abs(r.getAs[Double]("lift") -
        r.getAs[Double]("rate") / (pos / n)) < 1e-9)
  }

  test("burstiness matches the direct gap moments per type") {
    val rows = graft.engine.Analytics.burstiness(Tables.events(spark, sfDir)).collect()
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("CAST(ts AS LONG)").as("t"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    for (r <- rows) {
      val xs = byType(r.getAs[String]("event_type")).sortBy(t => (t._2, t._3))
      val gaps = xs.zip(xs.tail).map { case (p, q2) => (q2._2 - p._2).toDouble }
      assert(r.getAs[Long]("n_gaps") == gaps.length.toLong)
      val m = gaps.sum / gaps.length
      val sd = math.sqrt(
        (gaps.map(g => g * g).sum - (gaps.sum / gaps.length) * gaps.sum) / (gaps.length - 1))
      assert(math.abs(r.getAs[Double]("mean_gap_s") - m) < 1e-9)
      assert(math.abs(r.getAs[Double]("sd_gap_s") - sd) < 1e-6)
      assert(math.abs(r.getAs[Double]("burstiness") - (sd - m) / (sd + m)) < 1e-9)
      assert(r.getAs[Double]("burstiness") > -1.0 && r.getAs[Double]("burstiness") < 1.0)
    }
  }

  test("bayesAB posterior moments match the Beta closed forms") {
    val row = Inference.bayesAB(Tables.events(spark, sfDir)).collect().head
    val (n1, c1, n2, c2) = (row.getAs[Long]("n1"), row.getAs[Long]("c1"),
      row.getAs[Long]("n2"), row.getAs[Long]("c2"))
    def mean(c: Long, n: Long) = (c + 1.0) / (n + 2.0)
    def v(c: Long, n: Long) =
      (c + 1.0) * (n - c + 1.0) / ((n + 2.0) * (n + 2.0) * (n + 3.0))
    assert(math.abs(row.getAs[Double]("mu1") - mean(c1, n1)) < 1e-15)
    assert(math.abs(row.getAs[Double]("mu2") - mean(c2, n2)) < 1e-15)
    val z = (mean(c1, n1) - mean(c2, n2)) / math.sqrt(v(c1, n1) + v(c2, n2))
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-9)
    // arms partition the users
    val users = Tables.events(spark, sfDir).select(countDistinct("user_id")).head.getLong(0)
    assert(n1 + n2 == users)
  }

  test("trimmedMean equals the sort-and-drop definition per flag") {
    val rows = Inference.trimmedMean(Tables.lineitem(spark, sfDir)).collect()
    val byFlag = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    for (r <- rows) {
      val xs = byFlag(r.getAs[String]("l_returnflag")).map(_._2).sorted
      val lo = xs.length / 10
      val kept = xs.slice(lo, xs.length - lo)
      assert(r.getAs[Long]("n") == xs.length.toLong)
      assert(r.getAs[Long]("n_kept") == kept.length.toLong)
      val tm = kept.sum.toDouble / kept.length / 100.0
      assert(math.abs(r.getAs[Double]("trimmed_mean") - tm) < 1e-9)
    }
  }

  test("averagePrecision matches the direct ranked computation") {
    val row = Inference.averagePrecision(Tables.events(spark, sfDir)).collect().head
    val ranked = Tables.events(spark, sfDir)
      .select((col("event_type") === "purchase").as("y"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"), col("event_id"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (-t._2, t._3))
    var cum = 0L
    var apMicro = 0L
    var nPos = 0L
    for ((r2, i) <- ranked.zipWithIndex) {
      if (r2._1) {
        cum += 1; nPos += 1
        apMicro += math.round(cum.toDouble / (i + 1) * 1e6)
      }
    }
    assert(row.getAs[Long]("n_pos") == nPos)
    assert(math.abs(row.getAs[Double]("avg_precision") - apMicro / 1e6 / nPos) < 1e-12)
    // AP of a random-ish ranking sits near the base rate
    val base = nPos.toDouble / ranked.length
    assert(row.getAs[Double]("avg_precision") >= base * 0.5)
  }

  test("processCapability indices match the SPC closed forms") {
    val rows = Inference.processCapability(Tables.lineitem(spark, sfDir)).collect()
    val byFlag = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    for (r <- rows) {
      val xs = byFlag(r.getAs[String]("l_returnflag")).map(_._2)
      val n = xs.size.toDouble
      val mu = xs.map(_.toDouble).sum / n
      val sd = math.sqrt(
        (xs.map(x => x.toDouble * x).sum - (xs.map(_.toDouble).sum / n) * xs.map(_.toDouble).sum) / (n - 1))
      assert(math.abs(r.getAs[Double]("cp") - 90000.0 / (6 * sd)) < 1e-9)
      assert(math.abs(r.getAs[Double]("cpk") -
        math.min(100000 - mu, mu - 10000) / (3 * sd)) < 1e-9)
      // centered-or-worse: cpk <= cp always
      assert(r.getAs[Double]("cpk") <= r.getAs[Double]("cp") + 1e-12)
    }
  }

  test("abcClassification boundaries respect the integer 80/95 lines") {
    val rows = Inference.abcClassification(Tables.lineitem(spark, sfDir))
      .orderBy("rank").collect()
    val revs = rows.map(r => math.round(r.getAs[Double]("revenue_dollars") * 100))
    // ranks descend by revenue
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    val tot = revs.sum
    var cum = 0L
    for ((r, i) <- rows.zipWithIndex) {
      cum += revs(i)
      val expected = if (5 * cum <= 4 * tot) "A" else if (20 * cum <= 19 * tot) "B" else "C"
      assert(r.getAs[String]("abc_class") == expected)
      assert(math.abs(r.getAs[Double]("cum_share") - cum.toDouble / tot) < 1e-9)
    }
    // classes are a monotone partition A* B* C*
    val cls = rows.map(_.getAs[String]("abc_class")).mkString
    assert("^A*B*C*$".r.findFirstIn(cls).isDefined)
  }

  test("rankBiasedOverlap equals the direct depth-sum definition") {
    val row = Inference.rankBiasedOverlap(Tables.lineitem(spark, sfDir)).collect().head
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def topK(score: ((Long, Long, Long)) => Long): Seq[Long] =
      li.groupBy(_._1).view.mapValues(_.map(score).sum).toSeq
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1)
    val (ta, tb) = (topK(_._2), topK(_._3))
    val p = 0.9
    var rbo = 0.0
    for (d <- 1 to 10) {
      val ov = (ta.take(d).toSet & tb.take(d).toSet).size
      rbo += (1 - p) * math.pow(p, d - 1) * ov / d
    }
    assert(math.abs(row.getAs[Double]("rbo") - rbo) < 1e-9)
    assert(row.getAs[Long]("n_matched") == (ta.toSet & tb.toSet).size.toLong)
    assert(row.getAs[Double]("rbo") >= 0.0 && row.getAs[Double]("rbo") <= 1.0)
  }

  test("cohensD matches the pooled-SD closed form") {
    val row = Inference.cohensD(Tables.events(spark, sfDir)).collect().head
    val byType = centsByType()
    val (xa, xb) = (byType("purchase"), byType("view"))
    def stats(xs: Seq[Long]): (Long, Double, Double) = {
      val n = xs.size.toLong
      val m = xs.sum.toDouble / n.toDouble
      val v = (xs.map(x => x.toDouble * x.toDouble).sum - (xs.sum.toDouble / n) * xs.sum.toDouble) / (n - 1).toDouble
      (n, m, v)
    }
    val (n1, m1, v1) = stats(xa)
    val (n2, m2, v2) = stats(xb)
    val pooled = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2).toDouble
    val d = (m1 - m2) / math.sqrt(pooled)
    val j = 1.0 - 3.0 / (4.0 * (n1 + n2).toDouble - 9.0)
    assert(row.getAs[Long]("n1") == n1)
    assert(row.getAs[Long]("n2") == n2)
    assert(math.abs(row.getAs[Double]("cohen_d") - d) < 1e-9)
    assert(math.abs(row.getAs[Double]("hedges_g") - j * d) < 1e-9)
  }
}
