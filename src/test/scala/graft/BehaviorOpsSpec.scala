package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Relational, Tables}

/** Round-3 behavioral-analytics batch: gaps-and-islands streaks, RFM
  * quartile segmentation, closed-form per-group OLS, dense grid fill,
  * and the null-handling scalar battery.
  */
class BehaviorOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sfDir = "/root/testdata/sf0.001"

  test("activityStreaks matches a brute-force islands recomputation") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.activityStreaks(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_active_days"), r.getAs[Long]("longest_streak"), r.getAs[Long]("n_streaks")))
      .toMap
    val manual = ev.select(col("user_id"), expr("CAST(ts AS LONG) div 86400").as("day"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
      .distinct
      .groupBy(_._1)
      .map { case (u, rows) =>
        val days = rows.map(_._2).sorted
        // split the sorted day list into runs of consecutive days
        val runs = days.foldLeft(List.empty[List[Long]]) {
          case (acc @ (h :: t), d) if h.head + 1 == d => (d :: h) :: t
          case (acc, d) => List(d) :: acc
        }
        u -> (days.size.toLong, runs.map(_.size).max.toLong, runs.size.toLong)
      }
    assert(got == manual)
  }

  test("rfm scores are balanced quartiles consistent with the metric order") {
    val rfm = Analytics.rfmSegments(Tables.events(spark, sfDir)).collect()
    val n = rfm.length
    assert(n > 0)
    for (scoreCol <- Seq("r_score", "f_score", "m_score")) {
      val scores = rfm.map(_.getAs[Long](scoreCol))
      assert(scores.forall(s => s >= 1 && s <= 4), scoreCol)
      // ntile buckets differ in size by at most one
      val sizes = scores.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"$scoreCol sizes $sizes")
    }
    // monotone: a strictly larger monetary value never gets a lower score
    val byMonetary = rfm.sortBy(r => (r.getAs[Long]("monetary_cents"), r.getAs[Long]("user_id")))
    val mScores = byMonetary.map(_.getAs[Long]("m_score"))
    assert(mScores.zip(mScores.tail).forall { case (a, b) => a <= b })
    // frequency/monetary agree with a direct per-user recount
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("user_id", "value").collect()
      .groupBy(_.getAs[Long]("user_id"))
    rfm.foreach { r =>
      val rows = ev(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("frequency") == rows.length.toLong)
      assert(r.getAs[Long]("monetary_cents") ==
        rows.map(x => math.round(x.getAs[Double]("value") * 100)).sum)
    }
  }

  test("linearRegression reproduces a driver-side OLS fit per group") {
    val li = Tables.lineitem(spark, sfDir)
    val got = Relational.linearRegression(li).collect()
    val raw = li.select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    got.foreach { r =>
      val rows = raw(r.getAs[String]("l_returnflag"))
      val xs = rows.map(x => math.round(x.getAs[Double]("l_quantity")).toDouble)
      val ys = rows.map(x => (math.round(x.getAs[Double]("l_extendedprice") * 100) / 100).toDouble)
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val varX = xs.map(x => x * x).sum / n - mx * mx
      val cov = xs.zip(ys).map { case (x, y) => x * y }.sum / n - mx * my
      assert(math.abs(r.getAs[Double]("slope") - cov / varX) < 1e-6)
      assert(math.abs(r.getAs[Double]("intercept") - (my - (cov / varX) * mx)) < 1e-3)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0 && r2 <= 1)
    }
  }

  test("regressionOutliers flags exactly the rows beyond mult*rmse of the group fit") {
    val li = Tables.lineitem(spark, sfDir)
    val got = Relational.regressionOutliers(li).collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber")) -> r.getAs[Double]("resid"))
      .toMap
    val raw = li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"), r.getAs[String]("l_returnflag"),
        math.round(r.getAs[Double]("l_quantity")).toDouble,
        (math.round(r.getAs[Double]("l_extendedprice") * 100) / 100).toDouble))
    val byFlag = raw.groupBy(_._3)
    val fits = byFlag.map { case (flag, rows) =>
      val n = rows.length.toDouble
      val (mx, my) = (rows.map(_._4).sum / n, rows.map(_._5).sum / n)
      val varX = rows.map(r => r._4 * r._4).sum / n - mx * mx
      val varY = rows.map(r => r._5 * r._5).sum / n - my * my
      val cov = rows.map(r => r._4 * r._5).sum / n - mx * my
      val slope = cov / varX
      flag -> (slope, my - slope * mx, math.sqrt(varY - cov * cov / varX))
    }
    val expected = raw.flatMap { case (ok, ln, flag, x, y) =>
      val (slope, icept, rmse) = fits(flag)
      val resid = y - (slope * x + icept)
      if (math.abs(resid) > 1.6 * rmse) Some((ok, ln) -> resid) else None
    }.toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-6, s"$k") }
    assert(got.nonEmpty && got.size < raw.length)
  }

  test("zorderLayout ranges are tight boxes in both dimensions") {
    val li = Tables.lineitem(spark, sfDir)
    val got = Relational.zorderLayout(li).collect()
    assert(got.map(_.getAs[Long]("n")).sum == li.count())
    got.foreach { r =>
      // a zkey div 256 range fixes the high 4 bits of BOTH coordinates:
      // every range spans at most 16 values per dimension — the locality
      // property single-column sorting cannot give the second dimension
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 15, r.toString)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 15, r.toString)
    }
    // driver-side morton recount agrees per range
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))).sum
    val manual = li.select("l_quantity", "l_extendedprice").collect()
      .map { r =>
        val x = math.round(r.getAs[Double]("l_quantity"))
        val y = math.round(r.getAs[Double]("l_extendedprice") * 100) / 100 / 512
        morton(x, y) / 256
      }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(got.map(r => r.getAs[Long]("zrange") -> r.getAs[Long]("n")).toMap == manual)
  }

  test("ratioToReport shares sum to 1 per user and match an exact recount") {
    val ev = Tables.events(spark, sfDir)
    val out = Analytics.ratioToReport(ev).collect()
    assert(out.length == ev.count())
    val byUser = out.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rows) =>
      val total = rows.head.getAs[Long]("user_total")
      assert(rows.map(_.getAs[Long]("cents")).sum == total)
      assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
      rows.foreach(r =>
        assert(r.getAs[Double]("share") ==
          r.getAs[Long]("cents").toDouble / total.toDouble))
    }
  }

  test("giniSpend matches a driver-side sorted-rank recomputation and stays in [0,1)") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.giniSpend(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("gini")).toMap
    val manual = ev.select("event_type", "user_id", "value").collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rows) =>
        val xs = rows.groupBy(_.getAs[Long]("user_id")).toSeq
          .map { case (u, v) => (u, v.map(r => math.round(r.getAs[Double]("value") * 100)).sum) }
          .sortBy { case (u, x) => (x, u) }
          .map(_._2)
        val n = xs.length.toLong
        val tot = xs.sum
        val swx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
        t -> (2 * swx - (n + 1) * tot).toDouble / (n * tot).toDouble
      }
    assert(got == manual)
    got.values.foreach(g => assert(g >= 0 && g < 1))
  }

  test("fanoBurstiness equals a driver-side var/mean of the hourly series") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.fanoBurstiness(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_hours"), r.getAs[Long]("n_events"), r.getAs[Double]("fano")))
      .toMap
    val manual = ev.select(col("event_type"), expr("CAST(ts AS LONG) div 3600").as("hr"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hr")))
      .groupBy(_._1)
      .map { case (t, rows) =>
        val xs = rows.groupBy(_._2).map(_._2.length.toLong).toSeq
        val (n, tot) = (xs.length.toLong, xs.sum)
        val sxx = xs.map(x => x * x).sum
        t -> (n, tot, (n * sxx - tot * tot).toDouble / (n * tot).toDouble)
      }
    assert(got == manual)
    got.values.foreach { case (_, _, f) => assert(f >= 0) }
  }

  test("newVsReturning conserves user-days and marks each user new exactly once") {
    val ev = Tables.events(spark, sfDir)
    val out = Analytics.newVsReturning(ev).collect().sortBy(_.getAs[Long]("day"))
    val userDays = ev.select(col("user_id"), expr("CAST(ts AS LONG) div 86400").as("d"))
      .distinct().count()
    assert(out.map(r => r.getAs[Long]("n_new") + r.getAs[Long]("n_returning")).sum == userDays)
    // every user is new exactly once, on their first active day
    assert(out.map(_.getAs[Long]("n_new")).sum == ev.select("user_id").distinct().count())
    // the first day in the series has no returning users
    assert(out.head.getAs[Long]("n_returning") == 0L)
    assert(out.exists(_.getAs[Long]("n_returning") > 0L), "fixture spans multiple days")
  }

  test("journeyMatrix buckets every user by first/last event type") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.journeyMatrix(ev).collect()
      .map(r => (r.getAs[String]("first_type"), r.getAs[String]("last_type")) -> r.getAs[Long]("n_users"))
      .toMap
    val manual = ev.select(col("user_id"), expr("CAST(ts AS LONG) * 10000000 + event_id").as("k"), col("event_type"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .toSeq
      .map { case (_, rows) =>
        val sorted = rows.sortBy(_.getAs[Long]("k"))
        (sorted.head.getAs[String]("event_type"), sorted.last.getAs[String]("event_type"))
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == manual)
    assert(got.values.sum == ev.select("user_id").distinct().count())
  }

  test("dataSplitReport partitions every row into one split with ~80/10/10 mass") {
    val ev = Tables.events(spark, sfDir)
    val out = Relational.dataSplitReport(ev).collect()
    assert(out.map(_.getAs[Long]("n")).sum == ev.count())
    val bySplit = out.groupBy(_.getAs[String]("split"))
      .map { case (s, rows) => s -> rows.map(_.getAs[Long]("n")).sum }
    assert(bySplit.keySet == Set("train", "valid", "test"))
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.7 && bySplit("train") / total < 0.9)
    assert(bySplit("valid") / total < 0.2 && bySplit("test") / total < 0.2)
    // assignment is deterministic: recomputing yields identical counts
    assert(Relational.dataSplitReport(ev).collect().map(_.toString).sorted.toSeq ==
      out.map(_.toString).sorted.toSeq)
  }

  test("weightedMedian matches a driver-side cumulative-weight scan") {
    val li = Tables.lineitem(spark, sfDir)
    val got = Relational.weightedMedian(li).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("weighted_median"), r.getAs[Long]("total_weight")))
      .toMap
    val manual = li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("l_orderkey"),
        r.getAs[Int]("l_linenumber"), math.round(r.getAs[Double]("l_quantity")),
        math.round(r.getAs[Double]("l_extendedprice") * 100) / 100))
      .groupBy(_._1)
      .map { case (flag, rows) =>
        val sorted = rows.sortBy(r => (r._5, r._2, r._3))
        val tot = sorted.map(_._4).sum
        var acc = 0L
        val med = sorted.find { r => acc += r._4; acc * 2 >= tot }.get._5
        flag -> (med, tot)
      }
    assert(got == manual)
  }

  test("weightedMedian clamps negative weights to zero mass") {
    import spark.implicits._
    // clamped weights [5, 0, 3, 2] -> total 10, median at y=10; the
    // unclamped total would be -90 and the first value would "cross"
    // immediately (and the grid/row spellings would split) — the
    // extreme-sweep r10 class.
    val li = Seq(
      ("X", 1L, 1, 5.0, 10.0),
      ("X", 2L, 1, -100.0, 1.0),
      ("X", 3L, 1, 3.0, 20.0),
      ("X", 4L, 1, 2.0, 30.0))
      .toDF("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val row = Relational.weightedMedian(li).collect().head
    assert(row.getAs[Long]("weighted_median") == 10L)
    assert(row.getAs[Long]("total_weight") == 10L)
  }

  test("wilsonTopUsers ranks by the lower bound, never above the raw rate") {
    val got = Relational.wilsonTopUsers(Tables.events(spark, sfDir), 20).collect()
      .sortBy(_.getAs[Long]("rank"))
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(got.length == math.min(20L, nUsers))
    got.foreach { r =>
      val (n, c, lb) = (r.getAs[Long]("n"), r.getAs[Long]("c"), r.getAs[Double]("wilson_lb"))
      val p = c.toDouble / n.toDouble
      assert(lb >= 0 && lb <= p + 1e-12, s"lb=$lb p=$p")
      // exact recomputation of the bound
      val z = 1.96
      val expected = (p + z * z / (2.0 * n) -
        z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))) / (1 + z * z / n)
      assert(math.abs(lb - expected) < 1e-12)
    }
    val lbs = got.map(_.getAs[Double]("wilson_lb"))
    assert(lbs.zip(lbs.tail).forall { case (a, b) => a >= b }, "ranked descending")
  }

  test("sourceDupRates counts duplicate rows exactly") {
    val docs = Tables.documents(spark, sfDir)
    val out = graft.text.TextAnalysis.sourceDupRates(docs).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    out.foreach { r =>
      val (n, u, d) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_unique"), r.getAs[Long]("n_dup_rows"))
      assert(d == n - u)
      assert(r.getAs[Double]("dup_ratio") == d.toDouble / n.toDouble)
    }
    val manual = docs.select("source", "text").collect()
      .groupBy(_.getAs[String]("source"))
      .map { case (s, rows) => s -> rows.map(_.getAs[String]("text")).distinct.length.toLong }
    out.foreach(r => assert(r.getAs[Long]("n_unique") == manual(r.getAs[String]("source"))))
  }

  test("denseHourGrid covers the full type x hour matrix and preserves totals") {
    val ev = Tables.events(spark, sfDir)
    val grid = Analytics.denseHourGrid(ev).collect()
    val nTypes = ev.select("event_type").distinct().count()
    assert(grid.length == nTypes * 24)
    assert(grid.map(_.getAs[Long]("n")).sum == ev.count())
    assert(grid.exists(_.getAs[Long]("n") == 0) ||
      ev.count() >= nTypes * 24) // zero-fill only observable when cells are empty
  }

  test("timeWeightedAvg matches a driver-side exact recomputation") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.timeWeightedAvg(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("total_seconds"),
          if (r.isNullAt(r.fieldIndex("twap"))) None else Some(r.getAs[Double]("twap"))))
      .toMap
    val manual = ev.select(col("user_id"), col("ts").cast("long").as("sec"),
      col("value"), col("event_id")).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .collect { case (u, rows) if rows.length >= 2 =>
        val sorted = rows.sortBy(r => (r.getAs[Long]("sec"), r.getAs[Long]("event_id")))
        val pairs = sorted.zip(sorted.tail).map { case (a, b) =>
          val dt = b.getAs[Long]("sec") - a.getAs[Long]("sec")
          (math.round(a.getAs[Double]("value") * 100), dt)
        }
        val sw = pairs.map(_._2).sum
        val swx = pairs.map(p => p._1 * p._2).sum
        u -> (pairs.length.toLong, sw,
          if (sw == 0) None else Some(swx.toDouble / sw.toDouble / 100.0))
      }
    assert(got == manual)
  }

  test("ohlcBars open/close pick the boundary events of each hour") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.ohlcBars(ev).collect()
    val byHour = ev.select(expr("CAST(ts AS LONG) div 3600").as("h"), col("ts").cast("long").as("sec"),
      col("event_id"), col("value")).collect()
      .groupBy(_.getAs[Long]("h"))
    assert(got.length == byHour.size)
    got.foreach { r =>
      val rows = byHour(r.getAs[Long]("hour_epoch"))
        .sortBy(x => (x.getAs[Long]("sec"), x.getAs[Long]("event_id")))
      assert(r.getAs[Double]("open") == rows.head.getAs[Double]("value"))
      assert(r.getAs[Double]("close") == rows.last.getAs[Double]("value"))
      assert(r.getAs[Double]("high") == rows.map(_.getAs[Double]("value")).max)
      assert(r.getAs[Double]("low") == rows.map(_.getAs[Double]("value")).min)
      assert(r.getAs[Long]("volume") == rows.length.toLong)
    }
  }

  test("sourceMixWeights rebalance to a uniform expected token share") {
    val out = graft.text.TextAnalysis
      .sourceMixWeights(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("n_tokens"), r.getAs[Double]("share"), r.getAs[Double]("weight")))
    val total = out.map(_._1).sum
    out.foreach { case (nTok, share, weight) =>
      assert(share == nTok.toDouble / total.toDouble)
      // weighted token mass is equal across sources: weight · tokens = total / n_sources
      assert(math.abs(weight * nTok - total.toDouble / out.length) < 1e-6)
    }
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-12)
  }

  test("cusumChangepoint telescopes to zero and flags the true argmax") {
    val out = Analytics.cusumChangepoint(Tables.events(spark, sfDir)).collect()
      .sortBy(_.getAs[Long]("day"))
    val d = out.length.toLong
    val total = out.map(_.getAs[Long]("n")).sum
    // telescoping: the final cusum is sum(n_d·D − T) over all days = T·D − T·D = 0
    assert(out.last.getAs[Long]("cusum") == 0L)
    // running recomputation
    var acc = 0L
    out.foreach { r =>
      acc += r.getAs[Long]("n") * d - total
      assert(r.getAs[Long]("cusum") == acc)
    }
    val maxAbs = out.map(r => math.abs(r.getAs[Long]("cusum"))).max
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_peak") == (math.abs(r.getAs[Long]("cusum")) == maxAbs))
    }
    assert(out.count(_.getAs[Boolean]("is_peak")) >= 1)
  }

  test("benfordDigits partitions the corpus into 9 digit classes") {
    val li = Tables.lineitem(spark, sfDir)
    val out = Relational.benfordDigits(li).collect()
    assert(out.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    assert(out.map(_.getAs[Long]("n")).sum == li.count())
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
    val manual = li.select("l_extendedprice").collect()
      .groupBy(r => math.round(r.getAs[Double]("l_extendedprice") * 100).toString.head)
      .map { case (k, v) => k.toString.toLong -> v.length.toLong }
    assert(out.map(r => r.getAs[Long]("digit") -> r.getAs[Long]("n")).toMap == manual)
  }

  test("fkOrphans reports intact FKs as zero and the filtered slice as non-zero") {
    val out = Relational.fkOrphans(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.part(spark, sfDir),
      Tables.events(spark, sfDir)).collect()
      .map(r => r.getAs[String]("relation") ->
        (r.getAs[Long]("n_child"), r.getAs[Long]("n_orphans"), r.getAs[Double]("orphan_rate")))
      .toMap
    assert(out.size == 4)
    for (rel <- Seq("lineitem.orderkey", "orders.custkey", "lineitem.partkey")) {
      assert(out(rel)._2 == 0L, s"$rel should be intact")
      assert(out(rel)._3 == 0.0)
    }
    val (nChild, nOrphans, rate) = out("events.user_building")
    assert(nOrphans > 0 && nOrphans < nChild, "filtered-slice check must be non-degenerate")
    assert(rate == nOrphans.toDouble / nChild.toDouble)
  }

  test("forwardFill carries the last non-null observation forward per user") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.forwardFill(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Double]("v")),
          if (r.isNullAt(r.fieldIndex("v_filled"))) None else Some(r.getAs[Double]("v_filled"))))
      .toMap
    val manual = ev.select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"), col("value"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .toSeq
      .flatMap { case (u, rows) =>
        var lastSeen: Option[Double] = None
        rows.sortBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id"))).map { r =>
          val id = r.getAs[Long]("event_id")
          val v = if (id % 5 == 0) None else Some(r.getAs[Double]("value"))
          if (v.isDefined) lastSeen = v
          (u, id) -> (v, lastSeen)
        }
      }
    val manualMap = manual.toMap
    val diffs = (got.keySet ++ manualMap.keySet)
      .filter(k => got.get(k) != manualMap.get(k)).take(5)
    assert(diffs.isEmpty,
      diffs.map(k => s"$k got=${got.get(k)} manual=${manualMap.get(k)}").mkString("; "))
    // non-degenerate: some filled value differs from its raw (nulled) value
    assert(got.values.exists { case (v, filled) => v.isEmpty && filled.isDefined })
  }

  test("nullFuncs synthesizes nulls exactly on event_id % 5 == 0") {
    val out = Relational.nullFuncs(Tables.events(spark, sfDir)).collect()
    out.foreach { r =>
      val isNull = r.getAs[Boolean]("v_is_null")
      assert(isNull == (r.getAs[Long]("event_id") % 5 == 0))
      if (isNull) {
        assert(r.getAs[Double]("v_or_neg1") == -1.0)
        assert(r.getAs[Double]("v_floor50") == 50.0)
        assert(r.getAs[Double]("v_cap50") == 50.0)
        assert(r.getAs[String]("v_status") == "missing")
      } else {
        assert(r.getAs[Double]("v_floor50") >= 50.0)
        assert(r.getAs[Double]("v_cap50") <= 50.0)
        assert(r.getAs[String]("v_status") == "present")
      }
    }
  }
}
