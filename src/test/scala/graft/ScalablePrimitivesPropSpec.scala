package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Relational

/** Property-style tests pinning the distributed primitives to their
  * single-partition reference spellings on many generated inputs — the
  * scalable form must be VALUE-IDENTICAL, not merely approximately
  * right, because oracle hashes ride on it. Fixed-seed generation keeps
  * failures reproducible without extra test dependencies.
  */
class ScalablePrimitivesPropSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def cases(seed: Long, rounds: Int): Seq[List[(Long, Long)]] = {
    val rnd = new scala.util.Random(seed)
    (1 to rounds).map { _ =>
      val n = 1 + rnd.nextInt(120)
      List.tabulate(n)(i => (i.toLong, (rnd.nextInt(2001) - 1000).toLong * rnd.nextInt(51)))
    }
  }

  test("scalableGlobalRank == row_number over the same total order") {
    cases(seed = 41, rounds = 8).foreach { data =>
      val df = data.toDF("id", "v")
      val expected = df
        .withColumn("rank",
          row_number().over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val got = Relational.scalableGlobalRank(df, col("v").desc, col("id").asc)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"))).toMap
      assert(got == expected, s"n=${data.size}")
    }
  }

  test("scalableCumSum == SUM OVER (ORDER BY ...) running sum") {
    cases(seed = 43, rounds = 8).foreach { data =>
      val df = data.toDF("id", "v")
      val w = Window.orderBy(col("v").desc, col("id").asc)
      val expected = df
        .withColumn("cum",
          sum(col("v")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val got = Relational.scalableCumSum(df, "v", col("v").desc, col("id").asc)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum"))).toMap
      assert(got == expected, s"n=${data.size}")
    }
  }

  test("the integer NTILE fill rule == the ANSI bucket sizes for every (n≤60, k≤7)") {
    // exhaustive over small n rather than random: NTILE bugs live at the
    // remainder boundaries, and n≤60 × k≤7 covers every fill pattern
    for (n <- 1 to 60; k <- 1 to 7) {
      val q = n / k
      val rem = n % k
      def bucket(rank: Long): Long =
        if (rank <= rem.toLong * (q + 1)) (rank + q) / (q + 1)
        else rem + (rank - rem.toLong * (q + 1) + q - 1) / q
      val viaFormula = (1 to n).map(r => bucket(r.toLong))
      val viaSizes = (1 to k).flatMap(b =>
        List.fill(if (b <= rem) q + 1 else q)(b.toLong))
      assert(viaFormula == viaSizes, s"n=$n k=$k")
    }
  }

  test("rfm quartile scores == ntile(4) windows on the same ordering") {
    // end-to-end: the deployed NTILE path (scalableGlobalRank + formula)
    // against the literal ntile window, on the real fixture
    val events = graft.engine.Tables.events(spark, sfDir)
    val viaEngine = graft.engine.Analytics.rfmSegments(events)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"), r.getAs[Long]("m_score"))).toMap
    val perUser = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        max(expr("CAST(ts AS LONG) div 86400")).as("recency_day"),
        count(lit(1)).as("frequency"),
        sum(expr(graft.engine.Stages.centsSql("value"))).as("monetary_cents"))
    def q(metric: String) =
      ntile(4).over(Window.orderBy(col(metric).asc, col("user_id").asc)).cast("long")
    val viaWindow = perUser
      .select(col("user_id"), q("recency_day").as("r"), q("frequency").as("f"),
        q("monetary_cents").as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(viaEngine == viaWindow)
  }

  test("SqDistMilli / DotMilli == their HOF reference folds") {
    val rnd = new scala.util.Random(47)
    (1 to 12).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val a = List.fill(n)((rnd.nextInt(200001) - 100000).toLong)
      val b = List.fill(n)((rnd.nextInt(200001) - 100000).toLong)
      val r = Seq((a, b)).toDF("a", "b").select(
        graft.functions.VectorFunctions.sqDistMilli(col("a"), col("b")).as("sq"),
        graft.functions.VectorFunctions.dotMilli(col("a"), col("b")).as("dp"),
        expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)").as("sqRef"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("dpRef")
      ).head()
      assert(r.getAs[Long]("sq") == r.getAs[Long]("sqRef"))
      assert(r.getAs[Long]("dp") == r.getAs[Long]("dpRef"))
    }
  }
}
