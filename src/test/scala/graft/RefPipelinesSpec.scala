package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class RefPipelinesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("all declared queries run and return rows on sf0.001") {
    for ((name, fn) <- SparkEntry.queries) {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has matching oracle column names or a documented omission") {
    for ((name, fn) <- SparkEntry.queries if SparkEntry.oracleSql.contains(name)) {
      val cols = fn(spark, sfDir).columns.toSet
      assert(cols.nonEmpty, s"$name has no columns")
    }
  }

  test("hourly_avg_revenue: averages are cent-quantized and within value range") {
    val df = SparkEntry.queries("q_hourly_avg_revenue")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Double]("avg_revenue")
      assert(v >= 0 && v < 10000)
      assert(math.abs(v * 100 - math.rint(v * 100)) < 1e-9, s"not cent-quantized: $v")
    }
  }

  test("full_table: null-normalization yields no empty strings") {
    val df = SparkEntry.queries("q_full_table")(spark, sfDir)
    assert(df.filter(df("event_type") === "").count() === 0)
  }

  test("abnormal_duration: all rows violate the [1,2000]-day range") {
    val df = SparkEntry.queries("q_abnormal_duration")(spark, sfDir)
    assert(df.filter(df("lead_days") >= 1 && df("lead_days") <= 2000).count() === 0)
  }

  test("hourly_count_by_borough: borough counts sum to event count") {
    val df = SparkEntry.queries("q_hourly_count_by_borough")(spark, sfDir)
    val total = df.agg(org.apache.spark.sql.functions.sum("trip_count")).head.getLong(0)
    val events = engine.Tables.events(spark, sfDir).count()
    assert(total === events)
  }
}
