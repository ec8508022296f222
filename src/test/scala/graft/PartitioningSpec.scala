package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Evidence that the cluster-scale storage layouts behave as designed:
  * partition pruning skips directories, bucketed joins skip the shuffle.
  * (The driver fixtures are single files, so these write derived layouts
  * into temp dirs.)
  */
class PartitioningSpec extends AnyFunSuite {
  import SparkTestSession._

  test("date-partitioned layout prunes partitions under a date filter") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)

    val read = spark.read.parquet(dir).filter(col("event_date") === "2024-01-03")
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    // partition filter must reach the scan (directory-level pruning)
    assert(scan.contains("PartitionFilters") && scan.contains("event_date"), scan)
    val total = spark.read.parquet(dir).count()
    val pruned = read.count()
    assert(pruned > 0 && pruned < total)
  }

  test("bucketed tables join without an Exchange") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir is
    // a static conf and cannot be set on a running session. A previous JVM's
    // leftover table dirs are invisible to this in-memory catalog, so clear
    // them on disk too.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Seq("li_b", "ord_b").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("ord_b")

    val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
    // force a non-broadcast join so the shuffle question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
