package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Demonstrates (rather than asserts in prose) the BASELINE.md fixture
  * note: the driver's single-file single-row-group parquet serializes
  * scans — one task owns the whole table no matter how many cores exist —
  * and the standard fix, writing the same rows as N files, restores N-way
  * scan parallelism with identical data. At 100 TB the same rule is why
  * ingest jobs target ≤128 MB row groups and many files per table.
  */
class FixtureParallelismSpec extends AnyFunSuite {
  import SparkTestSession._

  test("multi-file rewrite recovers scan parallelism with identical data") {
    val li = Tables.lineitem(spark, sfDir)
    val singleFileParts = li.rdd.getNumPartitions
    val dir = "/tmp/graft_multifile_lineitem"
    li.repartition(8).write.mode("overwrite").parquet(dir)

    val multi = spark.read.parquet(dir)
    val multiParts = multi.rdd.getNumPartitions
    // Spark packs small files up to spark.sql.files.minPartitionNum
    // (= default parallelism, 4 here), so 8 files read back as one scan
    // partition PER CORE — full machine utilization, where the single
    // row-group fixture pinned the whole table to one task.
    val cores = spark.sparkContext.defaultParallelism
    assert(multiParts >= cores, s"expected ≥$cores scan partitions, got $multiParts")
    assert(multiParts > singleFileParts,
      s"rewrite did not increase parallelism ($singleFileParts → $multiParts)")

    // identical content: row count and two order-free exact aggregates
    assert(multi.count() == li.count())
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.agg(
        sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("sq"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("sp"),
        sum(col("l_orderkey")).as("sk")).head()
    assert(sums(multi) == sums(li))
  }

  test("the single-file fixture really is a one-task scan (the documented bottleneck)") {
    val docs = Tables.documents(spark, sfDir)
    assert(docs.rdd.getNumPartitions == 1,
      "fixture unexpectedly multi-partition — BASELINE.md note is stale")
  }
}
