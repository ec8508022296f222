package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolated A/B for `q_abc_xyz` (VERDICT r9 item 4): the committed
  * two-scan shape (`Relational.abcXyzMatrix` — lean groupBy(partkey)
  * revenue aggregate straight off the scan, separate monthly grid) vs
  * the one-scan shape r6 measured as a NEGATIVE (revenue folded into
  * the (partkey, month) grid, rolled up from it, grid cacheT'd). The r6
  * number predates the ANSI default and the r9 integer widenings, and
  * the query slid to board max (2.6–2.75 s) on all three r9 boards —
  * this re-measures both shapes isolated, best-of-2, on the current
  * source so the committed comment stays a CURRENT measurement.
  *
  * Usage: `runMain graft.AbcProbe [sfDir]` (defaults sf0.1; honors
  * SPARK_GRAFT_CPUS, default 32). Prints one line per variant.
  */
object AbcProbe {

  /** The r6-rejected one-scan shape, reproduced for re-measurement. */
  def abcXyzOneScan(lineitem: DataFrame): DataFrame = {
    import graft.engine.{Relational, Stages}
    import graft.engine.Caches.CacheOps
    val monthly = lineitem
      .groupBy(
        col("l_partkey"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("m"))
      .agg(
        expr("sum(CAST(round(l_quantity) AS BIGINT))").as("q"),
        expr(s"sum(${Stages.lineitemRevUnitsSql})").as("rm"))
      .cacheT()
    val perPart = monthly
      .groupBy(col("l_partkey"))
      .agg(
        count(lit(1)).as("nm"),
        sum(col("q")).as("sq"),
        sum(col("q") * col("q")).as("sqq"))
    val rev = monthly.groupBy(col("l_partkey")).agg(sum(col("rm")).as("r"))
    val ranked = Relational.scalableCumSum(rev, "r", col("r").desc, col("l_partkey").asc)
      .crossJoin(broadcast(rev.agg(sum(col("r")).as("tot"))))
      .withColumn(
        "abc",
        expr("""CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                     WHEN cum * 100 <= tot * 95 THEN 'B'
                     ELSE 'C' END"""))
      .select(col("l_partkey"), col("r"), col("abc"))
    val xyz = perPart.withColumn(
      "xyz",
      expr("""CASE WHEN 4 * (nm * sqq - sq * sq) < sq * sq THEN 'X'
                   WHEN nm * sqq - sq * sq < sq * sq THEN 'Y'
                   ELSE 'Z' END"""))
    ranked
      .join(xyz.select(col("l_partkey"), col("xyz")), Seq("l_partkey"))
      .groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).cast("long").as("n_parts"), sum(col("r")).as("rev_units"))
      .crossJoin(broadcast(rev.agg(sum(col("r")).as("tot"))))
      .select(
        col("abc"),
        col("xyz"),
        col("n_parts"),
        col("rev_units"),
        expr("CAST(rev_units AS DOUBLE) / CAST(tot AS DOUBLE)").as("rev_share"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.engine.Tables.lineitem(spark, sfDir)
    def time(label: String)(mk: => DataFrame): Unit = {
      // warm once, then best-of-2 measured — the bench's convention
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        val s = (System.nanoTime() - t0) / 1e9
        graft.engine.Caches.freeTransient(spark)
        s
      }
      println(f"$label%-12s warm=${runs.head}%.2fs best2=${runs.tail.min}%.2fs")
    }
    time("two_scan")(graft.engine.Relational.abcXyzMatrix(li))
    time("one_scan")(abcXyzOneScan(li))
    // second interleave to separate drift from shape
    time("two_scan")(graft.engine.Relational.abcXyzMatrix(li))
    time("one_scan")(abcXyzOneScan(li))
    spark.stop()
  }
}
