package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: `runMain graft.Time <sfDir> <query> [query ...]` times
  * the named queries (twice each, bench-style: warm pass at sf0.001 first)
  * under the same session config as [[Bench]]. For iterating on a single
  * hotspot without paying for the full bench sweep.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      try { SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"TIME $n pass$pass rows=$rows $sec%.3f s")
      }
    }
    spark.stop()
  }
}
