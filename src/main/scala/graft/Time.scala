package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: `runMain graft.Time <sfDir> <query> [query ...]` times
  * the named queries (twice each, bench-style: warm pass at
  * `SPARK_GRAFT_WARM_DIR` first) under the same session config and cache
  * governance as [[Bench]]: per-query transients are freed between passes,
  * pinned views stay RESIDENT. A blanket `catalog.clearCache()` here
  * would be worse than a cold measurement — `Views.pins` would keep
  * returning the now-unpersisted frames, so a pin-dependent query
  * (Q2/Q11 over `supplyEvidence`, the graph family over the edge pins)
  * recomputes the pin build on EVERY read, a shape no deployment has.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // same knob as Bench — without it the two configs plan coalesced
      // stages differently and Time's numbers stop predicting Bench's
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      try { SparkEntry.queries(n)(spark, warmDir).count() } catch { case _: Throwable => () }
      graft.engine.Caches.freeTransient(spark) // pins survive, Bench-style
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.engine.Caches.freeTransient(spark)
        println(f"TIME $n pass$pass rows=$rows $sec%.3f s")
      }
    }
    spark.stop()
  }
}
