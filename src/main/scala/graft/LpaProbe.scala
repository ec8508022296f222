package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolated cost attribution for `q_label_prop` (VERDICT r9 item 5):
  * 2.5 s on every r9 board, flat since r6. Three measurements:
  *
  *   full      — the committed query as registered (builds the
  *               symmetrized sorted edge cache, runs 2 LPA rounds)
  *   prebuilt  — the same 2 rounds with the symmetrized edge table
  *               ALREADY materialized outside the timed region; the
  *               delta vs `full` is exactly what a session pin of the
  *               vote-edge list could shift out of the gated timing
  *   lastnocache — `full` but without caching the FINAL round's labels
  *               (they are read once by the closing count — the cache
  *               write is pure overhead there)
  *
  * If `prebuilt` ≈ `full`, the rounds dominate and the cost is
  * inherent (iterative |E|-joins); a pin would buy nothing. If the
  * edge build dominates, a pin is still a single-consumer cost-shift
  * (VERDICT r9 item 1) — the number decides whether to argue for it.
  *
  * Usage: `runMain graft.LpaProbe [sfDir]` (default sf0.1, 32 cpus).
  */
object LpaProbe {

  import org.apache.spark.sql.expressions.Window
  import graft.engine.Caches.CacheOps

  private def symEdges(lineitem: DataFrame, minSupport: Int): DataFrame = {
    val e = graft.engine.Graph.coOrderEdges(lineitem)
      .filter(col("w") >= minSupport)
      .select(col("pa"), col("pb"))
    e.unionAll(e.select(col("pb").as("pa"), col("pa").as("pb")))
      .repartition(col("pb"))
      .sortWithinPartitions(col("pb"))
  }

  /** The committed rounds, parameterized by the edge table and whether
    * the final round's labels get cached.
    */
  private def rounds(sym: DataFrame, cacheLast: Boolean): DataFrame = {
    var labels = sym.select(col("pa").as("v")).distinct().withColumn("lbl", col("v"))
    for (r <- 1 to 2) {
      val votes = sym.as("s")
        .join(labels.as("l"), col("s.pb") === col("l.v"))
        .select(col("s.pa").as("v"), col("l.lbl").as("lbl"))
        .unionAll(labels)
      val next = votes
        .groupBy(col("v"), col("lbl"))
        .agg(count(lit(1)).as("n"))
        .withColumn(
          "rk",
          row_number().over(
            Window.partitionBy(col("v")).orderBy(col("n").desc, col("lbl").asc)))
        .filter(col("rk") === 1)
        .select(col("v"), col("lbl"))
      labels = if (r < 2 || cacheLast) next.cacheT() else next
    }
    labels
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).cast("long").as("n_members"))
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
    // build the shared coOrderEdges pin once, untimed, as the bench does
    graft.engine.Graph.coOrderEdges(li).count()

    def time(label: String)(run: () => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run()
        val s = (System.nanoTime() - t0) / 1e9
        graft.engine.Caches.freeTransient(spark)
        s
      }
      println(f"$label%-12s warm=${runs.head}%.2fs best2=${runs.tail.min}%.2fs")
    }

    for (_ <- 1 to 2) {
      time("full") { () =>
        graft.engine.Graph.labelPropagation(li).count()
      }
      time("lastnocache") { () =>
        rounds(symEdges(li, 2).cacheT(), cacheLast = false).count()
      }
      // prebuilt: edge table materialized OUTSIDE the timing; freed after
      val pre = symEdges(li, 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pre.count()
      time("prebuilt") { () => rounds(pre, cacheLast = true).count() }
      pre.unpersist()
    }
    spark.stop()
  }
}
