package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executable stress probe for the round-7 stop-bucket cap
  * ([[graft.text.Dedup.MaxCandidateBucket]]): builds degenerate
  * duplicated-document corpora from the fixture and measures
  * [[graft.text.Dedup.minhashNearDups]] on both sides of the cap.
  *
  *  - BELOW the cap (every family smaller than the cap): candidate
  *    generation is the full within-family quadratic — families ×
  *    C(copies, 2) pairs — the honest cost of near-dup detection on a
  *    duplicate-heavy corpus, and the probe verifies the count exactly.
  *  - ABOVE the cap (every family bigger than the cap): every band
  *    bucket is a stop bucket and candidates collapse to ~zero, so a
  *    corpus 15x the size costs only its LINEAR signature work (the
  *    uncapped pair volume would be 100 × C(3000,2) = 450M pairs, 226x
  *    the below-cap probe's) — the measured form of the C(n,2) blow-up
  *    the cap exists to prevent. The probe also runs the
  *    byte-identical composition: [[graft.text.Dedup.exact]] still
  *    reports every over-cap family (these probes build byte-identical
  *    copies; the cap's residual exposure on normalization-variant
  *    families is documented at
  *    [[graft.text.Dedup.MaxCandidateBucket]]).
  *
  * Usage: `runMain graft.CapStressProbe [sfDir]` (defaults to sf0.01).
  * Prints one JSON line per probe and ASSERTS the candidate and family
  * counts — exits nonzero on any mismatch, so a cap-logic regression
  * fails the run instead of hiding in a printed field. Numbers land in
  * BASELINE.md.
  */
object CapStressProbe {

  /** `copies` exact duplicates of each base doc, ids remapped to be
    * unique (base doc_id × 10^6 + copy index).
    */
  private def duplicated(base: DataFrame, copies: Int): DataFrame =
    base
      .crossJoin(broadcast(
        base.sparkSession.range(copies.toLong).select(col("id").as("copy"))))
      .select(
        (col("doc_id") * 1000000L + col("copy")).as("doc_id"),
        col("text"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.engine.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .limit(100)
      .cache()

    // The exact-family expectation assumes the base docs are pairwise
    // byte-distinct; verify instead of assuming, so a fixture change
    // (two identical base texts) reads as a fixture artifact, not a
    // cap-logic regression. (The count also materializes the cache.)
    val nBase = base.count()
    val nDistinctBase = base.select(col("text")).distinct().count()
    if (nDistinctBase != nBase)
      println(s"""{"probe":"fixture_warning","base_docs":$nBase,"distinct_texts":$nDistinctBase}""")

    def probe(name: String, copies: Int, expectWithinPairs: Long): Boolean = {
      val docs = duplicated(base, copies)
      val nDocs = docs.count()
      val t0 = System.nanoTime()
      // Split candidates into within-family (doc ids from the same base
      // doc) and cross-family: within-family counts are exactly
      // predictable (below cap: the full quadratic; above cap: zero),
      // while cross-family pairs can arise from a legitimate band
      // collision between two base docs — report them separately so a
      // fixture-similarity artifact is distinguishable from a real cap
      // regression instead of failing the gate with a misleading signal.
      val split = graft.text.Dedup
        .minhashNearDups(docs, minEstJaccard = 0.0)
        .agg(
          count(lit(1)).as("n"),
          sum(when(expr("doc_a div 1000000 <> doc_b div 1000000"), 1L).otherwise(0L)).as("cross"))
        .collect()(0)
      val pairs = split.getLong(0)
      val crossPairs = if (split.isNullAt(1)) 0L else split.getLong(1)
      val withinPairs = pairs - crossPairs
      val secs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val families = graft.text.Dedup.exact(docs)
        .filter(col("n_copies") === copies.toLong)
        .count()
      val exactSecs = (System.nanoTime() - t1) / 1e9
      graft.engine.Views.free(spark)
      graft.engine.Caches.freeTransient(spark)
      // Above the cap, cross-family collisions are swallowed too (a
      // merged bucket is even larger), so total must be zero there —
      // withinPairs == 0 == expect implies pairs == 0 unless crossPairs
      // went negative, which the agg cannot produce.
      // The families == nBase gate only holds when base texts are
      // pairwise distinct (identical base texts merge exact families
      // into one of 2×copies); with the fixture_warning printed above,
      // that case reports instead of failing as a fake cap regression.
      val familiesOk = nDistinctBase != nBase || families == nBase
      val ok = withinPairs == expectWithinPairs && familiesOk
      println(
        s"""{"probe":"$name","copies":$copies,"n_docs":$nDocs,"cand_pairs":$pairs,""" +
          s""""within_pairs":$withinPairs,"cross_pairs":$crossPairs,""" +
          s""""expect_within_pairs":$expectWithinPairs,"neardup_sec":${f"$secs%.2f"},""" +
          s""""exact_families":$families,"exact_sec":${f"$exactSecs%.2f"},"ok":$ok}""")
      ok
    }

    val cap = graft.text.Dedup.MaxCandidateBucket
    // below the cap: full within-family quadratic, count verified exactly
    val okBelow = probe("below_cap", 200, nBase * (200L * 199L / 2L))
    // above the cap: 15x the documents, ~zero candidates — the runtime
    // must scale with documents (signatures), not with C(copies, 2)
    val okAbove = probe("above_cap", 3000, 0L)
    println(s"""{"probe":"config","cap":$cap,"base_docs":$nBase,"sf":"$sfDir"}""")
    spark.stop()
    if (!(okBelow && okAbove)) sys.exit(1)
  }
}
