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
    base.count()

    def probe(name: String, copies: Int, expectPairs: Long): Boolean = {
      val docs = duplicated(base, copies)
      val nDocs = docs.count()
      val t0 = System.nanoTime()
      val pairs = graft.text.Dedup
        .minhashNearDups(docs, minEstJaccard = 0.0)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val families = graft.text.Dedup.exact(docs)
        .filter(col("n_copies") === copies.toLong)
        .count()
      val exactSecs = (System.nanoTime() - t1) / 1e9
      graft.engine.Views.free(spark)
      graft.engine.Caches.freeTransient(spark)
      val ok = pairs == expectPairs && families == 100L
      println(
        s"""{"probe":"$name","copies":$copies,"n_docs":$nDocs,"cand_pairs":$pairs,""" +
          s""""expect_pairs":$expectPairs,"neardup_sec":${f"$secs%.2f"},""" +
          s""""exact_families":$families,"exact_sec":${f"$exactSecs%.2f"},"ok":$ok}""")
      ok
    }

    val cap = graft.text.Dedup.MaxCandidateBucket
    // below the cap: full within-family quadratic, count verified exactly
    val okBelow = probe("below_cap", 200, 100L * (200L * 199L / 2L))
    // above the cap: 15x the documents, ~zero candidates — the runtime
    // must scale with documents (signatures), not with C(copies, 2)
    val okAbove = probe("above_cap", 3000, 0L)
    println(s"""{"probe":"config","cap":$cap,"base_docs":100,"sf":"$sfDir"}""")
    spark.stop()
    if (!(okBelow && okAbove)) sys.exit(1)
  }
}
