package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Dedup

/** Round-7: the stop-bucket cap on banded candidate generation
  * ([[Dedup.MaxCandidateBucket]]) — a degenerate duplicated-document
  * family ABOVE the cap must emit zero candidates (instead of C(n,2)
  * pair blow-up), while a family BELOW the cap still pairs exactly, and
  * the exact-hash pre-pass still reports the dropped family (the
  * documented composition: exact dedup removes identical-text families
  * BEFORE near-dup detection, so dropping their band buckets costs no
  * recall a production pipeline relies on).
  */
class StopBucketCapSpec extends AnyFunSuite {
  import SparkTestSession._

  // 1100 identical docs (> MaxCandidateBucket = 1024): every band/chunk
  // bucket they form is over the cap. 40 identical docs (≪ cap) from a
  // disjoint vocabulary: their buckets survive and must pair completely.
  private def degenerateDocs() = {
    import spark.implicits._
    val big = (0L until 1100L).map(i => (i,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"))
    val small = (5000L until 5040L).map(i => (i,
      "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen"))
    (big ++ small).toDF("doc_id", "text")
  }

  private val smallPairs = 40 * 39 / 2 // C(40,2)

  test("minhash band buckets above the cap emit no candidates; below-cap families pair completely") {
    val pairs = Dedup.minhashNearDups(degenerateDocs(), minEstJaccard = 0.0).collect()
    assert(pairs.length == smallPairs,
      s"expected C(40,2)=$smallPairs small-family pairs only, got ${pairs.length}")
    assert(pairs.forall(r =>
      r.getAs[Long]("doc_a") >= 5000L && r.getAs[Long]("doc_b") >= 5000L),
      "no candidate may come from the over-cap family")
    assert(pairs.forall(_.getAs[Double]("est_jaccard") == 1.0))
  }

  test("simhash chunk buckets above the cap emit no candidates; below-cap families pair completely") {
    // maxHamming = 3 is the banding's structural ceiling (require-guarded);
    // the families here are byte-identical so every candidate is hamming 0
    val pairs = Dedup.simhashNearDups(degenerateDocs(), maxHamming = 3).collect()
    assert(pairs.length == smallPairs,
      s"expected C(40,2)=$smallPairs small-family pairs only, got ${pairs.length}")
    assert(pairs.forall(r =>
      r.getAs[Long]("doc_a") >= 5000L && r.getAs[Long]("doc_b") >= 5000L))
    assert(pairs.forall(_.getAs[Long]("hamming") == 0L))
  }

  test("exact-hash pre-pass still reports the dropped family (composition)") {
    val sizes = Dedup.exact(degenerateDocs()).collect()
      .map(_.getAs[Long]("n_copies")).sorted.toSeq
    assert(sizes == Seq(40L, 1100L))
  }

  test("stopBucketSweep emits zero rows on an empty corpus (oracle parity)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.stopBucketSweep(empty).count() == 0L)
  }

  test("ingest screen drops over-cap corpus buckets but still matches below-cap families") {
    import spark.implicits._
    // one probe doc per family: the big-family probe's only collisions
    // are stop buckets (admitted); the small-family probe must match
    val batch = Seq(
      (900000L,
        "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
          "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (900001L,
        "one two three four five six seven eight nine ten " +
          "eleven twelve thirteen fourteen fifteen sixteen"))
      .toDF("doc_id", "text")
    val got = Dedup.screenAgainst(batch, degenerateDocs()).collect()
      .map(r => r.getAs[Long]("new_doc") -> r.getAs[Boolean]("admitted")).toMap
    assert(got(900000L), "probe against the over-cap family must be admitted (stop bucket)")
    assert(!got(900001L), "probe against the below-cap family must match")
  }
}
