package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.text.{Dedup, TextAnalysis}

/** Round-3 text-pipeline batch: PII redaction, boilerplate-span
  * statistics, per-source HHI concentration, and asymmetric n-gram
  * containment.
  */
class TextPipelineOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val sfDir = "/root/testdata/sf0.001"

  test("piiScrub counts and redacts exactly the synthesized PII") {
    val out = TextAnalysis.piiScrub(Tables.documents(spark, sfDir)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") == (if (id % 7 == 0) 1L else 0L), s"doc $id emails")
      assert(r.getAs[Long]("n_phones") == (if (id % 11 == 0) 1L else 0L), s"doc $id phones")
    }
    // redaction really rewrites the text: scrubbed docs differ from clean docs' raw md5
    val raw = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("raw_md5")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("raw_md5")).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 7 != 0 && id % 11 != 0) assert(r.getAs[String]("clean_md5") == raw(id))
      else assert(r.getAs[String]("clean_md5") != raw(id))
    }
  }

  test("piiScrub leaves no matchable PII in the cleaned text") {
    // re-scrubbing the clean text must find zero patterns: verify on a
    // reconstructed clean column rather than the md5
    val docs = Tables.documents(spark, sfDir)
    val clean = docs
      .withColumn("aug", expr("""concat(text,
           CASE WHEN doc_id % 7 = 0 THEN concat(' contact u', CAST(doc_id AS STRING), '@example.com') ELSE '' END,
           CASE WHEN doc_id % 11 = 0 THEN concat(' call 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')) ELSE '' END)"""))
      .withColumn("clean", regexp_replace(regexp_replace(col("aug"), "[a-z0-9]+@[a-z0-9.]+", "<EMAIL>"), "\\b555-[0-9]{4}\\b", "<PHONE>"))
    val residual = clean
      .filter(regexp_count(col("clean"), lit("[a-z0-9]+@[a-z0-9.]+")) > 0 ||
        regexp_count(col("clean"), lit("\\b555-[0-9]{4}\\b")) > 0)
      .count()
    assert(residual == 0)
  }

  test("boilerplateStats ratios are consistent and bounded") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextAnalysis.boilerplateStats(docs, 0.05).collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      val (n, b) = (r.getAs[Long]("n_spans"), r.getAs[Long]("n_boiler"))
      assert(b >= 0 && b <= n)
      assert(r.getAs[Double]("boiler_ratio") == b.toDouble / n.toDouble)
    }
    // the 5% threshold is non-degenerate on the fixtures: some spans are
    // common, some are not
    assert(out.exists(_.getAs[Long]("n_boiler") > 0))
    assert(out.exists(r => r.getAs[Long]("n_boiler") < r.getAs[Long]("n_spans")))
  }

  test("sourceHhi equals a driver-side recomputation and brackets 1/V..1") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextAnalysis.sourceHhi(docs).collect()
    val toks = docs.select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("tok")))
      .groupBy(_._1)
    got.foreach { r =>
      val counts = toks(r.getAs[String]("source")).groupBy(_._2).map(_._2.length.toLong)
      val total = counts.sum
      val ssq = counts.map(c => c * c).sum
      assert(r.getAs[Long]("n_distinct") == counts.size.toLong)
      assert(r.getAs[Long]("n_tokens") == total)
      val hhi = r.getAs[Double]("hhi")
      assert(hhi == ssq.toDouble / (total.toDouble * total.toDouble))
      assert(hhi >= 1.0 / counts.size && hhi <= 1.0)
    }
  }

  test("winnowCopyPairs matches brute-force shared-fingerprint counting") {
    val docs = Tables.documents(spark, sfDir)
    val minShared = 20 // lower than the query's 40: sf0.001 docs are fewer
    val got = TextAnalysis.winnowCopyPairs(docs, minShared).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("overlap")))
      .toMap
    val fps = docs
      .select(col("doc_id"), graft.functions.VectorFunctions.winnow(col("text"), 8, 4).as("fps"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSet)
    // mirror the ubiquitous-fingerprint cap: drop fps in > 5% of docs
    val dfCap = fps.length * 0.05
    val dfOf = fps.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.length }
    val rare = fps.map { case (d, f) => d -> f.filter(dfOf(_) <= dfCap) }
    val expected = (for {
      ((da, ra), i) <- rare.zipWithIndex
      (db, rb) <- rare.drop(i + 1)
      shared = ra.intersect(rb).size.toLong
      if shared >= minShared
      fa = fps.find(_._1 == da).get._2
      fb = fps.find(_._1 == db).get._2
    } yield (math.min(da, db), math.max(da, db)) ->
      (shared, shared.toDouble / math.min(fa.size, fb.size).toDouble)).toMap
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must contain copy candidates at this threshold")
    got.values.foreach { case (_, overlap) => assert(overlap > 0 && overlap <= 1.0) }
  }

  test("winnowCopyPairs pack guard: 2^31-1 ids run, 2^31 fails loudly") {
    import spark.implicits._
    // shared long text so the pair survives any threshold path
    val text = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " +
      "eiusmod tempor incididunt ut labore et dolore magna aliqua ") * 3
    // 48 distinct filler docs so the identical pair's fingerprints (df=2)
    // survive the 5%-of-corpus ubiquitous-fp cap (2 <= 0.05*50)
    val filler = (100L until 148L).map(i =>
      (i, s"doc$i${i}unique${i}filler${i}body${i}text${i}content${i}end$i"))
    def run(idA: Long): Boolean = {
      val docs = (Seq((idA, text), (5L, text)) ++ filler).toDF("doc_id", "text")
      TextAnalysis.winnowCopyPairs(docs, 1).collect().exists(r =>
        r.getAs[Long]("doc_a") == math.min(idA, 5L) &&
          r.getAs[Long]("doc_b") == math.max(idA, 5L))
    }
    // boundary id packs within the signed long: must run and find the pair
    assert(run(2147483647L))
    // one past the boundary would wrap the signed pack: the in-plan
    // assert_true guard must abort the job, not mis-unpack silently
    val e = intercept[Exception] { run(2147483648L) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("31 bits")), messages(e).mkString(" | "))
  }

  test("vocabGrowth ends at the full vocabulary and is strictly increasing") {
    val docs = Tables.documents(spark, sfDir)
    val out = TextAnalysis.vocabGrowth(docs).collect().sortBy(_.getAs[Long]("doc_id"))
    val fullVocab = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .distinct().count()
    assert(out.last.getAs[Long]("vocab_size") == fullVocab)
    assert(out.map(_.getAs[Long]("n_new_tokens")).sum == fullVocab)
    val sizes = out.map(_.getAs[Long]("vocab_size"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a < b })
    // cumulative equals the running sum of increments
    assert(sizes.toSeq == out.map(_.getAs[Long]("n_new_tokens")).scanLeft(0L)(_ + _).tail.toSeq)
  }

  test("minhashAccuracy reports exact Jaccard for every band candidate") {
    val docs = Tables.documents(spark, sfDir)
    val out = Dedup.minhashAccuracy(docs).collect()
    assert(out.nonEmpty)
    val grams = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        array_distinct(expr("transform(sequence(1, greatest(size(toks) - 2, 1)), i -> concat_ws(' ', slice(toks, i, 3)))")).as("sh"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toSet)
      .toMap
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (ga, gb) = (grams(a), grams(b))
      val exact = ga.intersect(gb).size.toDouble / (ga.size + gb.size - ga.intersect(gb).size).toDouble
      assert(r.getAs[Double]("exact_jaccard") == exact, s"($a,$b)")
      assert(r.getAs[Double]("abs_err") ==
        math.abs(r.getAs[Double]("est_jaccard") - exact))
      assert(r.getAs[Double]("est_jaccard") >= 0.25)
    }
    // the 32-hash estimator should track exact jaccard on average
    val meanErr = out.map(_.getAs[Double]("abs_err")).sum / out.length
    assert(meanErr < 0.25, s"mean |est - exact| = $meanErr")
  }

  test("ngramContainment matches brute-force same-source containment") {
    val docs = Tables.documents(spark, sfDir)
    val got = Dedup.ngramContainment(docs, 0.6).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("containment"))
      .toMap
    val grams = docs
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .select(col("source"), col("doc_id"),
        array_distinct(expr("transform(sequence(1, greatest(size(toks) - 2, 1)), i -> concat_ws(' ', slice(toks, i, 3)))")).as("sh"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getSeq[String](2).toSet))
    val expected = (for {
      (sa, da, ga) <- grams
      (sb, db, gb) <- grams
      if sa == sb && da != db
      c = ga.intersect(gb).size.toDouble / ga.size.toDouble
      if c >= 0.6
    } yield (da, db) -> c).toMap
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must make containment non-degenerate")
    // asymmetry is observable: a direction-dependent membership or value
    // (|A| ≠ |B| makes C(A→B) ≠ C(B→A) even when both qualify)
    assert(expected.exists { case ((a, b), c) =>
      expected.get((b, a)).forall(_ != c)
    })
  }
}
