package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`, 64-dim in the fixtures).
  *
  * Two paths, as a 100 TB pipeline would have them:
  *  - [[cosineTopK]] — brute-force exact baseline: broadcast the (small)
  *    query set against the full corpus; one scan, no shuffle of the
  *    corpus, per-partition partial top-k via the `row_number <= k`
  *    window shape (WindowGroupLimit pushdown).
  *  - [[lshBucketTopK]] — the scale path: random-hyperplane LSH buckets
  *    computed map-side from deterministic plane constants; candidate
  *    search happens only inside each bucket (equi-join on bucket id),
  *    turning O(N·Q) into O(N·Q / 2^bits) at a recall cost.
  *
  * Determinism: dot products are computed over `array<double>` with a
  * sequential fold (same order as any scalar loop); planes come from a
  * fixed LCG, not an RNG seed-at-runtime.
  */
object Similarity {

  /** Sequential-fold dot product over double arrays — `aggregate` +
    * `zip_with`, whole-stage codegen'd, bit-identical to a scalar loop.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** cosine(a, b) with the exact association `dot/(sqrt(aa)*sqrt(bb))` —
    * mirrored textually in the DuckDB oracle.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Exact top-k cosine neighbors for each query vector (`vec_id <
    * numQueries`), ranked on the cent-rounded similarity with vec_id
    * tie-break so ranking is stable across engines.
    */
  def cosineTopK(embeddings: DataFrame, numQueries: Int, k: Int): DataFrame = {
    val q = embeddings
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val pairs = embeddings
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(
        col("qid"),
        col("vec_id").as("nid"),
        round(cosine(col("qe"), col("embedding")), 3).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos_sim"))
  }

  /** Deterministic pseudo-random hyperplanes (fixed LCG — no runtime
    * RNG), one array<double> per plane.
    */
  def planes(numPlanes: Int, dim: Int): Seq[Array[Double]] = {
    var state = 0x5DEECE66DL
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Seq.fill(numPlanes)(Array.fill(dim)(next()))
  }

  /** LSH bucket id: sign bits of the vector's projection onto each plane. */
  def bucketId(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        when(dot(asDouble(vec), typedLit(p.toSeq)) > 0, lit(1 << i)).otherwise(lit(0))
      }
      .reduce((a, b) => a.bitwiseOR(b))

  /** Bucketed ANN: same contract as [[cosineTopK]] but candidates are
    * restricted to the query's LSH bucket (equi-join on bucket id). With
    * `numPlanes` bits the corpus side shrinks ~2^numPlanes-fold; recall
    * is traded for that (multi-probe would re-add neighbor buckets).
    */
  def lshBucketTopK(embeddings: DataFrame, numQueries: Int, k: Int, numPlanes: Int = 4): DataFrame = {
    val ps = planes(numPlanes, 64)
    val bucketed = embeddings.withColumn("bucket", bucketId(col("embedding"), ps))
    val q = bucketed
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
    val pairs = bucketed
      .join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(
        col("qid"),
        col("vec_id").as("nid"),
        round(cosine(col("qe"), col("embedding")), 3).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos_sim"))
  }

  /** Embedding-cosine near-duplicate pairs, IVF-style blocked by `label`
    * (the fixture's cluster id): pairs within a block with similarity ≥
    * `minCos`. At scale the block key comes from a coarse quantizer; the
    * join/filter shape is identical.
    */
  def cosineNearDups(embeddings: DataFrame, minCos: Double): DataFrame = {
    val a = embeddings.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("label"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", round(cosine(col("emb_a"), col("emb_b")), 3))
      .filter(col("cos_sim") >= minCos)
      .select(col("label"), col("vec_a"), col("vec_b"), col("cos_sim"))
  }
}
