package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline — exact,
  * MinHash+LSH, SimHash, and blocked n-gram Jaccard — over `documents`.
  *
  * Scale design (the point of each shape):
  *  - exact: one hash-groupBy shuffle on a 64-bit key — the minimum
  *    possible; at 100 TB the md5 keys are computed map-side and only
  *    (key, doc_id) pairs shuffle.
  *  - MinHash+LSH: signatures are computed map-side per document (no
  *    shuffle), then candidate generation shuffles only (band_hash →
  *    doc_id) pairs — never full pairwise. The band join is an equi-join
  *    so Catalyst uses a shuffled hash/sort-merge join on band keys;
  *    pair verification stays inside each band bucket.
  *  - SimHash: one 64-bit signature per doc computed map-side from token
  *    hashes; near-dup candidates via banded 16-bit chunks (pigeonhole: a
  *    Hamming distance ≤ 3 pair shares at least one of 4 chunks).
  *  - n-gram Jaccard: exact verification restricted to candidate blocks
  *    (here: same `source`), the standard block-join shape.
  */
object Dedup {

  /** Word n-gram shingles (space-joined) of the text column. */
  private def shingles(n: Int) = {
    val toks = TextAnalysis.tokens(col("text"))
    // slice is 1-based; sequence(1, size-n+1) enumerates shingle starts
    expr(
      s"transform(sequence(1, greatest(size(split(trim(text), '\\\\s+')) - ${n - 1}, 1)), " +
        s"i -> concat_ws(' ', slice(split(trim(text), '\\\\s+'), i, $n)))")
  }

  /** Exact dedup: group identical texts (md5 key), keep the smallest
    * doc_id as canonical, report the group size.
    */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text").cast("binary")).as("text_md5"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum `xxhash64(shingle, seed)` over the document's distinct
    * 3-gram shingles. Computed entirely map-side.
    */
  def minhashSignatures(documents: DataFrame, numHashes: Int): DataFrame = {
    val sig = (0 until numHashes).map { i =>
      array_min(transform(col("sh"), s => xxhash64(s, lit(i)))).as(s"mh_$i")
    }
    documents
      .withColumn("sh", array_distinct(shingles(3)))
      .select(col("doc_id") +: sig: _*)
  }

  /** MinHash + LSH banding: `numBands` bands of `rowsPerBand` signature
    * rows; docs sharing any band bucket become candidates; candidates are
    * scored by estimated Jaccard = fraction of matching signature
    * positions, and pairs ≥ `minEstJaccard` are emitted.
    */
  def minhashNearDups(
      documents: DataFrame,
      numBands: Int = 8,
      rowsPerBand: Int = 4,
      minEstJaccard: Double = 0.5): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val sigs = minhashSignatures(documents, numHashes).cache()
    val sigArray = array((0 until numHashes).map(i => col(s"mh_$i")): _*)
    val withBands = sigs
      .withColumn("sig", sigArray)
      .select(
        col("doc_id"),
        col("sig"),
        posexplode(
          array((0 until numBands).map(b =>
            xxhash64(concat_ws("_", (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*))): _*))
          .as(Seq("band", "band_hash")))
    val a = withBands.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = withBands.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn(
        "est_jaccard",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / cast(size(sig_a) as double)"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
  }

  /** SimHash (64-bit): per token-hash bit, vote +1/-1; the sign of each
    * bit's vote total forms the signature bit. One aggregation per doc.
    */
  def simhash(documents: DataFrame): DataFrame = {
    val toks = documents.select(
      col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))
    val withHash = toks.withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"v_$j")
    }
    val votes = withHash.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
    val sig = (0 until 64)
      .map(j => when(col(s"v_$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`, found
    * via 16-bit chunk banding (pigeonhole over 4 chunks ⊢ dist ≤ 3).
    */
  def simhashNearDups(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhash(documents).cache()
    val chunked = sigs.select(
      col("doc_id"),
      col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "chunk_val")))
    val a = chunked.select(col("chunk"), col("chunk_val"), col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"), col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity over candidate blocks (same
    * `source`) — the verification stage a MinHash pass would feed at
    * scale. SQL-mirrorable: emitted pairs carry a raw per-row double
    * division (bit-exact across engines).
    */
  def ngramJaccard(documents: DataFrame, minJaccard: Double): DataFrame = {
    val grams = documents
      .withColumn("grams", array_distinct(shingles(3)))
      .select(col("doc_id"), col("source"), col("grams"))
    val a = grams.select(col("source"), col("doc_id").as("doc_a"), col("grams").as("grams_a"))
    val b = grams.select(col("source"), col("doc_id").as("doc_b"), col("grams").as("grams_b"))
    a.join(b, Seq("source"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("source"), col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
