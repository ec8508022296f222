package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Shared scalar kernels for the native expressions — called from both
  * interpreted eval and generated code (Scala top-level objects emit
  * static forwarders, so codegen can reference these as plain static
  * Java calls and whole-stage codegen stays fused around them).
  */
object ExprKernels {

  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        // token hash = first 8 md5 bytes, big-endian — the same 64 bits
        // any engine parses from the hex digest, making the signature
        // (and the downstream hamming pairs) oracle-reproducible
        val d = md.digest(arr.getUTF8String(i).getBytes)
        md.reset()
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Modulus of the MinHash universal family: the Mersenne prime 2³¹−1.
    * Chosen so `(h1 + j·h2) mod p` stays below 2³⁶ before the reduction —
    * computable in overflow-CHECKED 64-bit arithmetic (DuckDB BIGINT
    * raises on wrap, so the oracle can run the identical formula). A
    * wrapping 64-bit family is NOT portable; a non-modular 32-bit linear
    * family degenerates (for large j the j·h2 term dominates and every
    * position's argmin collapses onto the min-h2 shingle).
    */
  val MinHashP: Long = 2147483647L

  /** Returns null when the input has no non-null shingle — a signature
    * over the empty set is undefined, and DuckDB's `list_min` over an
    * empty list yields NULL the same way. (Without this the Long.MaxValue
    * seed would leak out of the documented `[0, p)` range.)
    */
  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var saw = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        saw = true
        // h1/h2 = first/second 4 bytes of md5 (big-endian, same value any
        // engine parses from the hex digest), reduced mod p
        val d = md.digest(arr.getUTF8String(i).getBytes)
        md.reset()
        val h1 = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % MinHashP
        val h2 = (((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) % MinHashP
        var j = 0
        var g = h1
        while (j < numHashes) {
          if (g < mins(j)) mins(j) = g
          g = (g + h2) % MinHashP // g = (h1 + j·h2) mod p
          j += 1
        }
      }
      i += 1
    }
    if (!saw) null else ArrayData.toArrayData(mins)
  }

  def winnow(text: String, k: Int, w: Int): ArrayData = {
    // CODE POINTS, not UTF-16 units — the same alignment frameEnergy
    // carries: the oracle's ascii(substring(text, i, 1)) and length()
    // are codepoint-based, so a charAt loop mis-hashes any gram touching
    // a surrogate pair (and mis-counts the gram total). BMP text — all
    // driver fixtures — is bit-identical under both spellings. A code
    // point tops out at 0x10FFFF < 2^21, so cp·pows(j) < 2^52 keeps the
    // per-term arithmetic exact.
    val cps = text.codePoints().toArray
    val len = cps.length
    val n = math.max(len - k + 1, 1)
    // Polynomial k-gram hash mod 2^31−1, base 256: per-term modular
    // reduction keeps every intermediate < 2^52, so the arithmetic is
    // exact BIGINT on any engine (the oracle mirrors it with ascii() and
    // precomputed 256^j mod p constants). ~100× cheaper than the md5
    // digest per position this replaces — the gram hash ran once per
    // CHARACTER of the corpus and dominated q_copy_detect/q_winnow.
    val pows = new Array[Long](k) // pows(j) = 256^(k-1-j) mod p
    pows(k - 1) = 1L
    var pj = k - 2
    while (pj >= 0) { pows(pj) = (pows(pj + 1) << 8) % MinHashP; pj -= 1 }
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      var s = 0L
      var j = 0
      val end = math.min(k, len - i)
      while (j < end) {
        s += (cps(i + j).toLong * pows(j)) % MinHashP
        j += 1
      }
      hashes(i) = s % MinHashP
      i += 1
    }
    val nWin = math.max(n - w + 1, 1)
    val selected = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j < nWin) {
      var m = Long.MaxValue
      var x = j
      val end = math.min(j + w, n)
      while (x < end) {
        if (hashes(x) < m) m = hashes(x)
        x += 1
      }
      selected.add(m)
      j += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    ArrayData.toArrayData(out)
  }

  /** Content-defined-chunking boundary positions: every 1-based CODE
    * POINT position p in [8, len] where the 8-window rolling polynomial
    * hash Σ_{k=0..7} cp[p−k]·31ᵏ ≡ 0 (mod 64); empty below 8 code
    * points. Bit-for-bit the HOF spelling it replaces
    * (`filter(sequence(8, len), p -> (Σ element_at(ch, p−k)·31ᵏ) % 64 =
    * 0)` over `ch = transform(split(text, ''), c -> ascii(c))`): Spark's
    * `length`/`split('')`/`ascii` are all codepoint-based, code points
    * top out at 0x10FFFF so cp·31⁷ < 2⁵⁵ keeps every term exact in a
    * long, and all terms are non-negative so Java `%` equals SQL `%`.
    * One tight scalar loop per document instead of ~len interpreted
    * lambda evaluations of an 8-term `element_at` sum (higher-order
    * functions never enter whole-stage codegen) — the per-character
    * interpreted cost was q_cdc_chunking's entire tail standing.
    */
  def cdcBoundaries(text: String): ArrayData = {
    val cps = text.codePoints().toArray
    val len = cps.length
    if (len < 8) return ArrayData.toArrayData(Array.empty[Int])
    // w(k) = 31^k, k = 0..7 — exact in long (31^7 ≈ 2.75e10)
    val w = new Array[Long](8)
    w(0) = 1L
    var k = 1
    while (k < 8) { w(k) = w(k - 1) * 31L; k += 1 }
    val out = new java.util.ArrayList[Integer]()
    var p = 8
    while (p <= len) {
      var s = 0L
      var j = 0
      while (j < 8) {
        s += cps(p - 1 - j) * w(j) // element_at(ch, p − j), 1-based
        j += 1
      }
      if (s % 64L == 0L) out.add(p)
      p += 1
    }
    val arr = new Array[Int](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    ArrayData.toArrayData(arr)
  }

  /** One-pass byte-histogram entropy stats for a payload: returns
    * (n_bytes, n_distinct, ent_micro) where ent_micro = Σ over distinct
    * codes of round(c·ln(c)·10⁶) — the micronat-quantized Σ c·ln c term
    * of H = ln n − (Σ c·ln c)/n. Iterates CODEPOINTS to mirror
    * `ascii(substring(text, i, 1))` exactly; `Math.log` is the same
    * libm call Spark's `ln` makes and c·ln(c) ≥ 0, so `Math.round`
    * reproduces SQL `round` bit-for-bit here. Replaces an
    * explode-per-character + two-shuffle plan with zero shuffles — at
    * corpus scale the explode shuffled |corpus|·avg_len rows.
    */
  def byteEntropy(text: String): org.apache.spark.sql.catalyst.InternalRow = {
    val counts = new java.util.HashMap[Integer, Integer]()
    var n = 0L
    val it = text.codePoints().iterator()
    while (it.hasNext) {
      counts.merge(it.next(), 1, (a: Integer, b: Integer) => a + b)
      n += 1L
    }
    var ent = 0L
    val vs = counts.values().iterator()
    while (vs.hasNext) {
      val c = vs.next().toLong
      ent += Math.round(c.toDouble * Math.log(c.toDouble) * 1000000.0)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size().toLong, ent))
  }

  /** Per-frame energy of a payload: Σ code(c)² over consecutive frames
    * of `frame` chars (last frame may be short). Exact integer sums —
    * an engine without the kernel reproduces each element from ascii
    * codes. One tight scalar loop per row; the HOF spelling
    * (transform+aggregate per frame) interprets ~len lambda calls
    * per document.
    */
  def frameEnergy(text: String, frame: Int): ArrayData = {
    // CODE POINTS, not UTF-16 units: Spark's length() and the DuckDB
    // oracle's substring/ascii are codepoint-based, and the consumer
    // computes n_bytes = least(frame, length(text) − f·frame) from that
    // arithmetic — a UTF-16-framed kernel (the earlier charAt loop)
    // emitted MORE frames than length() predicts on non-BMP text, so
    // the tail frames read zero or negative n_bytes. BMP text (the
    // fixtures) is identical under both spellings.
    val cps = text.codePoints().toArray
    val len = cps.length
    val n = math.max((len + frame - 1) / frame, 1)
    val out = new Array[Long](n)
    var f = 0
    while (f < n) {
      var s = 0L
      var i = f * frame
      val end = math.min(i + frame, len)
      while (i < end) {
        val c = cps(i).toLong
        s += c * c
        i += 1
      }
      out(f) = s
      f += 1
    }
    ArrayData.toArrayData(out)
  }
}
