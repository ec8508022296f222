package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the hot loop of similarity search: a
  * dot product over two `array<double>` columns.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0d, _+_)`: that shape
  * materializes an intermediate 64-element array per row pair and walks
  * higher-order-function lambdas; this expression compiles (doGenCode) to
  * a tight scalar loop over the two ArrayData buffers — no allocation, no
  * virtual calls — inside whole-stage codegen. Summation order is the
  * same sequential left-to-right fold, so results are bit-identical to
  * the HOF form (and to the DuckDB oracle's loop).
  *
  * Null handling: null-intolerant on the array arguments (null array →
  * null). Null *elements* are not expected (embedding vectors are dense);
  * they would read as 0.0 rather than propagate — acceptable for this
  * domain, documented here.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers must supply array<double> on both sides (cast upstream once);
  // no ExpectsInputTypes because AbstractDataType is private[sql].
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native SimHash-64 over a token array: per token, a 64-bit hash (first
  * 8 md5 bytes, big-endian — portable: any engine with md5 parses the
  * identical bits from the hex digest); per bit, ±1 vote; sign of each
  * vote total forms the signature bit.
  *
  * Replaces an explode + groupBy(doc) + 64 conditional-sum aggregation —
  * i.e. a full shuffle of every token — with one pass per row, map-side.
  * CodegenFallback: the expression is evaluated once per document (not
  * per pair), so interpreted eval is fine; a doGenCode loop is the
  * follow-up if profiles ever show it hot.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprKernels.simhash64($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native MinHash signature over a shingle array: `numHashes` minima of
  * the universal hash family `g_i(x) = (h1(x) + i·h2(x)) mod (2³¹−1)`
  * (Broder-style two base hashes instead of `numHashes` independent
  * string hashes — one md5 digest per shingle, and one pass over the
  * shingles instead of `numHashes` array materializations). The base
  * hashes come from the md5 digest and the reduction stays within checked
  * 64-bit arithmetic, so any engine with md5 reproduces the signature
  * bit-for-bit (see [[ExprKernels.MinHashP]]); that makes the LSH
  * pipeline oracle-checkable end to end. CodegenFallback: evaluated once
  * per document.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // Nullable beyond null-in→null-out: an empty / all-null shingle array
  // yields NULL (the signature of the empty set is undefined; DuckDB's
  // list_min over an empty list agrees) — see ExprKernels.minhash.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.minhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        ${ev.value} = graft.functions.ExprKernels.minhash($a, $numHashes);
        ${ev.isNull} = ${ev.value} == null;
      """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * hash every character k-gram (polynomial hash mod 2^31−1, base 256 —
  * portable: exact integer arithmetic any engine reproduces from ascii
  * codes), slide a window of `w`
  * hashes, keep each window's minimum, return the distinct minima sorted.
  * The selected set is position-independent and robust to local edits —
  * the standard plagiarism/near-dup fingerprint.
  *
  * One pass per document, map-side (CodegenFallback is fine at one eval
  * per row). Short texts (< k chars) hash as a single gram, mirroring
  * `substring`'s clamping in the SQL oracle.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  // validate at plan-construction time, once — unguarded, k <= 0 indexes
  // pows(k-1) at -1 / allocates a negative array DEEP inside executor
  // tasks, failing the job with an opaque task error instead of this
  // message (the patternMatchStream require(m > 0) convention)
  require(k > 0 && w > 0, s"graft_winnow requires k > 0 and w > 0, got k=$k w=$w")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.winnow(input.toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprKernels.winnow($a.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-frame payload energy (Σ ascii-code² per `frame`-char frame) — the
  * feature-extraction kernel for the opaque-payload multimodal path: a
  * codegen'd scalar loop per row in place of the interpreted
  * transform+aggregate HOF spelling. Exact integer sums, reproducible by
  * any engine from ascii codes.
  */
case class FrameEnergy(child: Expression, frame: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  // same plan-construction-time guard as [[Winnow]]: frame = 0 divides
  // by zero inside executor tasks, negative frames allocate garbage
  require(frame > 0, s"graft_frame_energy requires frame > 0, got $frame")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_frame_energy"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.frameEnergy(input.toString, frame)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprKernels.frameEnergy($a.toString(), $frame)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined-chunking boundary positions over a text payload —
  * `array<int>` of the 1-based codepoint positions where the 8-window
  * rolling polynomial hash is ≡ 0 mod 64; see
  * [[ExprKernels.cdcBoundaries]]. A codegen'd scalar loop per row in
  * place of a `filter(sequence, …)` higher-order lambda that evaluated
  * an interpreted 8-term `element_at` sum per character; exact
  * integers, reproducible by any engine from ascii codes.
  */
case class CdcBoundaries(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.cdcBoundaries(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprKernels.cdcBoundaries($a.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass byte-entropy sufficient statistics over a text payload —
  * struct(n_bytes, n_distinct, ent_micro); see
  * [[ExprKernels.byteEntropy]]. A codegen'd scalar loop per row in
  * place of an explode-per-character plan (which shuffles corpus×len
  * rows); exact integers, reproducible by any engine from codepoints.
  */
case class ByteEntropyStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_bytes", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("ent_micro", org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_byte_entropy"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.byteEntropy(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ExprKernels.byteEntropy($a.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid (IVF coarse-quantizer) cell id: index of the L2-
  * nearest centroid, first match on ties. Distances expand as
  * `v·v − 2·v·c + c·c` with sequential folds — the exact arithmetic an
  * external engine reproduces from centroid literals.
  *
  * A native expression instead of `array_position(dists, array_min(
  * dists))` over an array of per-centroid literal dot products: that
  * shape inlines numCells × dim literal elements into generated code and
  * evaluates the distance array twice; this is one interpreted call per
  * row (CodegenFallback via eval — the expression is evaluated once per
  * vector, not per pair).
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ivf_cell"

  private lazy val cs: Array[Array[Double]] = centroids.map(_.toArray).toArray
  private lazy val cc: Array[Double] = cs.map(c => c.map(x => x * x).sum)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { vv += v.getDouble(i) * v.getDouble(i); i += 1 }
    var best = Double.MaxValue
    var bestIdx = 0
    var c = 0
    while (c < cs.length) {
      val cd = cs(c)
      val m = math.min(n, cd.length)
      var dp = 0.0
      var j = 0
      while (j < m) { dp += v.getDouble(j) * cd(j); j += 1 }
      val d = vv - 2.0 * dp + cc(c)
      if (d < best) { best = d; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Squared L2 distance to the NEAREST of the literal `centroids` — the
  * value [[NearestCentroid]] minimizes, exposed for quantizer-distortion
  * audits. Identical accumulation order (per-element fold, then
  * `vv − 2·dp + cc`), so the double is reproducible by any engine that
  * evaluates the same three dot products left-to-right.
  */
case class NearestCentroidDist(child: Expression, centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ivf_dist"

  private lazy val cs: Array[Array[Double]] = centroids.map(_.toArray).toArray
  private lazy val cc: Array[Double] = cs.map(c => c.map(x => x * x).sum)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { vv += v.getDouble(i) * v.getDouble(i); i += 1 }
    var best = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val cd = cs(c)
      val m = math.min(n, cd.length)
      var dp = 0.0
      var j = 0
      while (j < m) { dp += v.getDouble(j) * cd(j); j += 1 }
      val d = vv - 2.0 * dp + cc(c)
      if (d < best) { best = d }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native integer squared L2 distance over two `array<bigint>` columns
  * (milli-quantized embeddings): Σ (x−y)². Replaces the interpreted
  * higher-order-function spelling `aggregate(zip_with(a, b,
  * (x,y)->(x−y)*(x−y)), 0L, _+_)` in the all-pairs hot loops — HOF
  * lambdas do NOT participate in whole-stage codegen and allocate an
  * intermediate array per pair; this compiles to a tight long loop.
  * Integer math → result independent of summation order, so swapping
  * it in cannot change any oracle hash.
  */
case class SqDistMilli(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native integer dot product over two `array<bigint>` columns — the
  * BIGINT twin of [[DotProduct]], for the milli/sign grids where the
  * engine keeps arithmetic exact. Same codegen rationale as
  * [[SqDistMilli]].
  */
case class DotMilli(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot_milli"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native signature-agreement count over two `array<bigint>` MinHash
  * signatures: the number of positions carrying the same value — the
  * numerator of the LSH Jaccard estimate. Replaces the interpreted
  * `size(filter(zip_with(a, b, (x,y) -> x = y), v -> v))` spelling on
  * the per-candidate verify hot path: HOF lambdas do not participate in
  * whole-stage codegen and allocate one intermediate boolean array per
  * candidate pair; this compiles to a tight long-compare loop. Integer
  * count → swapping it in cannot change any oracle hash. Signatures are
  * fixed-length per pipeline; a length mismatch would count agreements
  * over the shorter prefix (same as zip_with's null-padded tail, whose
  * null ≠ long comparisons are filtered out). Null ELEMENTS are skipped
  * on either side for the same reason — the HOF's null = null comparison
  * yields null and the filter drops it, never a counted agreement — so
  * the equivalence holds for array<bigint> with containsNull=true too
  * (MinHash signatures never carry null slots; the guard is for the
  * general Column API surface).
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sig_agree"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) s += 1
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) $s++;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Column API for [[DotProduct]]. Arguments must be `array<double>`
    * (cast float embeddings once, upstream).
    */
  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))
  }

  /** Column API for [[SqDistMilli]]. Arguments: `array<bigint>`. */
  def sqDistMilli(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(SqDistMilli(ColumnShim.expression(a), ColumnShim.expression(b)))
  }

  /** Column API for [[DotMilli]]. Arguments: `array<bigint>`. */
  def dotMilli(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(DotMilli(ColumnShim.expression(a), ColumnShim.expression(b)))
  }

  /** Column API for [[SimHash64]]. Argument: `array<string>` tokens. */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))
  }

  /** Column API for [[MinHashSignature]]. Argument: `array<string>`. */
  def minhashSignature(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(MinHashSignature(ColumnShim.expression(shingles), numHashes))
  }

  /** Column API for [[NearestCentroid]]. Argument: `array<double>`. */
  def nearestCentroid(vec: Column, centroids: Seq[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(NearestCentroid(ColumnShim.expression(vec), centroids.map(_.toSeq)))
  }

  /** Column API for [[NearestCentroidDist]]. */
  def nearestCentroidDist(vec: Column, centroids: Seq[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(NearestCentroidDist(ColumnShim.expression(vec), centroids.map(_.toSeq)))
  }

  /** Column API for [[Winnow]]. Argument: a string column. */
  def winnow(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(Winnow(ColumnShim.expression(text), k, w))
  }

  /** Column API for [[FrameEnergy]]. Argument: a string column. */
  def frameEnergy(text: Column, frame: Int): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(FrameEnergy(ColumnShim.expression(text), frame))
  }

  /** Column API for [[ByteEntropyStats]]. Argument: a string column. */
  def byteEntropyStats(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(ByteEntropyStats(ColumnShim.expression(text)))
  }

  /** Column API for [[CdcBoundaries]]. Argument: a string column. */
  def cdcBoundaries(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(CdcBoundaries(ColumnShim.expression(text)))
  }

  /** Column API for [[SigAgree]]. Arguments: two `array<bigint>`. */
  def sigAgree(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(SigAgree(ColumnShim.expression(a), ColumnShim.expression(b)))
  }
}
