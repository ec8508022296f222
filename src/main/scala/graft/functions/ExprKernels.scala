package graft.functions

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType

/** Shared scalar kernels for the native expressions — called from both
  * interpreted eval and generated code (Scala top-level objects emit
  * static forwarders, so codegen can reference these as plain static
  * Java calls and whole-stage codegen stays fused around them).
  */
object ExprKernels {

  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
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

  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XxHash64Function.hash(s, StringType, 42L)
        val h2 = XxHash64Function.hash(s, StringType, 77L)
        var j = 0
        var g = h1
        while (j < numHashes) {
          if (g < mins(j)) mins(j) = g
          g += h2 // g = h1 + j*h2, wrapping
          j += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  def winnow(text: String, k: Int, w: Int): ArrayData = {
    val n = math.max(text.length - k + 1, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val gram = text.substring(i, math.min(i + k, text.length))
      val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hashes(i) =
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      md.reset()
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
}
