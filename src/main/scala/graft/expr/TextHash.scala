package graft.expr

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels for dedup fingerprinting (SimHash, FNV-1a) —
  * callable directly from generated code like [[TextNorm]].
  *
  * SimHash (Charikar 2002, the reference-free near-dup north star):
  * per-token 64-bit FNV-1a hashes vote ±1 on each bit position; the
  * sign vector is the document fingerprint. Hamming distance between
  * fingerprints approximates token-multiset dissimilarity.
  */
object TextHash {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a over UTF-8 bytes — stable across JVMs, no dependency. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** SimHash64 over a token array (nulls skipped); term frequency
    * weights votes naturally via repetition. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
