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

  private final val PolyMod1 = 1000000007L // both primes < 2^30, so the
  private final val PolyMod2 = 998244353L  // combined hash stays < 2^60

  /** ORACLE-EXPRESSIBLE string hash: two 30-bit polynomial hashes over
    * Unicode CODE POINTS, combined as h1·M2 + h2 (< 2^60, no Long
    * overflow at any intermediate step). Exactly replicable in DuckDB
    * SQL — `list_reduce` over `unicode(s[i])` with the same (base, mod)
    * pairs — which is what lets MinHash/SimHash/winnowing pipelines be
    * checked end-to-end against the oracle, where xxhash64 could not
    * be. Collision odds across a 100 TB distinct-shingle universe
    * (~2^40 keys) are ~2^-(60-80)·N² — and a collision can only perturb
    * a CANDIDATE set; exact verification rejects false pairs. */
  def poly61(s: UTF8String): Long = {
    val str = s.toString
    var h1 = 0L
    var h2 = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h1 = (h1 * 131 + cp) % PolyMod1
      h2 = (h2 * 137 + cp) % PolyMod2
      i += Character.charCount(cp)
    }
    h1 * PolyMod2 + h2
  }

  /** SimHash over a token array (nulls skipped); term frequency weights
    * votes naturally via repetition. Token hashes come from [[poly61]]
    * (60 usable bits — fingerprint bits 60-63 are constant 0, which
    * drops out of every hamming distance) so the WHOLE fingerprint
    * pipeline has a DuckDB twin and the driver can hash-check it,
    * where the former FNV-1a token hash could not be expressed. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](60)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = poly61(tokens.getUTF8String(i))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
