package graft.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
    // decode code points straight off the UTF-8 bytes — no toString
    // allocation on the hot path (this runs once per shingle)
    var h1 = 0L
    var h2 = 0L
    var i = 0
    val n = s.numBytes
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = b0
      var len = 1
      if (b0 >= 0x80) {
        if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
        else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
        else { cp = b0 & 0x07; len = 4 }
        var k = 1
        while (k < len && i + k < n) {
          cp = (cp << 6) | (s.getByte(i + k) & 0x3F)
          k += 1
        }
      }
      h1 = (h1 * 131 + cp) % PolyMod1
      h2 = (h2 * 137 + cp) % PolyMod2
      i += len
    }
    h1 * PolyMod2 + h2
  }

  /** Fused word-n-gram poly61 hashing: ONE allocation-free pass that
    * yields, per gram position, poly61 of the string the gram WOULD be
    * ("w1 w2 w3", single-space-joined) — without materializing the gram
    * strings, the intermediate array, or a per-element lambda. The
    * separate build-grams → hash-each form evaluates interpreted HOF
    * lambdas per element and allocates a String per gram; this kernel
    * is the same O(n · totalChars) arithmetic with zero garbage —
    * the scan-stage shape you want when shingling 100 TB of text.
    * Returns identical values to poly61 of the single-space-joined gram
    * string for non-null tokens (KernelProps pins this). A null token
    * hashes as an EMPTY token (its joiners still contribute) — unlike
    * concat_ws, which drops the null and its separator; `split` never
    * produces nulls, so no engine caller hits the difference. */
  def wordGramPoly61(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var h1 = 0L
      var h2 = 0L
      var k = 0
      while (k < n) {
        if (k > 0) { // the ' ' joiner between words (code point 32)
          h1 = (h1 * 131 + 32) % PolyMod1
          h2 = (h2 * 137 + 32) % PolyMod2
        }
        if (!tokens.isNullAt(i + k)) {
          val s = tokens.getUTF8String(i + k)
          var j = 0
          val nb = s.numBytes
          while (j < nb) {
            val b0 = s.getByte(j) & 0xff
            var cp = b0
            var len = 1
            if (b0 >= 0x80) {
              if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
              else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
              else { cp = b0 & 0x07; len = 4 }
              var t = 1
              while (t < len && j + t < nb) {
                cp = (cp << 6) | (s.getByte(j + t) & 0x3F)
                t += 1
              }
            }
            h1 = (h1 * 131 + cp) % PolyMod1
            h2 = (h2 * 137 + cp) % PolyMod2
            j += len
          }
        }
        k += 1
      }
      out(i) = h1 * PolyMod2 + h2
      i += 1
    }
    new GenericArrayData(out)
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

  /** Block-average perceptual hash over a binary payload (the aHash
    * idea — Zauner 2010, "Implementation and benchmarking of
    * perceptual image hash functions" — applied to the engine's opaque
    * media bytes): split the payload into 60 equal byte blocks, set
    * bit i iff block i's mean byte value exceeds the payload-wide
    * mean. 60 bits so the signature (and every hamming distance over
    * it) fits a signed BIGINT in the DuckDB twin. One pass over the
    * bytes. Length ≥ 60 is enforced by the [[BlockHash60]] Expression
    * (shorter payloads evaluate to NULL there); this raw kernel assumes
    * its input has already passed that gate. */
  def blockHash60(bytes: Array[Byte]): Long = {
    val len = bytes.length
    var total = 0L
    var i = 0
    while (i < len) { total += (bytes(i) & 0xFF); i += 1 }
    val gavg = total.toDouble / len
    var out = 0L
    var b = 0
    while (b < 60) {
      // long multiply: b*len overflows Int past ~36 MB payloads
      val lo = (b.toLong * len / 60).toInt
      val hi = ((b + 1).toLong * len / 60).toInt
      var s = 0L
      var j = lo
      while (j < hi) { s += (bytes(j) & 0xFF); j += 1 }
      val n = math.max(hi - lo, 1)
      if (s.toDouble / n > gavg) out |= (1L << b)
      b += 1
    }
    out
  }
}
