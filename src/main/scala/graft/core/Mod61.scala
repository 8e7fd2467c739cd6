package graft.core

import java.security.MessageDigest

/** Arithmetic kernels over the Mersenne prime p = 2^61 - 1, reproducing the
  * reference's modular hash family bit-for-bit
  * (reference: benchmarks/synth_data.py:20-25,33-55).
  *
  * All values live in [0, p); they fit comfortably in a signed Long
  * (p < 2^63), including the empty-set sentinel which is exactly p.
  */
object Mod61 {
  /** p = 2^61 - 1 (reference: synth_data.py:20). Also the empty-shingle-set
    * signature sentinel (synth_data.py:41-42). */
  final val Prime: Long = (1L << 61) - 1

  /** (a * x) mod p for 0 <= a, x < p, using the Mersenne fold:
    * the 128-bit product hi*2^64 + lo satisfies 2^61 ≡ 1 (mod p), so
    * fold the product into 61-bit limbs and sum.
    *
    * Operand bound is p (2^61 - 1), NOT 2^62: for operands near 2^62 the
    * fold `((hi<<3)|(lo>>>61)) + (lo & p)` itself can exceed Long.MaxValue
    * and wrap. All hash-family values live in [0, p), which is safe.
    */
  @inline def mulmod(a: Long, x: Long): Long = {
    val hi = Math.multiplyHigh(a, x) // signed ok: both operands positive < 2^62
    val lo = a * x                   // low 64 bits of the product
    // full = hi*2^64 + lo = ((hi<<3) + (lo>>>61)) * 2^61 + (lo & p)
    val folded = ((hi << 3) | (lo >>> 61)) + (lo & Prime) // < 2^62
    val r = (folded & Prime) + (folded >>> 61)
    if (r >= Prime) r - Prime else r
  }

  /** (v + b) mod p for 0 <= v, b < p. */
  @inline def addmod(v: Long, b: Long): Long = {
    val s = v + b
    if (s >= Prime) s - Prime else s
  }

  /** h_i(x) = (A(i)*x + B(i)) mod p — the reference's linear hash family
    * (synth_data.py:33-36,53). */
  @inline def perm(i: Int, x: Long): Long =
    addmod(mulmod(MinHashCoefficients.A(i), x), MinHashCoefficients.B(i))

  private val sha1Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-1")
  }

  /** Stable shingle fingerprint: SHA-1 of the UTF-8 bytes, first 8 bytes
    * read big-endian as an unsigned 64-bit integer, mod p
    * (reference: synth_data.py:22-25). */
  def sha1Mod61(utf8Bytes: Array[Byte]): Long = {
    val md = sha1Local.get()
    md.reset()
    val d = md.digest(utf8Bytes)
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
    java.lang.Long.remainderUnsigned(x, Prime)
  }
}
