package graft.core

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** ArrayData-level kernels invoked from the generated code of the custom
  * Catalyst expressions in [[graft.functions]]. Top-level object => Scala
  * emits static forwarders, so codegen can call
  * `graft.core.Kernels.method(...)` directly inside whole-stage codegen.
  */
object Kernels {
  import Mod61._

  /** array<string> shingles -> array<long> stable hashes (order-preserving;
    * duplicates impossible upstream because shingles are distinct, and a
    * post-mod collision is harmless for the downstream min-reduction).
    * Reference: synth_data.py:49 (`_stable_shingle_hash` per shingle).
    */
  def shingleHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = sha1Mod61(arr.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Word k-gram shingle set (order = first occurrence), faithful to
    * Python's no-arg `str.split()` + the reference's short-doc rule
    * (synth_data.py:65-81): fewer than k tokens -> ONE whole-doc shingle.
    * A codegen kernel because Spark's higher-order functions are
    * CodegenFallback — this keeps the per-row hot loop of the signature
    * pipeline inside whole-stage codegen.
    *
    * Known deviation: the tokenizer splits on Java `\s+` (ASCII
    * whitespace), while Python's no-arg `str.split()` also splits on
    * Unicode whitespace (U+00A0, U+1C-1F, U+85, ...). The synthetic
    * corpora are ASCII so parity holds there; non-ASCII corpora would
    * need a `\p{IsWhite_Space}+` class here AND in the DuckDB oracle's
    * string_split_regex to stay comparable. */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks0 = text.toString.split("\\s+")
    val toks = if (toks0.length > 0 && toks0(0).isEmpty) toks0.drop(1) else toks0
    if (toks.length < k)
      return new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }

  /** Char k-gram shingle set (synth_data.py:78-81 char mode). */
  def charShingles(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    if (s.length < k)
      return new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= s.length) { seen.add(s.substring(i, i + k)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** MD5 hash-family variant of the stable shingle hash: first 8 digest
    * bytes big-endian unsigned, mod p. Same shape as the reference's SHA-1
    * fingerprint but expressible in standard SQL (DuckDB oracle:
    * ('0x'||substr(md5(s),1,16))::UHUGEINT % p), so the full MinHash
    * pipeline gets an independent cross-engine correctness oracle.
    */
  def md5Mod61(utf8Bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(utf8Bytes)
    var x = 0L
    var i = 0
    while (i < 8) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
    java.lang.Long.remainderUnsigned(x, Prime)
  }

  /** array<string> -> array<long> via [[md5Mod61]]. */
  def shingleHashesMd5(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = md5Mod61(arr.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Reference-faithful MinHash signature: the reference's NumPy kernel
    * (synth_data.py:48-54) computes `(int(a[i]) * sh_ints + b[i]) % PRIME`
    * where `sh_ints` is an int64 array, so the product silently WRAPS at
    * 2^64 (the `astype(object)` temporaries meant to prevent this,
    * synth_data.py:46-47, are dead code). NumPy's `%` then returns a
    * non-negative remainder. Java long arithmetic wraps identically, so
    * bit-faithful emulation is one multiply, one add, one sign-adjusted
    * mod — validated against reference-executed goldens in
    * MinHashGoldenSpec and ReferenceParitySpec.
    */
  def minhashSignatureRef(hashes: ArrayData): ArrayData = {
    val numPerm = MinHashCoefficients.NumPerm
    val out = new Array[Long](numPerm)
    val m = hashes.numElements()
    if (m == 0) {
      java.util.Arrays.fill(out, Prime)
      return new GenericArrayData(out)
    }
    val hs = hashes.toLongArray()
    val A = MinHashCoefficients.A
    val B = MinHashCoefficients.B
    var i = 0
    while (i < numPerm) {
      val a = A(i)
      val b = B(i)
      var min = Long.MaxValue
      var j = 0
      while (j < m) {
        val wrapped = a * hs(j) + b // wraps exactly like np.int64
        var v = wrapped % Prime     // Java %: sign of dividend
        if (v < 0) v += Prime       // numpy %: sign of divisor
        if (v < min) min = v
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Clean-arithmetic MinHash signature — true (a*x+b) mod p via 61-bit
    * mulmod, the mathematically-intended family (used by the md5 pipeline
    * whose DuckDB oracle computes the same exact HUGEINT arithmetic);
    * empty input yields the all-sentinel signature.
    */
  def minhashSignature(hashes: ArrayData): ArrayData = {
    val numPerm = MinHashCoefficients.NumPerm
    val out = new Array[Long](numPerm)
    val m = hashes.numElements()
    if (m == 0) {
      java.util.Arrays.fill(out, Prime)
      return new GenericArrayData(out)
    }
    val hs = hashes.toLongArray()
    val A = MinHashCoefficients.A
    val B = MinHashCoefficients.B
    var i = 0
    while (i < numPerm) {
      val a = A(i)
      val b = B(i)
      var min = Long.MaxValue
      var j = 0
      while (j < m) {
        val v = addmod(mulmod(a, hs(j)), b)
        if (v < min) min = v
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Estimated Jaccard = fraction of positionally-equal signature slots
    * (reference: minhash_lsh.py:111-113). Assumes equal lengths.
    */
  def estJaccard(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** 61-bit SimHash over token fingerprints: per-bit sign-sum (+1 if bit
    * set, -1 if clear), output bit set iff the sum is positive. Input:
    * array<long> of already-hashed token fingerprints in [0, 2^61).
    * Public-knowledge algorithm (Charikar 2002); kept at 61 bits so the
    * identical computation is expressible in standard SQL for the oracle.
    */
  def simhash61(hashes: ArrayData): Long = {
    val counts = new Array[Int](61)
    val m = hashes.numElements()
    var j = 0
    while (j < m) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < 61) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 61) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Cosine similarity between two float vectors (array<float>). Each
    * element is widened to double BEFORE multiplying so the arithmetic is
    * identical to the DuckDB oracle's (x::DOUBLE * y::DOUBLE) — a float
    * multiply rounds differently and could flip near-ties cross-engine. */
  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = x.getFloat(i).toDouble; val b = y.getFloat(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  /** Negative L2 distance -||p - q||_2 over long vectors; higher = more
    * similar (reference: qed.py:65-73, worker_tasks.py:176-181). */
  def negL2Long(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = (x.getLong(i) - y.getLong(i)).toDouble
      s += d * d
      i += 1
    }
    -math.sqrt(s)
  }

  /** Negative L2 over float vectors (embeddings variant of qed.py:65-73).
    * Elements are widened to double BEFORE subtracting — identical to the
    * DuckDB oracle's (x::DOUBLE - y::DOUBLE); a float-precision subtract
    * rounds differently and a near-equidistant argmin flip would diverge
    * k-means training cross-engine. */
  def negL2Float(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    -math.sqrt(s)
  }

  /** SQUARED L2 over float vectors (no sqrt): the summable form — product
    * quantization's ADC adds per-subspace squared partials, which only
    * decomposes before the square root. Same double-widened fixed-order
    * arithmetic as [[negL2Float]]. */
  def sqL2Float(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  /** ADC score from PACKED per-vector PQ codes: -(Σ_s lut[s*k + codes[s]])
    * with the per-query lookup table laid out (subspace-major, code-minor)
    * — identical summation order and arithmetic to the row-form scoring
    * (one double add per subspace), so scores are bit-identical; this
    * form just replaces the m-row join+regroup per vector with m array
    * reads inside one codegen projection. */
  def adcScore(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    // a LUT stride smaller than the trained codebook size would silently
    // read a neighboring subspace's slot; fail fast on shape mismatch
    if (lut.numElements() != m * k)
      throw new IllegalArgumentException(
        s"adc_score: lut length ${lut.numElements()} != m*k = ${m * k}")
    var s = 0.0
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      if (c < 0 || c >= k)
        throw new IllegalArgumentException(
          s"adc_score: code $c out of range [0, $k) in subspace $i")
      s += lut.getDouble(i * k + c)
      i += 1
    }
    -s
  }

  /** Encode one vector into `m` PQ codes against a FLAT codebook array
    * laid out (subspace-major, codeword-minor, dim-innermost): for each
    * subspace, the argmin codeword by the SAME -sqrt(Σ squared double
    * diffs) score and smaller-id tie-break as the row-form encode
    * (neg_l2_float + top_k(1)), so codes are bit-identical — this form
    * just turns the m-way exploded join + two shuffles into one narrow
    * codegen projection. `m = 1` with `k = nCents` performs the coarse
    * IVF assignment under the identical discipline, which is how
    * VectorEngine fuses assignment and encoding into ONE corpus pass. */
  def pqEncode(v: ArrayData, books: ArrayData, m: Int, k: Int): ArrayData = {
    val dims = v.numElements()
    val subDim = dims / m
    if (books.numElements() != m * k * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: books length ${books.numElements()} != m*k*subDim = ${m * k * subDim}")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.NegativeInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        val off = (s * k + c) * subDim
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val diff = v.getFloat(s * subDim + d).toDouble - books.getFloat(off + d).toDouble
          acc += diff * diff
          d += 1
        }
        val score = -math.sqrt(acc)
        if (score > best) { best = score; bestC = c } // strict: ties keep the smaller id
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-dimension symmetric int8 quantization: code_d =
    * clamp(floor(x_d / s_d + 0.5), -127, 127). floor(+0.5) instead of a
    * library round so both engines (IEEE double divide, exact floor)
    * produce identical codes; the scale vector is data (no per-query
    * literals). Shrinks embedding I/O 4x at scale (float32 -> int8). */
  def quantizeI8(x: ArrayData, s: ArrayData): ArrayData = {
    val n = x.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val v = math.floor(x.getFloat(i).toDouble / s.getDouble(i) + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, v)).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** -||dq(x) - dq(y)||_2 over int8 codes with per-dimension scales:
    * each term is (x_i - y_i) exactly in ints, ONE double multiply by
    * s_i, squared — (x_i*s) - (y_i*s) would round twice and diverge
    * cross-engine. */
  def negL2Quant(x: ArrayData, y: ArrayData, s: ArrayData): Double = {
    val n = x.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      val d = (x.getInt(i) - y.getInt(i)).toDouble * s.getDouble(i)
      sum += d * d
      i += 1
    }
    -math.sqrt(sum)
  }

  /** O15 conjunctive bin-window predicate as one kernel: true iff every
    * dimension's equi-width bucket (np.histogram assignment, degenerate
    * range -> bucket 0) lies inside its [wlo, whi] window. One expression
    * instead of a D-term AND chain — Catalyst's constraint propagation is
    * quadratic in conjunct count and made the column-composed form
    * unusably slow to plan at D=64.
    *
    * Known boundary deviation (documented, intentional): this clamps the
    * bucket to nBins-1 (np.histogram's last-bin-inclusive rule), while the
    * reference's point_passes_bins (qed.py:59) assigns bin == nBins to a
    * point exactly equal to the per-dimension max via searchsorted and so
    * always EXCLUDES it. QED is vestigial on the reference query path; the
    * np.histogram rule is the one its own histogram operator (O13) uses,
    * so the engine keeps the two consistent instead of parity-matching a
    * dead branch. */
  def passesBins(v: ArrayData, lo: Array[Double], hi: Array[Double],
                 wlo: Array[Int], whi: Array[Int], nBins: Int): Boolean = {
    val d = lo.length
    var i = 0
    while (i < d) {
      val x = v.getFloat(i).toDouble
      val b =
        if (hi(i) == lo(i)) 0
        else math.min(math.floor((x - lo(i)) * nBins / (hi(i) - lo(i))), (nBins - 1).toDouble).toInt
      if (b < wlo(i) || b > whi(i)) return false
      i += 1
    }
    true
  }

  /** Reference-faithful QED bin test (point_passes_bins, qed.py:54-63):
    * per-dim bin via np.searchsorted(edges[d], x, side='right') - 1 over
    * the REAL histogram edge matrix — including the quirk the arithmetic
    * variant above deliberately avoids (a point equal to the per-dim max
    * lands in bin nBins and is excluded). `edges` is the (D, nBins+1)
    * matrix flattened row-major; `v` holds 64-bit signature components,
    * converted to double exactly as numpy promotes them before
    * comparing. Binary search: lo ends as the count of edges <= x, i.e.
    * searchsorted side='right'. */
  def passesBinsEdges(v: ArrayData, edges: Array[Double],
                      wlo: Array[Int], whi: Array[Int], nBins: Int): Boolean = {
    val d = wlo.length
    var i = 0
    while (i < d) {
      val x = v.getLong(i).toDouble
      val base = i * (nBins + 1)
      var lo = 0
      var hi = nBins + 1
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (edges(base + m) <= x) lo = m + 1 else hi = m
      }
      val b = lo - 1
      if (b < wlo(i) || b > whi(i)) return false
      i += 1
    }
    true
  }

  /** Gopher-style repetition quality signals in ONE pass over the token
    * stream (public filtering rules from Rae et al. 2021 "Scaling Language
    * Models", App. A1.1): [n_tokens, distinct_token_ratio, top_token_frac,
    * top_bigram_frac] as array<double>. Tokenization matches
    * Shingling.tokens (split on \s+, drop empties) so the DuckDB oracle's
    * string_split_regex recipe reproduces it exactly; every ratio is one
    * integer/integer double division — bit-identical cross-engine. A
    * codegen kernel (pure projection) because at corpus scale these
    * filters must not cost a shuffle per signal. */
  def repetitionStats(text: UTF8String): ArrayData = {
    val raw = text.toString.split("\\s+")
    val toks = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) toks.add(raw(i)); i += 1 }
    val m = toks.size
    if (m == 0) return new GenericArrayData(Array(0.0, 0.0, 0.0, 0.0))
    val counts = new java.util.HashMap[String, Integer]()
    var maxTok = 0
    i = 0
    while (i < m) {
      val c = counts.merge(toks.get(i), 1, (a, b) => a + b)
      if (c > maxTok) maxTok = c
      i += 1
    }
    var maxBi = 0
    if (m >= 2) {
      val bi = new java.util.HashMap[String, Integer]()
      i = 0
      while (i < m - 1) {
        val c = bi.merge(toks.get(i) + " " + toks.get(i + 1), 1, (a, b) => a + b)
        if (c > maxBi) maxBi = c
        i += 1
      }
    }
    new GenericArrayData(Array(
      m.toDouble,
      counts.size.toDouble / m,
      maxTok.toDouble / m,
      if (m < 2) 0.0 else maxBi.toDouble / (m - 1)))
  }

  /** One-pass INTEGER text statistics for the learned quality classifier
    * (Classifier.scala): [n_tokens, n_distinct, top_token_count, n_chars,
    * n_letters, n_punct, sum_token_len] as array<long>. The integer twins
    * of repetitionStats' ratios — the classifier's training sums must be
    * exact BIGINT arithmetic (order-free, overflow-safe) so the DuckDB
    * oracle re-derives the fitted model bit-for-bit; double ratios can't
    * carry that. Tokenization matches Shingling.tokens (split on \s+,
    * drop empties = string_split_regex + list_filter); all character
    * counts are CODE POINTS (DuckDB length() semantics — UTF-16 .length
    * would diverge on astral chars, the RealCorpusSmoke lesson); letter =
    * ASCII [A-Za-z] and punct = [.,;:!?'"] exactly as the oracle's
    * regexp_replace character classes count them. */
  def textStats(text: UTF8String): ArrayData = {
    val s = text.toString
    val raw = s.split("\\s+")
    var nTok = 0L
    var sumLen = 0L
    var topCnt = 0L
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (!t.isEmpty) {
        nTok += 1
        sumLen += t.codePointCount(0, t.length)
        val c = counts.merge(t, 1, (a, b) => a + b)
        if (c > topCnt) topCnt = c.toLong
      }
      i += 1
    }
    var nChars = 0L
    var letters = 0L
    var punct = 0L
    i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) letters += 1
      else if (cp == '.' || cp == ',' || cp == ';' || cp == ':' ||
        cp == '!' || cp == '?' || cp == '\'' || cp == '"') punct += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(
      nTok, counts.size.toLong, topCnt, nChars, letters, punct, sumLen))
  }

  /** Random-hyperplane LSH bucket id (Charikar 2002 SimHash-for-cosine):
    * bit p of the result is set iff the dot product of `v` against the
    * deterministic ±1 hyperplane p is positive. The ±1 weight for
    * (plane p, dim d) is the parity of the seed-42 linear hash
    * (A(p)*(p*64+d+1)+B(p)) mod 2^61-1 — nonlinear in its argument yet
    * exactly reproducible in standard SQL for the DuckDB oracle. The dot
    * accumulates in double, per-dimension sequential order, matching the
    * oracle's list_reduce fold. A codegen kernel because the HOF-composed
    * form (transform/aggregate/zip_with) is CodegenFallback and paid
    * ~3 ms/row in interpreted decimal arithmetic. */
  // The ±1 weight grid depends only on (plane, dim) and the fixed seed-42
  // coefficients — precomputed once per (plane, dim-extent) and grown on
  // demand, so the per-row loop is pure multiply-adds.
  private val rhpWeightRows =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()
  private def rhpWeightRow(p: Int, n: Int): Array[Double] = {
    val cur = rhpWeightRows.get(p)
    if (cur != null && cur.length >= n) cur
    else {
      val a = MinHashCoefficients.A(p)
      val b = MinHashCoefficients.B(p)
      val w = new Array[Double](n)
      var d = 0
      while (d < n) {
        w(d) = if ((addmod(mulmod(a, p * 64L + d + 1L), b) & 1L) == 1L) -1.0 else 1.0
        d += 1
      }
      rhpWeightRows.put(p, w)
      w
    }
  }

  def rhpBucket(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val w = rhpWeightRow(p, n)
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += v.getFloat(d).toDouble * w(d)
        d += 1
      }
      if (dot > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Polynomial rolling hash over token fingerprints mod 2^61-1
    * (order-sensitive document fingerprint; base 1000003 is the public
    * CPython string-hash multiplier). Input: array<long> token hashes. */
  def rollingFingerprint(arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = addmod(mulmod(acc, 1000003L), arr.getLong(i))
      i += 1
    }
    acc
  }

  /** Every length-`w` window's [[rollingFingerprint]] over an array of
    * token hashes -> array<long> of n-w+1 fingerprints (empty when the
    * document is shorter than the window). O(n) total via the standard
    * drop-leading-term recurrence in exact mod-p arithmetic — bit-identical
    * to folding each window directly (which is what the SQL oracle does),
    * since every step is exact modular arithmetic. This is the kernel
    * behind exact substring-duplicate detection (Lee et al. 2022 shape):
    * a 50B-token corpus yields ~n windows, not n*w hash work. */
  def windowFingerprints(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w || w <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - w + 1)
    var pow = 1L // 1000003^(w-1) mod p: the leading term's weight
    var i = 1
    while (i < w) { pow = mulmod(pow, 1000003L); i += 1 }
    var acc = 0L
    i = 0
    while (i < w) { acc = addmod(mulmod(acc, 1000003L), arr.getLong(i)); i += 1 }
    out(0) = acc
    i = w
    while (i < n) {
      var dropped = acc - mulmod(arr.getLong(i - w), pow)
      if (dropped < 0) dropped += Prime
      acc = addmod(mulmod(dropped, 1000003L), arr.getLong(i))
      out(i - w + 1) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Total BPE token count of a word-token array under an ordered merge
    * list, each merge applied up to `repl` times — semantically EXACT to
    * the original Column-fold construction (spacedSymbols -> repl x
    * `replace` per merge -> count non-empty splits), which it replaces
    * because that fold nests 12 x |merges| `replace` nodes into ONE
    * expression tree: Column->Expression conversion recurses per node
    * and overflows the driver stack at ~30 merges (found by the round-12
    * real-corpus smoke) — a production merge list is thousands. Here the
    * merge loop runs at EVAL time over a driver-held array, so plan
    * depth is O(1) in the merge count.
    *
    * Semantics notes (each replicates the SQL chain exactly):
    *  - spaced symbols iterate CODE POINTS (java regex "(.)" matches one
    *    code point; tokens are whitespace-split so line terminators,
    *    which "." skips, never occur);
    *  - String.replace == Spark's StringReplace: literal, left-to-right,
    *    non-overlapping, all occurrences — the early `contains` exit
    *    only skips replaces that would no-op;
    *  - the count equals size(filter(split(s, " "), _ != "")). */
  def bpeCountTokens(tokens: ArrayData, merges: Array[String], repl: Int): Int = {
    var total = 0
    var i = 0
    val nTok = tokens.numElements()
    while (i < nTok) {
      val word = tokens.getUTF8String(i).toString
      val sb = new java.lang.StringBuilder(word.length * 2 + 2)
      sb.append(' ')
      var ci = 0
      while (ci < word.length) {
        val cp = word.codePointAt(ci)
        sb.appendCodePoint(cp)
        sb.append(' ')
        ci += Character.charCount(cp)
      }
      var s = sb.toString
      var mi = 0
      while (mi < merges.length) {
        val pair = merges(mi)
        val target = " " + pair + " "
        val merged = " " + pair.replace(" ", "") + " "
        var r = 0
        while (r < repl && s.contains(target)) {
          s = s.replace(target, merged)
          r += 1
        }
        mi += 1
      }
      var cnt = 0
      var p = 0
      val n = s.length
      while (p < n) {
        if (s.charAt(p) != ' ') {
          cnt += 1
          while (p < n && s.charAt(p) != ' ') p += 1
        } else p += 1
      }
      total += cnt
      i += 1
    }
    total
  }
}
