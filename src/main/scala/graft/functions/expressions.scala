package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types._

/** Custom codegen-friendly Catalyst expressions for the kernels the
  * reference implements in NumPy and that Spark's built-in functions can't
  * express exactly (61-bit modular hashing — SURVEY.md §2.1 / §7.2).
  * Each `doGenCode` emits a single static call into [[graft.core.Kernels]],
  * keeping the operator inside whole-stage codegen.
  */

/** array<string> -> array<long>: SHA-1/8-byte/mod-p stable shingle hash,
  * element-wise (reference: benchmarks/synth_data.py:22-25). */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.shingleHashes(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.shingleHashes($c)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** string -> array<string>: word k-gram shingle set (codegen kernel —
  * Spark HOFs are CodegenFallback; see Kernels.wordShingles). */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.wordShingles(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.wordShingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** string -> array<string>: char k-gram shingle set. */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.charShingles(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.charShingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): CharShingles = copy(child = c)
  override def prettyName: String = "char_shingles"
}

/** MD5-family variant of [[ShingleHashes]] (see Kernels.md5Mod61 — gives
  * the pipeline a standard-SQL cross-engine oracle). */
case class ShingleHashesMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.shingleHashesMd5(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.shingleHashesMd5($c)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesMd5 = copy(child = c)
  override def prettyName: String = "shingle_hashes_md5"
}

/** Reference-faithful MinHash signature (emulates the reference's int64
  * overflow wrap — see Kernels.minhashSignatureRef). */
case class MinHashSignatureRef(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.minhashSignatureRef(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.minhashSignatureRef($c)")
  override protected def withNewChildInternal(c: Expression): MinHashSignatureRef = copy(child = c)
  override def prettyName: String = "minhash_signature_ref"
}

/** array<long> shingle hashes -> array<long>(128) MinHash signature with
  * the seed-42 linear family, clean mod-p arithmetic; empty array ->
  * all-sentinel (reference: benchmarks/synth_data.py:38-55). */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.minhashSignature(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.minhashSignature($c)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** (array<long>, array<long>) -> double: fraction of positionally-equal
  * slots = estimated Jaccard (reference: minhash_lsh.py:111-113). */
case class EstJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    graft.core.Kernels.estJaccard(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.core.Kernels.estJaccard($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): EstJaccard =
    copy(left = l, right = r)
  override def prettyName: String = "est_jaccard"
}

/** array<long> token hashes -> 61-bit SimHash fingerprint (Charikar 2002). */
case class SimHash61(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.simhash61(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.simhash61($c)")
  override protected def withNewChildInternal(c: Expression): SimHash61 = copy(child = c)
  override def prettyName: String = "simhash61"
}

/** (array<float>, array<float>) -> double cosine similarity. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    graft.core.Kernels.cosine(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.core.Kernels.cosine($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** (array<long>, array<long>) -> double: -||x-y||_2, the reference's
  * quantization score (qed.py:65-73) over signature space. */
case class NegL2Long(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    graft.core.Kernels.negL2Long(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.core.Kernels.negL2Long($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NegL2Long =
    copy(left = l, right = r)
  override def prettyName: String = "neg_l2_long"
}

/** (array<float>, array<float>) -> double: -||x-y||_2 over embeddings. */
case class NegL2Float(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    graft.core.Kernels.negL2Float(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.core.Kernels.negL2Float($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NegL2Float =
    copy(left = l, right = r)
  override def prettyName: String = "neg_l2_float"
}

/** (array<float>, array<float>) -> double: SQUARED L2 (no sqrt) — the
  * summable sub-distance for product quantization's ADC tables. */
case class SqL2Float(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    graft.core.Kernels.sqL2Float(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.core.Kernels.sqL2Float($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqL2Float =
    copy(left = l, right = r)
  override def prettyName: String = "sq_l2_float"
}

/** (array<int> codes, array<double> lut) -> double: packed-code ADC score
  * -(Σ_s lut[s*k + codes[s]]) — see Kernels.adcScore. */
case class AdcScore(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(c: Any, l: Any): Any =
    graft.core.Kernels.adcScore(
      c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.core.Kernels.adcScore($c, $l, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScore =
    copy(left = l, right = r)
  override def prettyName: String = "adc_score"
}

/** (array<float> vector, array<float> flat codebooks) -> array<int>:
  * per-subspace argmin PQ codes in one codegen projection
  * (Kernels.pqEncode); m=1 performs the coarse IVF assignment. */
case class PqEncode(left: Expression, right: Expression, m: Int, k: Int)
  extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any, b: Any): Any =
    graft.core.Kernels.pqEncode(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], m, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b) => s"graft.core.Kernels.pqEncode($v, $b, $m, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
  override def prettyName: String = "pq_encode"
}

/** array<float> -> boolean: conjunctive QED bin-window predicate (O15) as
  * one codegen expression; the window/bounds arrays ride along as
  * reference objects, keeping the plan literal-free and constraint-cheap. */
case class QedBinFilter(child: Expression, lo: Array[Double], hi: Array[Double],
                        wlo: Array[Int], whi: Array[Int], nBins: Int)
  extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.passesBins(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], lo, hi, wlo, whi, nBins)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("qedLo", lo, "double[]")
    val hiRef = ctx.addReferenceObj("qedHi", hi, "double[]")
    val wloRef = ctx.addReferenceObj("qedWlo", wlo, "int[]")
    val whiRef = ctx.addReferenceObj("qedWhi", whi, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.core.Kernels.passesBins($c, $loRef, $hiRef, $wloRef, $whiRef, $nBins)")
  }
  override protected def withNewChildInternal(c: Expression): QedBinFilter = copy(child = c)
  override def prettyName: String = "qed_bin_filter"
}

/** array<long> signature -> boolean: reference-faithful QED bin-window
  * predicate over the real histogram edge matrix (searchsorted bins —
  * Kernels.passesBinsEdges; point_passes_bins, qed.py:54-63). `edges`
  * is (D, nBins+1) flattened row-major. */
case class QedEdgeFilter(child: Expression, edges: Array[Double],
                         wlo: Array[Int], whi: Array[Int], nBins: Int)
  extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.passesBinsEdges(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], edges, wlo, whi, nBins)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eRef = ctx.addReferenceObj("qedEdges", edges, "double[]")
    val wloRef = ctx.addReferenceObj("qedEWlo", wlo, "int[]")
    val whiRef = ctx.addReferenceObj("qedEWhi", whi, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.core.Kernels.passesBinsEdges($c, $eRef, $wloRef, $whiRef, $nBins)")
  }
  override protected def withNewChildInternal(c: Expression): QedEdgeFilter = copy(child = c)
  override def prettyName: String = "qed_edge_filter"
}

/** string -> array<double>(4): one-pass Gopher-style repetition quality
  * signals [n_tokens, distinct_token_ratio, top_token_frac,
  * top_bigram_frac] — Kernels.repetitionStats. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.repetitionStats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.repetitionStats($c)")
  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
  override def prettyName: String = "repetition_stats"
}

/** string -> array<long>(7): one-pass INTEGER text statistics
  * [n_tokens, n_distinct, top_token_count, n_chars, n_letters, n_punct,
  * sum_token_len] — Kernels.textStats, the exact-arithmetic feature
  * source for the learned quality classifier (Classifier.scala). */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.textStats(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.textStats($c)")
  override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
  override def prettyName: String = "text_stats"
}

/** array<float> -> long: random-hyperplane LSH bucket id (sign bits of
  * `planes` deterministic ±1 dot products — Kernels.rhpBucket). */
case class RhpBucket(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.rhpBucket(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.rhpBucket($c, $planes)")
  override protected def withNewChildInternal(c: Expression): RhpBucket = copy(child = c)
  override def prettyName: String = "rhp_bucket"
}

/** array<long> token hashes -> long polynomial rolling-hash fingerprint. */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.rollingFingerprint(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.rollingFingerprint($c)")
  override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(child = c)
  override def prettyName: String = "rolling_fingerprint"
}

/** array<long> token hashes -> array<long>: every length-`w` window's
  * polynomial rolling-hash fingerprint (Kernels.windowFingerprints) —
  * the exact-substring-duplicate kernel. */
case class WindowFingerprints(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.windowFingerprints(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.windowFingerprints($c, $w)")
  override protected def withNewChildInternal(c: Expression): WindowFingerprints = copy(child = c)
  override def prettyName: String = "window_fingerprints"
}

/** (array<float> vector, array<double> scales) -> array<int>: per-dim
  * symmetric int8 quantization codes (Kernels.quantizeI8) — the 4x
  * embedding-I/O compression path for 100 TB vector scans. */
case class QuantizeI8(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    graft.core.Kernels.quantizeI8(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.core.Kernels.quantizeI8($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizeI8 =
    copy(left = l, right = r)
  override def prettyName: String = "quantize_i8"
}

/** (array<int> codes, array<int> codes, array<double> scales) -> double:
  * -||dequant(x) - dequant(y)||_2 with exact int subtraction before the
  * single per-dim scale multiply (Kernels.negL2Quant). */
case class NegL2Quant(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(x: Any, y: Any, s: Any): Any =
    graft.core.Kernels.negL2Quant(
      x.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      y.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, s) => s"graft.core.Kernels.negL2Quant($x, $y, $s)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): NegL2Quant =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "neg_l2_quant"
}

/** array<string> word tokens -> int: total BPE token count under an
  * ordered merge list (each applied `repl` times) — the merge loop runs
  * at eval time over a driver-held array, so plan depth is O(1) in the
  * merge count (the Column-fold form overflowed the conversion stack at
  * ~30 merges; Kernels.bpeCountTokens documents the exact semantics). */
case class BpeCountTokens(child: Expression, merges: Seq[String], repl: Int)
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  private lazy val mergeArr: Array[String] = merges.toArray
  override protected def nullSafeEval(v: Any): Any =
    graft.core.Kernels.bpeCountTokens(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], mergeArr, repl)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergeArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.core.Kernels.bpeCountTokens($c, $mRef, $repl)")
  }
  override protected def withNewChildInternal(c: Expression): BpeCountTokens = copy(child = c)
  override def prettyName: String = "bpe_count_tokens"
}

/** Column-level entry points (the public function surface of the engine). */
object GraftFunctions {
  private def col(e: Expression): Column = org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def ex(c: Column): Expression = org.apache.spark.sql.graftbridge.Bridge.expression(c)

  def word_shingles(c: Column, k: Int): Column = col(WordShingles(ex(c), k))
  def char_shingles(c: Column, k: Int): Column = col(CharShingles(ex(c), k))
  def shingle_hashes(c: Column): Column = col(ShingleHashes(ex(c)))
  def shingle_hashes_md5(c: Column): Column = col(ShingleHashesMd5(ex(c)))
  def minhash_signature(c: Column): Column = col(MinHashSignature(ex(c)))
  def minhash_signature_ref(c: Column): Column = col(MinHashSignatureRef(ex(c)))
  def est_jaccard(l: Column, r: Column): Column = col(EstJaccard(ex(l), ex(r)))
  def simhash61(c: Column): Column = col(SimHash61(ex(c)))
  def cosine_sim(l: Column, r: Column): Column = col(CosineSim(ex(l), ex(r)))
  def neg_l2_long(l: Column, r: Column): Column = col(NegL2Long(ex(l), ex(r)))
  def neg_l2_float(l: Column, r: Column): Column = col(NegL2Float(ex(l), ex(r)))
  def sq_l2_float(l: Column, r: Column): Column = col(SqL2Float(ex(l), ex(r)))
  def adc_score(codes: Column, lut: Column, k: Int): Column =
    col(AdcScore(ex(codes), ex(lut), k))
  def pq_encode(v: Column, books: Column, m: Int, k: Int): Column =
    col(PqEncode(ex(v), ex(books), m, k))
  def rolling_fingerprint(c: Column): Column = col(RollingFingerprint(ex(c)))
  def window_fingerprints(c: Column, w: Int): Column = col(WindowFingerprints(ex(c), w))
  def rhp_bucket(c: Column, planes: Int): Column = col(RhpBucket(ex(c), planes))
  def repetition_stats(c: Column): Column = col(RepetitionStats(ex(c)))
  def text_stats(c: Column): Column = col(TextStats(ex(c)))
  def quantize_i8(v: Column, s: Column): Column = col(QuantizeI8(ex(v), ex(s)))
  def neg_l2_quant(x: Column, y: Column, s: Column): Column =
    col(NegL2Quant(ex(x), ex(y), ex(s)))
  def bpe_count_tokens(c: Column, merges: Seq[String], repl: Int): Column =
    col(BpeCountTokens(ex(c), merges, repl))

  /** Register all engine functions for SQL use. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es(0), es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("char_shingles",
      es => CharShingles(es(0), es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes", es => ShingleHashes(es.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature", es => MinHashSignature(es.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature_ref", es => MinHashSignatureRef(es.head), "built-in")
    reg.createOrReplaceTempFunction("est_jaccard", es => EstJaccard(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash61", es => SimHash61(es.head), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("neg_l2_long", es => NegL2Long(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("neg_l2_float", es => NegL2Float(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("sq_l2_float", es => SqL2Float(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("rolling_fingerprint", es => RollingFingerprint(es.head), "built-in")
    reg.createOrReplaceTempFunction("window_fingerprints",
      es => WindowFingerprints(es(0), es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("rhp_bucket",
      es => RhpBucket(es(0), es(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("repetition_stats", es => RepetitionStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("text_stats", es => TextStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("quantize_i8", es => QuantizeI8(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("neg_l2_quant", es => NegL2Quant(es(0), es(1), es(2)), "built-in")
  }
}
