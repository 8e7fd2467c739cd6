package graft.core

import graft.functions.GraftFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingling (word/char k-grams as a set), faithful to reference
  * semantics (benchmarks/synth_data.py:65-81):
  *  - word mode tokenizes like Python's no-arg `str.split()` (runs of
  *    whitespace, leading/trailing ignored);
  *  - a doc shorter than k yields ONE shingle: the whole doc (for the
  *    empty string that is the empty-string shingle, not the empty set);
  *  - null doc -> empty set (=> downstream all-sentinel signature).
  *
  * The k-gram construction runs as a codegen kernel expression
  * (WordShingles/CharShingles) rather than built-in higher-order
  * functions: Spark HOF lambdas are CodegenFallback and would drop the
  * whole signature projection out of whole-stage codegen.
  */
object Shingling {

  /** Python-`str.split()` tokenization (kept for operators that need raw
    * tokens, e.g. SimHash / fingerprints). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Distinct word k-gram shingles: array<string>. */
  def wordShingles(text: Column, k: Int): Column =
    when(text.isNull, array().cast("array<string>"))
      .otherwise(GraftFunctions.word_shingles(text, k))

  /** Distinct char k-gram shingles: array<string>. */
  def charShingles(text: Column, k: Int): Column =
    when(text.isNull, array().cast("array<string>"))
      .otherwise(GraftFunctions.char_shingles(text, k))

  def shingles(text: Column, k: Int, byWord: Boolean): Column =
    if (byWord) wordShingles(text, k) else charShingles(text, k)
}
