package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingling (word/char k-grams as a set) expressed with built-in
  * higher-order functions so Catalyst codegens the whole thing.
  * Faithful to reference semantics (benchmarks/synth_data.py:65-81):
  *  - word mode tokenizes like Python's no-arg `str.split()` (runs of
  *    whitespace, leading/trailing ignored);
  *  - a doc shorter than k yields ONE shingle: the whole doc (for the
  *    empty string that is the empty-string shingle, not the empty set);
  *  - null doc -> empty set (=> downstream all-sentinel signature).
  */
object Shingling {

  /** Python-`str.split()` tokenization. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Distinct word k-gram shingles: array<string>. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val whole = array(array_join(toks, " "))
    val grams = array_distinct(
      transform(
        sequence(lit(0), size(toks) - lit(k)),
        i => array_join(slice(toks, i + lit(1), lit(k)), " ")))
    when(text.isNull, array().cast("array<string>"))
      .otherwise(when(size(toks) < lit(k), whole).otherwise(grams))
  }

  /** Distinct char k-gram shingles: array<string>. */
  def charShingles(text: Column, k: Int): Column = {
    val n = length(text)
    val grams = array_distinct(
      transform(sequence(lit(0), n - lit(k)), i => text.substr(i + lit(1), lit(k))))
    when(text.isNull, array().cast("array<string>"))
      .otherwise(when(n < lit(k), array(text)).otherwise(grams))
  }

  def shingles(text: Column, k: Int, byWord: Boolean): Column =
    if (byWord) wordShingles(text, k) else charShingles(text, k)
}
