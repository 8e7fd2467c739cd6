package graft.operators

import graft.core.Shingling
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for a training-data pipeline: language ID
  * (stopword-ratio heuristic), quality scoring, token counting, document
  * fingerprinting. All pure per-row projections (no shuffle), expressed
  * with built-in functions so they stay inside whole-stage codegen.
  */
object TextAnalysis {

  /** Per-language stopword lists (tiny, broadcast-as-literal). Public
    * high-frequency function words. */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
    "en" -> Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "se", "no", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"))

  private def toks(text: Column): Column = Shingling.tokens(lower(text))

  /** Fraction of tokens that are stopwords of language `lang`. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit(_)): _*)
    val t = toks(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, x => array_contains(sw, x))).cast("double") /
        size(t).cast("double"))
  }

  /** Heuristic language ID: the language with the highest stopword ratio
    * (ties broken lexicographically; all-zero -> "und" undetermined). */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => stopwordRatio(text, l))
    val best = greatest(scores: _*)
    // foldRight: earlier (lexicographically smaller) langs win ties
    langs.zip(scores).foldRight(lit("und"): Column) {
      case ((l, s), acc) => when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality features + a composite score in [0,1]:
    * 0.4*letter-char ratio + 0.3*capped mean token length/10 +
    * 0.3*(1 - punctuation ratio). Deterministic double arithmetic
    * (identical expression order in the SQL oracle). */
  def qualityScore(text: Column): Column = {
    val t = toks(text)
    val nChars = length(text).cast("double")
    val letters = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?'\"]", "")).cast("double")
    val meanTokLen = when(size(t) === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        size(t).cast("double"))
    when(nChars === 0, lit(0.0)).otherwise(
      lit(0.4) * (letters / nChars) +
        lit(0.3) * least(meanTokLen / lit(10.0), lit(1.0)) +
        lit(0.3) * (lit(1.0) - punct / nChars))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(toks(text))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * other non-space chars (a cheap proxy for tokenizer cost). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Order-sensitive document fingerprint: polynomial rolling hash over
    * md5-family token fingerprints. */
  def fingerprint(text: Column): Column =
    rolling_fingerprint(shingle_hashes_md5(toks(text)))

  /** Gopher-style repetition quality signals (Rae et al. 2021, App. A1.1)
    * as a pure projection — one kernel pass per document, no shuffle:
    * (doc_id, n_tokens, distinct_token_ratio, top_token_frac,
    * top_bigram_frac). Case-sensitive raw tokens (the corpus-filtering
    * form); see [[graft.core.Kernels.repetitionStats]]. */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    import graft.functions.GraftFunctions.repetition_stats
    // null text -> empty text -> all-zero stats, matching the SQL oracle's
    // LEFT JOIN + coalesce(0) shape (the kernel itself is nullIntolerant)
    docs.select(col(idCol), repetition_stats(coalesce(col(textCol), lit(""))).as("st"))
      .select(
        col(idCol),
        element_at(col("st"), 1).cast("long").as("n_tokens"),
        element_at(col("st"), 2).as("distinct_token_ratio"),
        element_at(col("st"), 3).as("top_token_frac"),
        element_at(col("st"), 4).as("top_bigram_frac"))
  }

  /** Gopher-style rule-based document filter (Rae et al. 2021, App.
    * A1.1 shape): composes the repetition signals and the composite
    * quality score into the pretraining keep/drop decision as ONE pure
    * projection — no shuffle at any scale. The output carries a
    * failed-rule bitmask (1 too-short, 2 too-long, 4 low-quality,
    * 8 dominant top token, 16 low distinct-token ratio) so every drop
    * is auditable; `keep` = no rule failed. */
  def qualityFilter(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                    minTokens: Long = 16, maxTokens: Long = 1000,
                    minQuality: Double = 0.5, maxTopTokenFrac: Double = 0.2,
                    minDistinctRatio: Double = 0.3): DataFrame = {
    import graft.functions.GraftFunctions.repetition_stats
    val st = repetition_stats(coalesce(col(textCol), lit("")))
    docs.select(
      col(idCol),
      element_at(st, 1).cast("long").as("n_tokens"),
      element_at(st, 2).as("distinct_token_ratio"),
      element_at(st, 3).as("top_token_frac"),
      // same null guard as the repetition stats: a null text must score
      // like empty text so the low-quality rule FIRES instead of the
      // null comparison silently evaluating false
      qualityScore(coalesce(col(textCol), lit(""))).as("quality"))
      .withColumn("fail_mask", (
        when(col("n_tokens") < minTokens, 1).otherwise(0) +
          when(col("n_tokens") > maxTokens, 2).otherwise(0) +
          when(col("quality") < minQuality, 4).otherwise(0) +
          when(col("top_token_frac") > maxTopTokenFrac, 8).otherwise(0) +
          when(col("distinct_token_ratio") < minDistinctRatio, 16).otherwise(0))
        .cast("int"))
      .withColumn("keep", col("fail_mask") === 0)
  }

  /** One-stop projection of all text-analysis columns. */
  def analyze(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      langId(col(textCol)).as("lang_pred"),
      qualityScore(col(textCol)).as("quality"),
      tokenCount(col(textCol)).as("n_tokens"),
      subwordCount(col(textCol)).as("n_subwords"),
      fingerprint(col(textCol)).as("fingerprint"))

  /** PII redaction patterns — shared verbatim with the DuckDB oracle
    * (both Java regex and RE2 interpret these identically; keep to the
    * common subset: classes, quantifiers, no backrefs/lookaround). */
  final val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val PhoneRe = "\\+?\\d[\\d -]{6,}\\d"

  /** Scrub emails then phone-like digit runs — the standard pre-training
    * PII pass, as a pure codegen projection (regexp_replace replaces ALL
    * matches in Spark; the oracle passes the 'g' flag for parity). */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Exact TF-IDF statistics in the log-free ratio form: per (doc, term)
    * — tf, df, and tf * (N / df). The ratio replaces the usual
    * log(N/df) so every value is one IEEE divide and one multiply,
    * bit-identical cross-engine (libm log is not correctly rounded and
    * differs between runtimes); the ranking it induces per term count is
    * the same. Scale shape: one explode + two hash aggregations; the
    * (term)-keyed join is vocabulary-sized, the corpus-sized side joins
    * by hash — never broadcast. */
  def tfidf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(toks(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term").crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf") * (col("n_docs").cast("double") / col("df").cast("double")))
          .as("tfidf"))
  }

  /** The corpus card as a streaming-safe single pass (no self-join): one
    * projection computing every per-row signal, then one hash aggregation
    * per (lang, source). All counters are integers, so the card is
    * cross-engine exact and — because sums and counts are commutative —
    * micro-batch-split-insensitive: the SAME operator maintains the card
    * over a stream in Complete output mode (the s13 gate) and equals the
    * one-shot batch oracle. Exact distinct-text counting is deliberately
    * absent here (not streamable in one bounded pass — that is what the
    * HLL sketch family is for; the batch t11 card carries it). */
  def corpusCard(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("lang"), col("source"),
        langId(col(textCol)).as("lang_pred"),
        qualityScore(col(textCol)).as("quality"),
        tokenCount(col(textCol)).cast("long").as("n_toks"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("sum_tokens"),
        sum(when(col("quality") >= 0.5, 1L).otherwise(0L)).as("n_quality_pass"),
        sum(when(col("lang_pred") === col("lang"), 1L).otherwise(0L)).as("n_lang_id_match"))

  /** Bigram-LM document fluency score — the CCNet / Wenzek et al. 2020
    * perplexity-filter shape with an exact-integer cross-entropy proxy.
    * The corpus's own bigram counts are the language model, and each
    * bigram occurrence (w1, w2) costs
    *   bits(w1, w2) = bitlen(count(w1, *)) − bitlen(count(w1, w2))
    * where bitlen(x) = number of binary digits of x. That is an integer
    * proxy of −log2 P(w2 | w1) accurate to within 1 bit per term, and it
    * is EXACT integer arithmetic — bit-identical cross-engine, where a
    * libm log2 would not be (the oracle contract bans transcendentals).
    * Ranking by bits_per_bigram reads like perplexity ranking: fluent
    * high-probability bigram chains cost few bits, rare or garbled ones
    * cost many. Output: (idCol, n_bigrams, h_bits, bits_per_bigram);
    * docs with fewer than 2 tokens score (0, 0, 0.0).
    *
    * Scale shape: bigram extraction is a pure array projection + explode
    * (no shuffle); the per-doc bigram TF, bigram LM, and left-context LM
    * are three hash aggregations with map-side combine; scoring joins the
    * corpus-sized TF to the vocabulary-bounded LM tables by term key (a
    * shuffle hash join — the LM side is bounded by vocabulary size, never
    * corpus size); the per-doc total is one more hash agg. No windows, no
    * driver-side iteration. */
  def lmScore(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val t = toks(col(textCol))
    val n = size(t)
    // get() is 0-based and null-safe out of bounds (no ANSI error); the
    // n >= 2 guard keeps sequence() ascending and explode() drops the
    // null arrays of short docs
    val bg = docs.select(col(idCol), explode(
        when(n >= 2, transform(sequence(lit(0), n - 2),
          i => struct(get(t, i).as("w1"), get(t, i + 1).as("w2"))))).as("p"))
      .select(col(idCol), col("p.w1"), col("p.w2"))
    val tf = bg.groupBy(idCol, "w1", "w2").agg(count(lit(1)).as("tf"))
    val bigLm = tf.groupBy("w1", "w2").agg(sum("tf").as("c2"))
    // conditional denominator: occurrences of w1 as a bigram left context
    val uniLm = bigLm.groupBy("w1").agg(sum("c2").as("c1"))
    val perDoc = tf.join(bigLm, Seq("w1", "w2")).join(uniLm, Seq("w1"))
      .groupBy(idCol)
      .agg(sum(col("tf")).as("n_bigrams"),
        sum((length(bin(col("c1"))) - length(bin(col("c2")))).cast("long") * col("tf"))
          .as("h_bits"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("h_bits"), lit(0L)).as("h_bits"))
      .withColumn("bits_per_bigram",
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(col("h_bits").cast("double") / col("n_bigrams").cast("double")))
  }

  /** Exact Okapi BM25 per (doc, term) in the log-free idf-ratio form:
    * idf_ratio = (N - df + 0.5) / (df + 0.5)   [monotone in the usual
    * log idf — same ranking per term, but one IEEE divide instead of a
    * runtime-dependent libm log, so bit-identical cross-engine], and
    * bm25 = idf_ratio * tf*(k1+1) / (tf + k1*(1 - b + b*(dl/avgdl))).
    * Every op is correctly-rounded double arithmetic evaluated in the
    * exact same tree shape as the SQL oracle.
    *
    * Scale shape: reuses the tfidf aggregations (explode + two hash
    * aggs); doc length joins by the corpus-keyed id hash; the two global
    * scalars (N, avgdl) broadcast. avgdl = sum(dl)::double / N::double —
    * one divide, bit-stable. */
  def bm25(docs: DataFrame, k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(toks(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = docs.select(col(idCol), tokenCount(col(textCol)).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    tf.join(dfreq, "term").join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("dl"),
        (((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))) *
          ((col("tf").cast("double") * lit(k1 + 1.0)) /
            (col("tf").cast("double") +
              lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))))
          .as("bm25"))
  }
}
