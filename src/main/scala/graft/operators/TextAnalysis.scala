package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Everything is a pure `Column` expression (codegen'd, shuffle-free,
  * trivially parallel at 100 TB — a narrow map over the corpus).
  * Each is also SQL-expressible, so the DuckDB oracle can replay the
  * exact formula.
  */
object TextAnalysis {

  /** Stopword-ratio language ID heuristic: score per language = fraction
    * of words in that language's tiny stopword set; argmax wins,
    * 'und' (undetermined) when no evidence. N-gram-free variant of the
    * classic n-gram profile method — deterministic and SQL-replayable.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de" -> Seq("der", "die", "und", "das", "von", "mit", "den", "ist", "im", "ein"))

  def words(textCol: Column): Column =
    split(lower(trim(regexp_replace(textCol, "\\s+", " "))), " ")

  def langScore(textCol: Column, lang: String): Column = {
    val ws = words(textCol)
    val hits = size(filter(ws, w => stopwords(lang).map(s => w === s).reduce(_ || _)))
    hits.cast("double") / greatest(size(ws), lit(1)).cast("double")
  }

  /** Best-scoring language, 'und' when all scores are 0. */
  def langId(textCol: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.map(l => struct(langScore(textCol, l).as("s"), lit(l).as("l")))
    // array_max over struct orders lexicographically (score, then lang):
    // ties break toward the lexicographically LAST language — encode the
    // tie-break explicitly to keep the oracle trivially replayable.
    val best = array_max(array(scored: _*))
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** Quality metrics: length, word count, mean word length, punctuation
    * ratio, stopword ratio, uppercase ratio — the standard cheap filters
    * (Gopher/C4-style) a 100 TB curation pass runs first.
    */
  def qualityMetrics(textCol: Column): Seq[(String, Column)] = {
    val len = length(textCol).cast("double")
    val nlen = length(regexp_replace(lower(trim(textCol)), "\\s+", " ")).cast("double")
    val ws = words(textCol)
    val nWords = size(ws).cast("double")
    val punct = length(regexp_replace(textCol, "[^.,;:!?'\"()]", "")).cast("double")
    val upper0 = length(regexp_replace(textCol, "[^A-Z]", "")).cast("double")
    val enStops = stopwords("en")
    val stopHits = size(filter(ws, w => enStops.map(s => w === s).reduce(_ || _))).cast("double")
    Seq(
      "n_chars_m" -> len,
      "n_words" -> nWords,
      "mean_word_len" -> (nlen - (nWords - 1)) / greatest(nWords, lit(1.0d)),
      "punct_ratio" -> punct / greatest(len, lit(1.0d)),
      "upper_ratio" -> upper0 / greatest(len, lit(1.0d)),
      "stopword_ratio" -> stopHits / greatest(nWords, lit(1.0d)))
  }

  /** Whitespace token count. */
  def tokenCountWs(textCol: Column): Column = size(words(textCol))

  /** BPE-ish token count: splits on word boundaries and punctuation the
    * way a byte-pair tokenizer's pre-tokenizer does (letters / digits /
    * single punctuation), i.e. `\w+` runs and non-space symbols.
    */
  def tokenCountBpe(textCol: Column): Column = {
    val cleaned = regexp_replace(textCol, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]", "#")
    length(cleaned) - length(regexp_replace(cleaned, "#", ""))
  }

  /** Polynomial rolling hash of the normalized text — the document
    * fingerprint (exact-dup key; cheap first-pass clustering).
    * hash = fold(acc·31 + code) mod (1e9+7), P=31 — the modulus keeps
    * every intermediate in BIGINT range (overflow-free under ANSI SQL
    * on BOTH Spark and the DuckDB oracle, which replays the same fold).
    */
  def fingerprint(textCol: Column): Column =
    graft.functions.GraftKernels.fingerprintCol(textCol)

  /** Interpreted HOF fingerprint — parity-test oracle only. */
  private[graft] def fingerprintHof(textCol: Column): Column = {
    val norm = lower(trim(regexp_replace(textCol, "\\s+", " ")))
    val codes = transform(sequence(lit(1), length(norm)),
      i => ascii(norm.substr(i, lit(1))).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => (acc * 31L + c) % 1000000007L)
  }
}
