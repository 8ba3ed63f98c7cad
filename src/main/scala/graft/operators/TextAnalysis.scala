package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The ONE Column-side copy of the text normalization rule
    * (lower → collapse runs of whitespace → trim) — the twin of the
    * kernel-side GraftKernels.normText and the oracle-side
    * OracleSql.normText. Every Column-path consumer (words,
    * qualityMetrics, the HOF parity oracles, Dedup.contentHash) must
    * normalize through here: hand-rolled copies had already diverged
    * in operand order, and a future rule change applied to one copy
    * would silently desync e.g. mean_word_len's numerator from its
    * word-count denominator, or the parity oracles from the kernels
    * they replay. (lower commutes with the whitespace steps — no
    * case mapping produces or consumes whitespace — so unifying the
    * historical orderings changes nothing.) */
  private[graft] def normText(textCol: Column): Column =
    trim(regexp_replace(lower(textCol), "\\s+", " "))

  /** NOTE: on empty / whitespace-only text this yields `[""]` (split
    * with limit -1 never returns an empty array) — every token of
    * NON-degenerate text is non-empty, but counting surfaces must use
    * [[nonEmptyWords]] or a zero-content document reports one phantom
    * word. */
  def words(textCol: Column): Column =
    split(normText(textCol), " ")

  /** `words` minus the phantom empty token a zero-content document
    * produces — the correct basis for word COUNTS. */
  def nonEmptyWords(textCol: Column): Column =
    filter(words(textCol), w => length(w) > 0)

  def langScore(textCol: Column, lang: String): Column = {
    // fail at the call site with the supported set — stopwords(lang)
    // alone threw a bare NoSuchElementException from deep inside
    // Column construction (r13 review)
    require(stopwords.contains(lang),
      s"unsupported language '$lang' (supported: ${stopwords.keys.toSeq.sorted.mkString(", ")})")
    // let-bound: the naive `val ws` inlined the whole normalize+split
    // tree into BOTH the filter and the size denominator — the HOF
    // trees are CodegenFallback, so nothing deduplicates the copies
    // and every scored row paid the pipeline twice (langId already
    // binds; the standalone scorer must too)
    letBound(words(textCol))(scoreExpr(_, lang))
  }

  /** The ONE stopword-hit scoring rule over a let-bound word array —
    * shared by langScore and langId's argmax, which had inlined
    * identical copies (the normText two-copy drift shape: a future
    * rule change applied to one would silently disagree with the
    * other's winner; r16 review). isin = ONE In node per word, not a
    * 10-term Or(EqualTo) chain inside a CodegenFallback HOF on the
    * 100 TB hot path (r14 review; no nulls in either operand set, so
    * semantics match). */
  private def scoreExpr(ws: Column, lang: String): Column = {
    val hits = size(filter(ws, w => w.isin(stopwords(lang): _*)))
    hits.cast("double") / greatest(size(ws), lit(1)).cast("double")
  }

  /** LET-BINDING via a single-element transform: evaluates `bound`
    * ONCE per row and hands it to `body` as a lambda argument — naively
    * referencing a shared Column `val` twice would inline its whole
    * expression tree into every use, and the HOF trees are
    * CodegenFallback with LambdaVariables, so neither codegen nor
    * subexpression elimination saves the duplicate work. */
  private def letBound(bound: Column)(body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** Best-scoring language, 'und' when all scores are 0. */
  def langId(textCol: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    // two nested let-bindings: words() (regex collapse + lower + trim +
    // split) is computed once per row, AND the scored argmax struct is
    // computed once — the final when() reads `best` twice, which
    // without the inner binding would re-run all four language scans
    // (the whole scoring pipeline, twice per row, on the hot path of a
    // 100 TB curation pass).
    // array_max over struct orders lexicographically (score, then lang):
    // ties break toward the lexicographically LAST language — encode the
    // tie-break explicitly to keep the oracle trivially replayable.
    letBound(words(textCol)) { ws =>
      val scored = langs.map { l =>
        struct(scoreExpr(ws, l).as("s"), lit(l).as("l"))
      }
      letBound(array_max(array(scored: _*))) { best =>
        when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
      }
    }
  }

  /** Quality metrics: length, word count, mean word length, punctuation
    * ratio, stopword ratio, uppercase ratio — the standard cheap filters
    * (Gopher/C4-style) a 100 TB curation pass runs first.
    */
  def qualityMetrics(textCol: Column): Seq[(String, Column)] = {
    val len = length(textCol).cast("double")
    // normalized through the SAME shared rule as words(): trim strips
    // only ' ', so trimming BEFORE the collapse would leave a leading
    // "\t"/"\n" as a phantom character and inflate mean_word_len on
    // exactly the whitespace-framed text a crawl corpus is full of
    val nlen = length(normText(textCol)).cast("double")
    val ws = words(textCol)
    // counts use the non-empty basis: an empty document has 0 words, not
    // the 1 phantom token split() yields (see words() note)
    val nWords = size(nonEmptyWords(textCol)).cast("double")
    val punct = length(regexp_replace(textCol, "[^.,;:!?'\"()]", "")).cast("double")
    val upper0 = length(regexp_replace(textCol, "[^A-Z]", "")).cast("double")
    val enStops = stopwords("en")
    val stopHits = size(filter(ws, w => w.isin(enStops: _*))).cast("double")
    Seq(
      "n_chars_m" -> len,
      "n_words" -> nWords,
      // greatest(nWords-1, 0): at nWords = 0 the naive (nlen - (nWords-1))
      // would report mean word length 1 for a zero-word document
      "mean_word_len" -> (nlen - greatest(nWords - 1, lit(0.0d))) / greatest(nWords, lit(1.0d)),
      "punct_ratio" -> punct / greatest(len, lit(1.0d)),
      "upper_ratio" -> upper0 / greatest(len, lit(1.0d)),
      "stopword_ratio" -> stopHits / greatest(nWords, lit(1.0d)))
  }

  /** The metric names `qualityStruct` emits, in field order — shared
    * so a caller expanding the struct cannot drift from it. */
  val qualityMetricNames: Seq[String] = Seq(
    "n_chars_m", "n_words", "mean_word_len",
    "punct_ratio", "upper_ratio", "stopword_ratio")

  /** All quality metrics as ONE struct computed in a single pass: the
    * shared normalize+split pipeline is let-bound so it runs ONCE per
    * row. `qualityMetrics`' independent per-metric Columns each
    * re-inline that pipeline (~4 copies per row across the projection —
    * HOF trees are CodegenFallback and LambdaVariable trees are skipped
    * by subexpression elimination, so nothing dedups them; the langId
    * letBound precedent, r13 review). Callers select the struct in one
    * projection and expand fields in a second — CollapseProject leaves
    * a non-cheap multiply-referenced alias alone, so the struct is
    * evaluated once per row. This is the form the 100 TB first-pass
    * scan should use; `qualityMetrics` stays as the simple per-column
    * twin (and its spec pins the two equal). */
  def qualityStruct(textCol: Column): Column = {
    val len = length(textCol).cast("double")
    val punct = length(regexp_replace(textCol, "[^.,;:!?'\"()]", "")).cast("double")
    val upper0 = length(regexp_replace(textCol, "[^A-Z]", "")).cast("double")
    val enStops = stopwords("en")
    // bind the normalized text, then the word array derived from it:
    // nlen, the counts, and the stopword filter all read the SAME
    // evaluation instead of re-running collapse+lower+trim(+split)
    letBound(normText(textCol)) { nt =>
      letBound(split(nt, " ")) { ws0 =>
        val nlen = length(nt).cast("double")
        val nWords = size(filter(ws0, w => length(w) > 0)).cast("double")
        val stopHits = size(filter(ws0,
          w => length(w) > 0 && w.isin(enStops: _*))).cast("double")
        struct(
          len.as("n_chars_m"),
          nWords.as("n_words"),
          ((nlen - greatest(nWords - 1, lit(0.0d))) / greatest(nWords, lit(1.0d)))
            .as("mean_word_len"),
          (punct / greatest(len, lit(1.0d))).as("punct_ratio"),
          (upper0 / greatest(len, lit(1.0d))).as("upper_ratio"),
          (stopHits / greatest(nWords, lit(1.0d))).as("stopword_ratio"))
      }
    }
  }

  /** Whitespace token count — 0 for an empty or whitespace-only
    * document (non-empty word basis). */
  def tokenCountWs(textCol: Column): Column = size(nonEmptyWords(textCol))

  /** BPE-ish token count — one token per letter RUN ([A-Za-z]+), per
    * single DIGIT, and per single non-alphanumeric symbol (underscore
    * included): 'v2_2024' counts 7. Digit-by-digit and symbol-by-symbol
    * is deliberate (GPT-style pre-tokenizers split numbers); the q31
    * oracle replays exactly this rule, so "fixing" the regex to a
    * plain \w+ run count would silently break oracle parity.
    */
  // regexp_count: one regex pass, no rewritten copy of the document
  // materialized — the previous replace-then-length-diff shape ran two
  // full regexp_replace passes per row for the same count (identical
  // non-overlapping match semantics and NULL propagation, so the q31
  // oracle — which keeps the independent length-diff formulation — is
  // unaffected)
  def tokenCountBpe(textCol: Column): Column =
    regexp_count(textCol, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Gopher-style repetition metrics — the second tier of quality
    * filtering after `qualityMetrics`' cheap ratios: documents dominated
    * by one word or by repeated phrases are SEO spam / boilerplate, and
    * the published curation recipes (Gopher, RefinedWeb, FineWeb) gate
    * on exactly these fractions.
    *
    * Per document:
    *  - `top_word_frac`   — occurrences of the most frequent word / words
    *  - `distinct_word_frac` — distinct words / words
    *  - `dup_2gram_frac`  — 1 − distinct 2-grams / total 2-grams
    *  - `keep`            — the gate at the given thresholds
    *
    * Scale shape: ONE corpus scan. The per-doc 2-gram sizes are array
    * expressions computed in a projection BELOW the word explode, then
    * carried through the (doc, word) → doc aggregation chain as
    * grouping keys — constant per doc, so they cost key width, not a
    * second full-corpus scan + join (the previous two-branch shape
    * read the corpus end-to-end twice and shuffled both for a join).
    * The staging matters: putting the gram expressions in the SAME
    * select as explode() leaves them in the Project Catalyst's
    * ExtractGenerator places ABOVE the Generate, re-running the shingle
    * kernel once per WORD instead of once per document (measured ~2.2×
    * on the q65 bench). Shuffles stay keyed by doc id — linear,
    * skew-free: a document's work is bounded by its own length, never
    * by corpus size. No per-doc quadratic HOF scans.
    *
    * A document with NO words (empty/whitespace-only text) produces no
    * output row — there is nothing to measure; gate those with
    * `qualityMetrics`' n_chars instead. (Without the filter the phantom
    * empty token would count as a real word and flag the doc as
    * 100%-repetition spam.)
    */
  def repetitionMetrics(docs: DataFrame, textCol: String, idCol: String,
                        maxTopWordFrac: Double = 0.20,
                        maxDup2gramFrac: Double = 0.20): DataFrame = {
    // n_2grams (the TOTAL count, the dup-frac denominator) is derived
    // AFTER the aggregation from n_words: every emitted doc has a
    // non-empty word list (the explode filter drops the phantom empty
    // token and empty docs produce no row), so total 2-grams =
    // max(words-1, 1) = greatest(n_words - 1, 1) exactly. Computing it
    // up front re-evaluated the whole CodegenFallback normalize+split
    // pipeline a second time per document and carried a third grouping
    // key through both shuffles (r14 review; oracle derives the same
    // way).
    //
    // Identity contract: a per-document metric needs a document
    // identity, so NULL-id docs are excluded — the doc_id grouping
    // would otherwise pool every null-id doc that happens to share an
    // n_distinct_2grams value into one pseudo-document whose fractions
    // describe nothing, and the oracle's doc_id join drops those rows
    // anyway (a silent Spark/oracle divergence; r16 review —
    // Contamination documents its per-occurrence null rule the same
    // way). Duplicate doc_id rows remain the caller's contract (run
    // exact dedup upstream, as the q60 capstone does): deduping here
    // would cost a full-corpus shuffle keyed by text on every call to
    // defend against an ingest bug a cheaper upstream operator exists
    // to fix.
    val wordStats = docs
      .where(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(Dedup.shingles(col(textCol), 2)).cast("long").as("n_distinct_2grams"),
        words(col(textCol)).as("__graft_ws"))
      .select(col("doc_id"), col("n_distinct_2grams"),
        explode(col("__graft_ws")).as("w"))
      .where(col("w") =!= "")
      .groupBy("doc_id", "n_distinct_2grams", "w")
      .agg(count(lit(1)).as("wn"))
      .groupBy("doc_id", "n_distinct_2grams").agg(
        sum("wn").as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max("wn").as("top_word_n"))
      .withColumn("n_2grams", greatest(col("n_words") - 1, lit(1L)))
    wordStats
      .select(col("doc_id"), col("n_words"),
        (col("top_word_n").cast("double") / col("n_words")).as("top_word_frac"),
        (col("n_distinct_words").cast("double") / col("n_words")).as("distinct_word_frac"),
        (lit(1.0d) - col("n_distinct_2grams").cast("double") / col("n_2grams")).as("dup_2gram_frac"))
      .withColumn("keep",
        col("top_word_frac") <= maxTopWordFrac && col("dup_2gram_frac") <= maxDup2gramFrac)
  }

  /** CCNet-style unigram language-model scoring — the perplexity-proxy
    * quality pass the published curation pipelines (CCNet, RedPajama,
    * FineWeb) run after the cheap heuristics: documents whose words are
    * improbable under the corpus's own unigram distribution are
    * boilerplate/garbled/outlier text.
    *
    * Model: p(w) = corpus count / total words, vocabulary capped at the
    * top `vocabSize` words (ties → lexicographic, so the cut is
    * deterministic and SQL-replayable); out-of-vocabulary words score
    * the floor probability 1/(total+1). Per document: `nll` = mean of
    * −ln p(w) over its words (e^nll = the perplexity proxy). Rounded to
    * 4 decimals so the DuckDB oracle's float-sum order cannot flip the
    * compare.
    *
    * Scale shape: ONE explode+groupBy builds the counts (shuffle keyed
    * by word, map-side partial agg absorbs the Zipf head); the vocab is
    * a bounded TakeOrdered (top-V, no global sort) broadcast to the
    * scoring join; totals ride a broadcast scalar. The scoring pass is
    * a narrow explode → broadcast-hash join → per-doc agg keyed by doc
    * id — linear, skew-free, no all-pairs anywhere. Documents with no
    * words produce no row (nothing to score), like repetitionMetrics.
    */
  def unigramNll(docs: DataFrame, textCol: String, idCol: String,
                 vocabSize: Int = 50000): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val w = docs.select(col(idCol).as("doc_id"),
      explode(nonEmptyWords(col(textCol))).as("w"))
    val counts = w.groupBy("w").agg(count(lit(1)).as("n"))
    // total over ALL words (not just the vocab cut) → p is a true
    // corpus distribution; a one-row broadcast scalar
    val total = counts.agg(sum("n").as("total"))
    val vocab = counts.orderBy(col("n").desc, col("w")).limit(vocabSize)
    w.join(broadcast(vocab), Seq("w"), "left")
      .crossJoin(broadcast(total))
      .withColumn("lp", -log(coalesce(
        col("n").cast("double") / col("total"),
        lit(1.0d) / (col("total") + 1))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), round(avg("lp"), 4).as("nll"))
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
    val norm = normText(textCol)
    val codes = transform(sequence(lit(1), length(norm)),
      i => ascii(norm.substr(i, lit(1))).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => (acc * 31L + c) % 1000000007L)
  }
}
