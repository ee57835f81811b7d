package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline surface
  * (BASELINE.json north star; SURVEY.md §7.9): tokenization, n-gram
  * shingling, quality scoring, language-ID scoring, fingerprinting.
  *
  * Everything here is a pure `Column` expression built from codegen'd
  * built-ins (no UDFs) so whole-stage codegen keeps the scan → project
  * pipeline in one JIT'd loop, and the identical formula can be written in
  * ANSI SQL for the DuckDB oracle.
  */
object Text {

  /** Let-binding for Column expressions: evaluate `e` ONCE and reference it
    * as a bound lambda variable inside `f`. Higher-order functions run
    * interpreted (no codegen, no common-subexpression elimination), so an
    * expression referenced k times inside a lambda is re-EVALUATED k times —
    * for `element_at(split(...), i)` inside a shingle transform that is
    * O(tokens²) re-splits per document. Binding through a one-element array
    * makes every reference an O(1) variable read. */
  def let(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** Whitespace tokens of the lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Character n-grams of `text` (positions 1..len−n+1), empty when the
    * text is shorter than n (guarded against `sequence`'s descending
    * range). Let-bound so the text expression evaluates once, not once
    * per gram. */
  def charNgrams(text: Column, n: Int): Column = let(text) { t =>
    when(length(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
  }

  /** Word n-gram shingles ("w1 w2 w3"). Empty array when the document has
    * fewer than n tokens (guarded: Spark's `sequence(1,0)` would count
    * DOWN, not produce an empty range). The token array is let-bound so
    * each element_at is an index into an evaluated array, not a re-split. */
  def shingles(text: Column, n: Int): Column =
    let(tokens(text)) { t =>
      when(size(t) >= n,
        transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(t, i + lit(j))): _*)))
        .otherwise(array().cast("array<string>"))
    }

  /** Count of regexp matches (punctuation, digits, CJK, ...). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** PII scrub patterns, applied IN ORDER (SSN before the phone shape so
    * `ddd-dd-dddd` isn't half-eaten as a phone number). The single source
    * both engines derive from — [[redactPii]] folds them through Spark
    * `regexp_replace` and the oracle nests DuckDB `regexp_replace(…,'g')`
    * — so every pattern must stay in the Java∩RE2 dialect: no
    * backreferences, no lookaround. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b" -> "<SSN>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>",
    "\\+?[0-9]{1,3}[ .-]?\\(?[0-9]{3}\\)?[ .-]?[0-9]{3}[ .-]?[0-9]{2,4}" -> "<PHONE>",
  )

  /** Redact emails, SSNs, IPv4s and phone-shaped digit groups — the
    * pre-training scrub stage. Pure codegen'd regexp_replace chain;
    * deterministic, so the redacted corpus is reproducible. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** BPE-ish subword-boundary tokenization: letter runs, digit runs, and
    * single non-alphanumeric symbols each count as a token — the shape a
    * byte-pair tokenizer's pre-split uses, and a closer proxy for LLM
    * token budgeting than whitespace words. Pure regex, portable to SQL. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Ratio of tokens found in a marker/stopword list. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit(_).cast("string")): _*)))

  /** Stopword lists per language for the n-gram/stopword language-ID
    * heuristic. Deterministic, public-knowledge marker words. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "in", "to", "it"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est"),
    "es" -> Seq("el", "los", "las", "de", "y", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist"),
  )

  /** Language-ID: score = stopword hits per language (CJK-character count
    * for zh), predict the argmax with a fixed tie-break order
    * en > fr > es > de > zh > und. */
  def languageScores(text: Column): Map[String, Column] =
    stopwords.map { case (lang, words) => lang -> markerHits(text, words) } +
      ("zh" -> matchCount(text, "[\\x{4e00}-\\x{9fff}]"))

  def predictedLanguage(text: Column): Column = {
    val s = languageScores(text)
    val langs = Seq("en", "fr", "es", "de", "zh")
    val best = greatest(langs.map(s): _*)
    langs.foldRight(lit("und")) { (l, alt) => when(s(l) > 0 && s(l) === best, lit(l)).otherwise(alt) }
  }

  /** Quality-scoring features: char length, token count, average token
    * length, punctuation ratio, stopword ratio, digit ratio. A composite
    * 0..1 score mirrors common pre-training quality filters (length in
    * range, low symbol noise, has stopwords). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nToks  = tokenCount(text)
    Seq(
      "n_chars"        -> nChars,
      "n_tokens"       -> nToks,
      "avg_token_len"  -> round(nChars.cast("double") / nToks, 4),
      "punct_ratio"    -> round(matchCount(text, "[.,;:!?]").cast("double") / nChars, 4),
      "digit_ratio"    -> round(matchCount(text, "[0-9]").cast("double") / nChars, 4),
      "stopword_ratio" -> round(markerHits(text, stopwords("en")).cast("double") / nToks, 4),
    )
  }

  /** Overlapping token-window chunks — the doc→chunk split an embedding /
    * RAG pipeline runs before encoding (windows of `size` tokens advancing
    * by `size - overlap`). Returns an array of (chunk_id, chunk_text)
    * structs; explode it for one row per chunk. A doc shorter than `size`
    * yields exactly one chunk. Pure map-side projection: chunk count and
    * text derive from the let-bound token array, no shuffle, no UDF. */
  def chunkSpans(text: Column, size: Int, overlap: Int): Column = {
    val stride = size - overlap
    require(stride > 0, s"overlap ($overlap) must be < size ($size)")
    let(tokens(text)) { t =>
      // chunks = 1 + ceil((n - size) / stride) for n > size, else 1
      val extra = greatest(org.apache.spark.sql.functions.size(t) - size, lit(0))
      val nChunks = lit(1) + floor((extra + (stride - 1)) / lit(stride)).cast("int")
      transform(sequence(lit(0), nChunks - 1), k => struct(
        k.as("chunk_id"),
        concat_ws(" ", slice(t, k * stride + 1, lit(size))).as("chunk_text")))
    }
  }

  /** Document fingerprint: md5 of whitespace-normalized lower-cased text.
    * Exact-dedup key that is stable under trivial whitespace edits.
    * Collapse runs FIRST, then trim: `trim` only strips the space
    * character, so trimming before collapsing would leave a trailing
    * space behind a trailing tab (found by the ScalaCheck property). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))
}
