package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-level duplicated-SPAN detection and removal — the sub-document
  * tier of the dedup ladder (exact / MinHash / SimHash work at document
  * granularity; this works at token-window granularity). The shape follows
  * the "deduplicating training data" recipe: any k-token span whose exact
  * content occurs more than once in the whole corpus is boilerplate —
  * navigation chrome, license headers, templated passages — and the scrub
  * form removes every token covered by such a span while keeping the
  * document's unique remainder. (Reference analogue: none — the reference
  * dedups nothing; this belongs to the mandated LLM-pipeline surface,
  * BASELINE.json north star.)
  *
  * Scale shape (100 TB): one map-side pass hashes every k-span (md5 over
  * the let-bound token array — no re-splits), ONE shuffle on span_hash
  * annotates each occurrence with its corpus-wide population via a window
  * census (count over the hash partition — a spillable sort, never a
  * per-hash membership array, same discipline as [[Dedup.MaxBucket]]'s
  * census), and one shuffle on doc_id folds duplicated spans back onto
  * their documents. Nothing ever joins span occurrences pairwise: a span
  * repeated 10⁸ times contributes 10⁸ census rows, not C(10⁸,2) pairs.
  * Covered-token counting is an interval union done with a lag window
  * (every span has length k, so a span's NEW coverage is
  * `min(k, start − prev_start)`) — O(spans) with no per-token explode on
  * the report path; only the scrub path explodes covered positions, and
  * only for the duplicated spans.
  */
object SpanDedup {

  /** md5 of each overlapping k-token span, with its 0-indexed start
    * position. Docs shorter than k tokens emit none (same guard as
    * [[Text.shingles]] — `sequence(1,0)` would count DOWN). */
  def spanHashArray(text: Column, k: Int): Column =
    Text.let(Text.tokens(text)) { t =>
      when(size(t) >= k,
        transform(sequence(lit(1), size(t) - (k - 1)),
          i => md5(concat_ws(" ", (0 until k).map(j => element_at(t, i + lit(j))): _*))))
        .otherwise(array().cast("array<string>"))
    }

  /** Exploded (doc_id, start, span_hash) rows — map-side only. */
  def spanHashes(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), posexplode(spanHashArray(col("text"), k)))
      .toDF("doc_id", "start", "span_hash")

  /** Span occurrences whose hash appears more than once corpus-wide
    * (including twice within one document). Window census over the hash —
    * the same one-shuffle annotate-then-filter shape as
    * [[Dedup.candidatePairsFromBands]], no self-join, no hash→members
    * array. */
  def duplicatedSpans(docs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("span_hash"))
    spanHashes(docs, k)
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") > 1)
      .select(col("doc_id"), col("start"))
  }

  /** Per-document duplication report: how many of the doc's k-spans are
    * corpus-duplicated and what fraction of its TOKENS a duplicated span
    * covers — the signal a quality gate cuts on (high dup_token_frac =
    * templated/boilerplate page). Covered tokens are the interval UNION of
    * the doc's duplicated spans: sorted by start, a span adds
    * `min(k, start − prev_start)` new tokens (k for the first). Docs with
    * no duplicated span report zeros. */
  def dupSpanReport(docs: DataFrame, k: Int): DataFrame =
    reportFromDuplicated(docs, duplicatedSpans(docs, k), k)

  /** Report tail over an explicit duplicated-(doc_id, start) relation —
    * shared by the batch census path above and the streaming twin
    * ([[graft.streaming.StreamingSpanDedup]]), whose duplicated set comes
    * from probing the persisted corpus census instead. */
  def reportFromDuplicated(docs: DataFrame, dup: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val prev  = lag(col("start"), 1).over(byDoc)
    val agg = dup
      .withColumn("gain",
        when(prev.isNull, lit(k)).otherwise(least(lit(k), col("start") - prev)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("gain")).as("n_dup_tokens"))
    docs
      .select(col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"),
        greatest(Text.tokenCount(col("text")) - (k - 1), lit(0)).as("n_spans"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        round(coalesce(col("n_dup_tokens"), lit(0L)) /
          col("n_tokens").cast("double"), 4).as("dup_token_frac"))
  }

  /** The scrub output: each document's text with every token that any
    * corpus-duplicated k-span covers REMOVED, remaining tokens rejoined in
    * order (whitespace-normalized lower-case, like [[Text.fingerprint]]).
    * Covered 1-indexed positions aggregate to one per-doc set — bounded by
    * the doc's own token count, never by corpus size — then removal is a
    * map-side array filter over the let-bound tokens. A document that is
    * entirely boilerplate scrubs to the empty string. */
  def scrub(docs: DataFrame, k: Int): DataFrame = {
    val covered = duplicatedSpans(docs, k)
      .select(col("doc_id"),
        explode(sequence(col("start") + 1, col("start") + k)).as("pos"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("cov"))
    docs.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        Text.let(Text.tokens(col("text"))) { t =>
          concat_ws(" ", filter(
            transform(sequence(lit(1), size(t)),
              i => when(array_contains(col("cov"), i), lit(null))
                .otherwise(element_at(t, i))),
            x => x.isNotNull))
        }.as("clean_text"))
  }
}
