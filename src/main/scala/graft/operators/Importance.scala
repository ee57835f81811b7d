package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Data selection by hashed-feature importance resampling — the DSIR
  * recipe (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): score every source document by how much more
  * likely its hashed token features are under the TARGET distribution
  * than under the SOURCE distribution, then keep the top-weighted slice.
  * The reference delegates corpus curation entirely to notebooks
  * (`/root/reference/pyspark-3.ipynb` filters rows by literal predicates);
  * this is the scale-path generalization a training-data pipeline uses to
  * match a small high-quality target mix.
  *
  * Shape, and why it scales to 100 TB:
  *  - features are HASHED token slots ([[Sampling.hashBucket]] md5, `dim`
  *    buckets) — no vocabulary build, no global dictionary, map-side only;
  *  - the two feature distributions (target, source) are ONE shared
  *    aggregation over the exploded tokens (`dim`-row result — the target
  *    rows ride a conditional sum, not a second scan);
  *  - the per-slot log-ratio table is `dim` rows, broadcast to the
  *    per-document weight sum — the corpus is never shuffled, only its
  *    (doc, slot) token counts are (bounded by dim per doc);
  *  - cross-engine determinism rides the NaiveBayes convention: each log
  *    is rounded to 6 dp, scaled to integer MICRO-units, and summed as
  *    longs — `Σ tf·lr_micro` is exact in any summation order, so the
  *    weight is layout-invariant.
  *
  * Laplace smoothing (+1 per slot over `total + dim`) keeps empty slots
  * finite on both sides. Documents with zero tokens have no feature rows
  * and are absent from the result (a curation gate upstream decides their
  * fate, not a fabricated weight). */
object Importance {

  /** (doc_id, logw_micro): the integer-micro log importance weight
    * `Σ_slot tf(doc, slot) · [log p_target(slot) − log p_source(slot)]`
    * for every document with ≥1 token. `isTarget` marks the target-
    * distribution exemplars (they stay in the source distribution too —
    * DSIR's source is the full corpus). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int = 64): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val feats = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(Text.tokens(col(textCol))).as("term"))
      .select(col("doc_id"), col("is_target"),
        Sampling.hashBucket(col("term"), dim).as("slot"))
    // both corpus distributions in ONE pass: source counts every token,
    // target counts the exemplar rows via a conditional sum
    val stats = feats.groupBy(col("slot"))
      .agg(count(lit(1)).as("n_src"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("n_tgt"))
    val totals = stats.agg(sum(col("n_src")).as("tot_src"),
      sum(col("n_tgt")).as("tot_tgt"))
    // per-slot log-ratio in integer micro-units; each log rounded to 6 dp
    // then micro-scaled with a second round-to-integer (the NaiveBayes
    // convention — a bare cast would truncate 0.9999... representation
    // error into an off-by-one), differenced as exact longs
    def logMicro(n: Column, tot: Column): Column =
      round(round(log((n + 1) / (tot + dim).cast("double")), 6) * 1e6)
        .cast("long")
    val ratios = stats.crossJoin(broadcast(totals))
      .select(col("slot"),
        (logMicro(col("n_tgt"), col("tot_tgt")) -
          logMicro(col("n_src"), col("tot_src"))).as("lr_micro"))
    feats.groupBy(col("doc_id"), col("slot")).agg(count(lit(1)).as("tf"))
      .join(broadcast(ratios), "slot")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("lr_micro")).as("logw_micro"))
  }

  /** The selection: top `k` documents by importance weight (weight desc,
    * id asc — fully deterministic). Plans as TakeOrderedAndProject: each
    * partition keeps its local top-k, the driver merges k rows, never a
    * global sort. */
  def resampleTopK(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, dim: Int = 64): DataFrame =
    importanceWeights(docs, idCol, textCol, isTarget, dim)
      .orderBy(col("logw_micro").desc, col("doc_id"))
      .limit(k)
}
