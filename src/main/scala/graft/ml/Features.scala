package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Sampling

/** Feature engineering for distributed classifiers: the hashing trick —
  * a FIXED-dimension token-count vector per document, with slot
  * `md5(term) mod dim` instead of a learned vocabulary.
  *
  * Why hashing instead of a vocabulary: no global fit pass, no broadcast
  * dictionary, no out-of-vocabulary case — every executor maps any term
  * to its slot independently, so featurization is a pure map-side
  * projection that composes with streaming ingest. The cost is hash
  * collisions (bounded by dim), the standard trade (Weinberger et al.,
  * ICML'09 "Feature Hashing for Large Scale Multitask Learning").
  *
  * Determinism: the slot hash is the same first-7-md5-nibbles integer the
  * split/sampling tier uses ([[Sampling.hashBucket]]), so vectors are
  * identical across runs, engines and partitionings, and the SQL oracle
  * replays them exactly. */
object Features {

  /** (id, features array[dim]) — token counts folded into `dim` hash
    * slots. One explode + one (id, slot) count aggregate (map-side
    * combinable) + one per-doc map assembly; docs with no tokens vanish
    * with the explode (empty text still yields the "" token, so only a
    * null text column drops). */
  def hashedTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    docs.select(col(idCol).as("id"),
        explode(Text.tokens(col(textCol))).as("term"))
      .select(col("id"), Sampling.hashBucket(col("term"), dim).as("slot"))
      .groupBy(col("id"), col("slot"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("slot"), col("n")))).as("m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0L))).as("features"))
  }
}
