package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised feature encodings — the two classical tabular-featurization
  * operators a training pipeline runs before a linear model or GBM, both
  * expressed as pure counting aggregates (no iteration, exact ANSI-SQL
  * oracle twins, map-side-combinable at any scale).
  */
object Encode {

  /** Weight-of-evidence binning + information value of a numeric feature
    * against a binary target: fixed-width bins (deterministic, no global
    * sort — a quantile binning would need a percentile pass first), then
    * per bin WoE = ln(good_share / bad_share) with add-0.5 Laplace
    * smoothing so empty cells stay finite, and the IV decomposition
    * IV_i = (good_share − bad_share) · WoE_i. One scan, one bins-sized
    * aggregate; shares are exact (int + 0.5)/(int + 0.5·bins) ratios so
    * the single `ln` is cross-engine deterministic.
    *
    * Output: one row per occupied bin (bin, n, n_bad, woe, iv_part) —
    * `sum(iv_part)` is the feature's IV, the screening statistic
    * (<0.02 useless, >0.5 suspicious-leaky by the usual credit-scoring
    * reading). */
  def woeBins(df: DataFrame, valueCol: String, target: Column,
      binWidth: Double, maxBin: Int = 9): DataFrame = {
    val bin = least(floor(col(valueCol) / binWidth), lit(maxBin)).cast("int")
    val bins = df
      .select(bin.as("bin"), target.cast("int").as("bad"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("bad")).as("n_bad"))
    val tot = bins.agg(sum(col("n")).as("tot_n"), sum(col("n_bad")).as("tot_bad"))
    val nBins = maxBin + 1
    bins.crossJoin(broadcast(tot))
      .withColumn("good_share",
        (col("n") - col("n_bad") + lit(0.5)) /
          (col("tot_n") - col("tot_bad") + lit(0.5 * nBins)))
      .withColumn("bad_share",
        (col("n_bad") + lit(0.5)) / (col("tot_bad") + lit(0.5 * nBins)))
      .select(col("bin"), col("n"), col("n_bad"),
        round(log(col("good_share") / col("bad_share")), 4).as("woe"),
        round((col("good_share") - col("bad_share")) *
          log(col("good_share") / col("bad_share")), 6).as("iv_part"))
  }

  /** Out-of-fold mean-target encoding — the leak-free way to turn a
    * categorical column into the target's conditional mean: a row's
    * encoding must not include its own target, or the feature leaks the
    * label and the model memorizes. Rows are assigned k folds by the
    * engine-wide md5 base (reproducible across engines/layout), and fold
    * f's encoding for category c is the mean over the OTHER folds —
    * computed by the complement trick (category total − fold subtotal) /
    * (category count − fold count), so the whole table costs ONE
    * (category × fold) aggregate, not k passes. Output is the encoding
    * TABLE (category, fold, n_out, encoding), the broadcast-sized
    * artifact a training job maps onto rows by (category, fold). */
  def targetEncodeOof(df: DataFrame, idCol: String, catCol: String,
      targetCol: String, folds: Int = 5): DataFrame = {
    val fold = (call_function("graft_md5_prefix",
      col(idCol).cast("string"), lit(7)) % folds).cast("int")
    val perFold = df
      .select(col(catCol).as("category"), fold.as("fold"),
        col(targetCol).as("y"))
      .groupBy(col("category"), col("fold"))
      .agg(count(lit(1)).as("n_f"), sum(col("y")).as("s_f"))
    val perCat = perFold.groupBy(col("category"))
      .agg(sum(col("n_f")).as("n_c"), sum(col("s_f")).as("s_c"))
    perFold.join(perCat, Seq("category"))
      .select(col("category"), col("fold"),
        (col("n_c") - col("n_f")).as("n_out"),
        round((col("s_c") - col("s_f")) /
          (col("n_c") - col("n_f")).cast("double"), 4).as("encoding"))
  }
}
