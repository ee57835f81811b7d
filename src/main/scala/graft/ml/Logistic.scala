package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic regression by batch gradient descent — the
  * iterative-optimizer complement to [[Regression.closedFormCoeffs]]
  * (normal equations) and [[NaiveBayes]] (counting): binary
  * cross-entropy loss, full-batch gradient, fixed step size.
  *
  * Scale shape: each iteration is ONE map-side-combinable aggregation
  * over the (standardized) feature relation — the gradient is an average
  * of per-row (σ(w·x) − y)·x terms, exactly the shape partial
  * aggregation distributes. The coefficient vector is a ONE-ROW
  * DataFrame carried between iterations as a broadcast (the Lloyd/
  * codebook-refine pattern — never collected), checkpointed each step so
  * the plan stays O(1) in iteration count.
  *
  * Cross-engine determinism: features standardize against ROUNDED
  * moments, coefficients round to 6 after EVERY step (drift cannot
  * compound — the TextRank rule), and gradients are n-divided averages,
  * so float-sum noise stays orders below the rounding grid. */
object Logistic {

  /** Standardize `cols` in one pass against round-4 moments: the
    * [[graft.operators.Curate]] scaler shape, inlined so the model and
    * its oracle share one definition. */
  def standardized(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(round(avg(col(c)), 4).as(s"mu_$c"),
      round(stddev_pop(col(c)), 4).as(s"sd_$c")))
    val moments = df.agg(aggs.head, aggs.tail: _*)
    // A zero (or rounding-to-zero) stddev would z-score to null and
    // propagate silently into null gradients/coefficients downstream —
    // bad data should name itself (the resampleGapfill convention).
    val z = cols.map(c =>
      ((col(c) - col(s"mu_$c")) /
        when(col(s"sd_$c") > 0, col(s"sd_$c"))
          .otherwise(raise_error(lit(
            s"standardized: feature '$c' has (near-)zero variance — " +
              "drop it or rescale before fitting")))).as(s"z_$c"))
    df.crossJoin(broadcast(moments))
      .select(df.columns.map(col).toSeq ++ z: _*)
  }

  /** Fit (w0, w_<feature>...) by `iterations` GD steps at rate `lr` from
    * w = 0 over standardized features; `label` must be 0/1. Returns ONE
    * row: the final coefficients plus the training log-loss at those
    * weights, all rounded 6. */
  def fitGd(df: DataFrame, featureCols: Seq[String], label: Column,
      iterations: Int = 3, lr: Double = 1.0): DataFrame = {
    require(featureCols.nonEmpty && iterations >= 1)
    val names = "w0" +: featureCols.map(c => s"w_$c")
    val z = standardized(df.withColumn("y", label.cast("double")), featureCols)
      .select(col("y") +: featureCols.map(c => col(s"z_$c")): _*)
      .localCheckpoint(false)

    def marginOf(): Column = featureCols
      .map(c => col(s"z_$c") * col(s"w_$c"))
      .foldLeft(col("w0"): Column)(_ + _)

    var w = z.sparkSession.range(1)
      .select(names.map(n => lit(0.0).as(n)): _*)
    (1 to iterations).foreach { _ =>
      val err = lit(1.0) / (lit(1.0) + exp(-marginOf())) - col("y")
      val gradAggs = round(avg(err), 6).as("g0") +:
        featureCols.map(c => round(avg(err * col(s"z_$c")), 6).as(s"g_$c"))
      val grads = z.crossJoin(broadcast(w))
        .agg(gradAggs.head, gradAggs.tail: _*)
      val gNames = "g0" +: featureCols.map(c => s"g_$c")
      w = w.crossJoin(broadcast(grads))
        .select(names.zip(gNames).map { case (wn, gn) =>
          round(col(wn) - lit(lr) * col(gn), 6).as(wn) }: _*)
        .localCheckpoint(false)
    }
    val p = lit(1.0) / (lit(1.0) + exp(-marginOf()))
    z.crossJoin(broadcast(w))
      .agg(names.map(n => first(col(n)).as(n)).head,
        names.map(n => first(col(n)).as(n)).tail :+
          round(-avg(col("y") * log(p) +
            (lit(1.0) - col("y")) * log(lit(1.0) - p)), 6).as("log_loss"): _*)
  }

  /** Exact ROC-AUC of a score against a 0/1 label — the tie-corrected
    * Mann–Whitney U, NOT a sampled curve: collapse to the per-score
    * census (score, n_pos, n_neg), run one ordered window for the
    * cumulative negatives below each score, and fold
    * U = Σ n_pos·(neg_below + neg_tied/2). Everything is integer (the
    * /2 lands on exact halves) until the single final division, so the
    * statistic is engine-exact at any scale. On a CONTINUOUS score the
    * per-score census is Θ(corpus), so the cumulative negatives come
    * from [[graft.operators.Sampling.orderedCensusCumsum]] range bands —
    * per-band negative masses broadcast back as offsets, the census-side
    * window is partitioned by band, bit-identical to the global window. */
  def auc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val census = df
      .select(score.as("s"), label.cast("int").as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).cast("long").as("n_pos"),
        (count(lit(1)) - sum(col("y"))).cast("long").as("n_neg"))
    graft.operators.Sampling.orderedCensusCumsum(census, col("s"),
        weights = Seq("neg" -> col("n_neg")))
      .withColumn("neg_below", col("cum_neg"))
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"),
        sum(col("n_pos") * (col("neg_below").cast("double") +
          col("n_neg") * lit(0.5))).as("u"))
      .select(col("n_pos"), col("n_neg"),
        round(col("u") / (col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Full precision/recall curve from the same per-score census as
    * [[auc]]: at every DISTINCT score s (as threshold, predict positive
    * when score ≥ s), tp/fp are running sums down the score order and
    * precision/recall are integer ratios — the exact curve, no sampling,
    * no per-row work after the census. The descending inclusive running
    * sums come from the banded ascending EXCLUSIVE prefixes of
    * [[graft.operators.Sampling.orderedCensusCumsum]]:
    * tp(s) = total_pos − pos_below(s) — exact long identities, never a
    * corpus-sized single-task sort. */
  def prCurve(df: DataFrame, score: Column, label: Column): DataFrame = {
    val census = df
      .select(score.as("s"), label.cast("int").as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).cast("long").as("n_pos"),
        (count(lit(1)) - sum(col("y"))).cast("long").as("n_neg"))
    graft.operators.Sampling.orderedCensusCumsum(census, col("s"),
        weights = Seq("pos" -> col("n_pos"), "neg" -> col("n_neg")))
      .withColumn("tp", col("total_pos") - col("cum_pos"))
      .withColumn("fp", col("total_neg") - col("cum_neg"))
      .select(col("s").as("threshold"), col("tp"), col("fp"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
          .as("precision"),
        round(col("tp").cast("double") / col("total_pos"), 6).as("recall"))
  }
}
