package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML surface from the reference's third notebook
  * (`/root/reference/pyspark-3.ipynb`): VectorAssembler → randomSplit →
  * LinearRegression fit → evaluate (SURVEY.md §2.10 M1-M4).
  *
  * Engine policy differences from the reference: the split is SEEDED (the
  * reference's unseeded `randomSplit` at `pyspark-3.ipynb:219` is
  * nondeterministic), and an engine-native `array()` feature column is
  * offered next to the `VectorUDT` path.
  */
object Regression {

  /** M1 engine-native: features as a plain array<double> column — stays in
    * Tungsten rows, no VectorUDT boxing, usable by SQL. */
  def arrayFeatures(df: DataFrame, inputCols: Seq[String], out: String): DataFrame =
    df.withColumn(out, array(inputCols.map(c => col(c).cast("double")): _*))

  /** M1 as in the reference: VectorAssembler to a VectorUDT column. */
  def assembleFeatures(df: DataFrame, inputCols: Seq[String], out: String): DataFrame =
    new VectorAssembler().setInputCols(inputCols.toArray).setOutputCol(out)
      .transform(df)

  final case class FitResult(model: LinearRegressionModel, predictions: DataFrame,
      mae: Double, mse: Double)

  /** Closed-form OLS for TWO features + intercept via the 2×2 normal
    * equations — the oracle-comparable twin of [[fitEvaluate]]'s iterative
    * `LinearRegression` (M3). On centered data the system reduces to plain
    * covariance arithmetic (the sample-size factors cancel in the ratios):
    *
    *   b1 = (c1y·v2 − c2y·c12) / (v1·v2 − c12²)
    *   b2 = (c2y·v1 − c1y·c12) / (v1·v2 − c12²)
    *   b0 = ȳ − b1·x̄1 − b2·x̄2
    *
    * One aggregation row over codegen'd `covar_pop`/`var_pop`/`avg` — a
    * single map-side-combined pass at any scale, no feature matrix
    * materialized. Coefficients rounded to 4 for cross-engine parity. */
  def closedFormCoeffs(df: DataFrame, x1: String, x2: String,
      labelCol: String): DataFrame = {
    val d = df.na.drop(Seq(x1, x2, labelCol)).select(
      col(x1).cast("double").as("x1"), col(x2).cast("double").as("x2"),
      col(labelCol).cast("double").as("y"))
    val det = col("v1") * col("v2") - col("c12") * col("c12")
    val b1 = (col("c1y") * col("v2") - col("c2y") * col("c12")) / det
    val b2 = (col("c2y") * col("v1") - col("c1y") * col("c12")) / det
    d.agg(
        covar_pop(col("x1"), col("y")).as("c1y"),
        covar_pop(col("x2"), col("y")).as("c2y"),
        covar_pop(col("x1"), col("x2")).as("c12"),
        var_pop(col("x1")).as("v1"), var_pop(col("x2")).as("v2"),
        avg(col("x1")).as("m1"), avg(col("x2")).as("m2"),
        avg(col("y")).as("my"), count(lit(1)).as("n"))
      .select(col("n"),
        round(b1, 4).as("b1"), round(b2, 4).as("b2"),
        round(col("my") - b1 * col("m1") - b2 * col("m2"), 4).as("b0"))
  }

  /** K-fold cross-validated [[closedFormCoeffs]] WITHOUT k training
    * scans: per-fold raw sums of GLOBALLY-CENTERED features are additive,
    * so each fold's train-side statistics are just total − fold
    * (complement sums), and all k models come out of TWO passes over the
    * data (one tiny means pre-agg + one sums aggregate) + arithmetic on
    * the k-row relation. Centering by the (rounded) global means keeps
    * the moment arithmetic cancellation-free — fold means of centered
    * values sit near 0, so covariance terms never subtract two large
    * nearly-equal numbers. Folds assign by md5(id) — the engine-wide
    * deterministic base. Output: one row per held-out fold with the
    * complement-trained coefficients. */
  def cvCoeffs(df: DataFrame, idCol: String, x1: String, x2: String,
      labelCol: String, k: Int = 5): DataFrame = {
    val d0 = df.na.drop(Seq(x1, x2, labelCol)).select(
      col(idCol).as("id"), col(x1).cast("double").as("x1"),
      col(x2).cast("double").as("x2"), col(labelCol).cast("double").as("y"))
    val g = d0.agg(round(avg(col("x1")), 4).as("gm1"),
      round(avg(col("x2")), 4).as("gm2"), round(avg(col("y")), 4).as("gmy"))
    val c = graft.operators.Sampling.kfoldAssign(d0, "id", k)
      .crossJoin(broadcast(g))
      .select(col("fold"), (col("x1") - col("gm1")).as("a"),
        (col("x2") - col("gm2")).as("b"), (col("y") - col("gmy")).as("z"))
    val per = c.groupBy(col("fold")).agg(count(lit(1)).as("n"),
      sum(col("a")).as("s1"), sum(col("b")).as("s2"), sum(col("z")).as("sy"),
      sum(col("a") * col("a")).as("s11"), sum(col("b") * col("b")).as("s22"),
      sum(col("a") * col("b")).as("s12"), sum(col("a") * col("z")).as("s1y"),
      sum(col("b") * col("z")).as("s2y"))
    val tot = per.agg(sum(col("n")).as("tn"), sum(col("s1")).as("t1"),
      sum(col("s2")).as("t2"), sum(col("sy")).as("ty"),
      sum(col("s11")).as("t11"), sum(col("s22")).as("t22"),
      sum(col("s12")).as("t12"), sum(col("s1y")).as("t1y"),
      sum(col("s2y")).as("t2y"))
    val np = (col("tn") - col("n")).cast("double")
    def cm(tot: Column, f: Column, totA: Column, fA: Column,
        totB: Column, fB: Column): Column =
      (tot - f) / np - ((totA - fA) / np) * ((totB - fB) / np)
    val v1 = cm(col("t11"), col("s11"), col("t1"), col("s1"), col("t1"), col("s1"))
    val v2 = cm(col("t22"), col("s22"), col("t2"), col("s2"), col("t2"), col("s2"))
    val c12 = cm(col("t12"), col("s12"), col("t1"), col("s1"), col("t2"), col("s2"))
    val c1y = cm(col("t1y"), col("s1y"), col("t1"), col("s1"), col("ty"), col("sy"))
    val c2y = cm(col("t2y"), col("s2y"), col("t2"), col("s2"), col("ty"), col("sy"))
    val det = v1 * v2 - c12 * c12
    val b1 = (c1y * v2 - c2y * c12) / det
    val b2 = (c2y * v1 - c1y * c12) / det
    val b0c = (col("ty") - col("sy")) / np - b1 * ((col("t1") - col("s1")) / np) -
      b2 * ((col("t2") - col("s2")) / np)
    per.crossJoin(broadcast(tot)).crossJoin(broadcast(g))
      .select(col("fold"), (col("tn") - col("n")).as("n_train"),
        round(b1, 4).as("b1"), round(b2, 4).as("b2"),
        round(b0c + col("gmy") - b1 * col("gm1") - b2 * col("gm2"), 4).as("b0"))
  }

  /** M2-M4: seeded split, fit, predict, evaluate. */
  def fitEvaluate(df: DataFrame, featureCols: Seq[String], labelCol: String,
      seed: Long = 42L): FitResult = {
    val assembled = assembleFeatures(df.na.drop(featureCols :+ labelCol),
      featureCols, "features")
    val Array(train, test) = assembled.randomSplit(Array(0.75, 0.25), seed)
    val lr    = new LinearRegression().setFeaturesCol("features").setLabelCol(labelCol)
    val model = lr.fit(train)
    val preds = model.transform(test)
    def metric(m: String) = new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction").setMetricName(m)
      .evaluate(preds)
    FitResult(model, preds, metric("mae"), metric("mse"))
  }

  /** SPLIT-CONFORMAL prediction interval (Vovk et al.; Lei et al., JASA
    * 2018) around the closed-form OLS: train on the 60% hash split,
    * take the ⌈(n_cal+1)(1−α)⌉-th smallest absolute calibration
    * residual as the interval half-width q, and report empirical
    * coverage of ŷ ± q on the held-out test split — the
    * distribution-free ≥ 1−α guarantee needs ONLY exchangeability, no
    * error model, which is why this is the production way to put
    * honest bands on any point predictor.
    *
    * Determinism and scale shape: the md5-bucket split is the engine
    * standard; predictions use the ROUNDED-4 coefficients (one-row
    * broadcast — both engines predict from literally the same betas);
    * residuals quantize to exact micro longs, and the order statistic
    * comes from the distinct-residual census + ONE cumulative window
    * over that post-Aggregate census (the MWU/KS discipline — never a
    * corpus-sized sort or a driver-side top-k collect); coverage is an
    * exact integer ratio. */
  def conformalInterval(df: DataFrame, idCol: String, x1: String,
      x2: String, labelCol: String, alpha: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Sampling
    val bucket = Sampling.hashBucket(col(idCol))
    val clean = df.na.drop(Seq(x1, x2, labelCol))
    val coeffs = closedFormCoeffs(clean.filter(bucket < 60), x1, x2, labelCol)
      .select(col("b0"), col("b1"), col("b2"))
    def resid(d: DataFrame): DataFrame = d.crossJoin(broadcast(coeffs))
      .select(round(abs(col(labelCol).cast("double") -
        (col("b0") + col("b1") * col(x1).cast("double") +
          col("b2") * col(x2).cast("double"))) * 1e6, 0).cast("long").as("r"))
    val calR = resid(clean.filter(bucket >= 60 && bucket < 80))
    // the order statistic over the distinct-residual census: inclusive
    // running count = banded exclusive prefix + the value's own mass
    // (Sampling.orderedCensusCumsum — the residual domain is continuous,
    // so the census is Θ(corpus) and must never cross one sort task);
    // n_cal rides the same broadcast as the census grand total
    val q = Sampling.orderedCensusCumsum(
        calR.groupBy(col("r")).agg(count(lit(1)).as("c")),
        col("r"), weights = Seq("c" -> col("c")))
      .withColumn("cum", col("cum_c") + col("c"))
      .filter(col("cum") >=
        ceil((col("total_c") + 1) * lit(1 - alpha)).cast("long"))
      .agg(max(col("total_c")).as("n_cal"), min(col("r")).as("q_micro"))
    resid(clean.filter(bucket >= 80)).crossJoin(broadcast(q))
      .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        round(max(col("q_micro")) / 1e6, 6).as("q_half_width"),
        round(avg(when(col("r") <= col("q_micro"), 1.0).otherwise(0.0)), 6)
          .as("coverage"))
  }
}
