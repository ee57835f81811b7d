package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.DataFrame
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
}
