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
