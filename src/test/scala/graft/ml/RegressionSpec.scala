package graft.ml

import graft.SparkSpec
import graft.lake.Readers

/** M1-M4 (`/root/reference/pyspark-3.ipynb`): assembler, seeded split,
  * LinearRegression fit, evaluate. The notebook's printed coefficients
  * ([5000, -5000], `pyspark-3.ipynb:241-261`) come from an UNSEEDED split
  * of 6 rows — not reproducible; the deterministic golden is the full-data
  * least-squares solution, verified independently (numpy lstsq):
  * coefficients [-115.8558, 1602.7301], intercept 16904.7952. */
class RegressionSpec extends SparkSpec {

  private lazy val test1 = Readers.csvInferred(spark, tutoCsv("test1.csv"))

  test("M1 array-features and VectorAssembler produce aligned features") {
    val arr = Regression.arrayFeatures(test1, Seq("age", "Experience"), "features")
    val firstArr = arr.select("features").head().getSeq[Double](0)
    assert(firstArr == Seq(31.0, 10.0))           // pyspark-3.ipynb:128 output
    val vec = Regression.assembleFeatures(test1, Seq("age", "Experience"), "features")
    val firstVec = vec.select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(firstVec.toArray.toSeq == Seq(31.0, 10.0))
  }

  test("M3 full-data fit recovers the least-squares solution") {
    val assembled = Regression.assembleFeatures(test1, Seq("age", "Experience"), "features")
    val lr = new org.apache.spark.ml.regression.LinearRegression()
      .setFeaturesCol("features").setLabelCol("Salary")
    val model = lr.fit(assembled)
    assert(math.abs(model.coefficients(0) - -115.8558) < 0.01)
    assert(math.abs(model.coefficients(1) - 1602.7301) < 0.01)
    assert(math.abs(model.intercept - 16904.7952) < 0.01)
  }

  test("closed-form normal-equation coefficients match the iterative fit") {
    val cf = Regression.closedFormCoeffs(test1, "age", "Experience", "Salary").head()
    // same independently-verified lstsq golden as the M3 fit above
    assert(math.abs(cf.getAs[Double]("b1") - -115.8558) < 1e-3, cf.toString)
    assert(math.abs(cf.getAs[Double]("b2") - 1602.7301) < 1e-3, cf.toString)
    assert(math.abs(cf.getAs[Double]("b0") - 16904.7952) < 1e-3, cf.toString)
    assert(cf.getAs[Long]("n") == test1.na.drop(Seq("age", "Experience", "Salary")).count())
    // single aggregation row, no shuffle beyond the final fold: the plan
    // holds one partial+final HashAggregate pair and no join
    val plan = Regression.closedFormCoeffs(test1, "age", "Experience", "Salary")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("M2-M4 seeded fitEvaluate is deterministic and yields finite metrics") {
    val r1 = Regression.fitEvaluate(test1, Seq("age", "Experience"), "Salary", seed = 42L)
    val r2 = Regression.fitEvaluate(test1, Seq("age", "Experience"), "Salary", seed = 42L)
    assert(r1.model.coefficients == r2.model.coefficients)
    assert(r1.mae == r2.mae && r1.mse == r2.mse)
    assert(!r1.mae.isNaN && !r1.mse.isNaN && r1.mae >= 0 && r1.mse >= 0)
    assert(r1.predictions.columns.contains("prediction"))  // pyspark-3.ipynb:270
  }

  test("cvCoeffs: complement-sum coefficients match a direct fit on each fold's complement") {
    import org.apache.spark.sql.functions._
    val li = graft.lake.Tables(spark, sfDir, "lineitem")
    val cv = Regression.cvCoeffs(li, "l_orderkey",
      "l_quantity", "l_discount", "l_extendedprice")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(cv.size == 5, cv.keySet.toString)
    cv.foreach { case (fold, (nTrain, b1, b2, b0)) =>
      val direct = Regression.closedFormCoeffs(
        graft.operators.Sampling.kfoldAssign(li, "l_orderkey", 5)
          .filter(col("fold") =!= fold),
        "l_quantity", "l_discount", "l_extendedprice").collect()(0)
      assert(direct.getLong(0) == nTrain, s"fold $fold n")
      // two numerically different formulations of the same normal
      // equations — agree to ~the rounding grid
      assert(math.abs(direct.getDouble(1) - b1) < 5e-4, s"fold $fold b1")
      assert(math.abs(direct.getDouble(2) - b2) < 5e-4, s"fold $fold b2")
      assert(math.abs(direct.getDouble(3) - b0) < 5e-3, s"fold $fold b0")
    }
  }

  test("conformalInterval: test coverage honors the 90% guarantee; width is the calibration order statistic") {
    import org.apache.spark.sql.functions.col
    val li = graft.lake.Tables(spark, sfDir, "lineitem")
    val r = graft.ml.Regression.conformalInterval(
      li, "l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      .collect()(0)
    val (nCal, nTest) = (r.getLong(0), r.getLong(1))
    val (q, cov) = (r.getDouble(2), r.getDouble(3))
    assert(nCal > 100 && nTest > 100, r.toString)
    assert(q > 0.0, r.toString)
    // distribution-free guarantee: >= 1 - alpha up to finite-sample
    // wobble on the exchangeable hash split
    assert(cov >= 0.88 && cov <= 0.97, s"coverage $cov")
    // the half-width is a calibration residual order statistic: widening
    // alpha must shrink it and reduce coverage
    val loose = graft.ml.Regression.conformalInterval(
      li, "l_orderkey", "l_quantity", "l_discount", "l_extendedprice",
      alpha = 0.5).collect()(0)
    assert(loose.getDouble(2) < q, loose.toString)
    assert(loose.getDouble(3) < cov, loose.toString)
    // deterministic: layout must not change a single output
    val reparted = graft.ml.Regression.conformalInterval(
      li.repartition(11, col("l_partkey")),
      "l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      .collect()(0)
    assert(reparted.toSeq == r.toSeq, s"$reparted vs $r")
  }
}
