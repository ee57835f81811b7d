package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Readers

/** N1-N7/A6: DataFrameNaFunctions semantics against the reference's
  * executed notebook goldens over test2.csv
  * (`/root/reference/pyspark-2.ipynb:125-324`). */
class NullsSpec extends SparkSpec {

  private lazy val df = Readers.csvInferred(spark, tutoCsv("test2.csv"))

  test("N1/N2 drop default == drop(any): only the 6 fully-populated rows remain") {
    assert(df.na.drop().count() == 6)          // pyspark-2.ipynb:125
    assert(Nulls.dropAny(df).count() == 6)     // pyspark-2.ipynb:154
  }

  test("N3 drop(all) is a no-op when no row is all-NULL") {
    assert(Nulls.dropAll(df).count() == 9)     // pyspark-2.ipynb:186
  }

  test("N4 drop(thresh=2) keeps rows with >= 2 non-nulls") {
    // row (null, 36, null, null) has 1 non-null -> dropped; 8 remain
    // (pyspark-2.ipynb:216 output).
    val kept = Nulls.dropThresh(df, 2)
    assert(kept.count() == 8)
    assert(kept.filter(col("age") === 36).count() == 0)
  }

  test("N5 drop(subset=Experience) drops exactly the rows where Experience is NULL") {
    val kept = Nulls.dropSubset(df, Seq("Experience"))
    assert(kept.count() == 7)                  // pyspark-2.ipynb:245
    assert(kept.filter(col("Experience").isNull).count() == 0)
  }

  test("N6 type-matched fill: string fill touches ONLY string columns") {
    // pyspark-2.ipynb:277 output golden: Name becomes 'Missing Value',
    // int columns keep their NULLs.
    val filled = Nulls.fillString(df, "Missing Value")
    assert(filled.filter(col("Name") === "Missing Value").count() == 2)
    assert(filled.filter(col("age").isNull).count() == 1)        // Mahesh row
    assert(filled.filter(col("Experience").isNull).count() == 2)
    assert(filled.filter(col("Salary").isNull).count() == 1)
  }

  test("N6 type-matched fill: numeric fill touches ONLY numeric columns") {
    val filled = Nulls.fillNumeric(df, 0.0)
    assert(filled.filter(col("age").isNull).count() == 0)
    assert(filled.filter(col("Experience").isNull).count() == 0)
    assert(filled.filter(col("Salary").isNull).count() == 0)
    assert(filled.filter(col("Name").isNull).count() == 2) // strings untouched
  }

  test("N7/A6 mean imputation reproduces the notebook goldens 28/5/25750") {
    // pyspark-2.ipynb:298-318 output: age_imputed 28, Experience_imputed 5,
    // Salary_imputed 25750 (int-typed columns truncate the mean).
    val imputed = Nulls.impute(df, Seq("age", "Experience", "Salary"), "mean")
    val mahesh = imputed.filter(col("Name") === "Mahesh")
      .select("age_imputed", "Experience_imputed", "Salary_imputed").head()
    assert(mahesh.getInt(0) == 28)
    assert(mahesh.getInt(1) == 5)
    val lastRow = imputed.filter(col("age") === 36)
      .select("Salary_imputed").head()
    assert(lastRow.getInt(0) == 25750)
    // non-null cells pass through unchanged
    val krish = imputed.filter(col("Name") === "Krish")
      .select("age_imputed", "Experience_imputed", "Salary_imputed").head()
    assert(krish.getInt(0) == 31 && krish.getInt(1) == 10 && krish.getInt(2) == 30000)
  }

  test("N7 cross-check: engine-native mean imputation matches spark.ml Imputer") {
    import org.apache.spark.ml.feature.Imputer
    val cols = Array("age", "Experience", "Salary")
    // ml.Imputer requires double inputs; cast, then compare against our
    // native impute on the same casted frame.
    val dbl = cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("double")))
    val ml = new Imputer().setInputCols(cols)
      .setOutputCols(cols.map(c => s"${c}_imputed")).setStrategy("mean")
      .fit(dbl).transform(dbl)
    val native = Nulls.impute(dbl, cols.toSeq, "mean")
    val mlRows = ml.select("Name", "age_imputed", "Experience_imputed", "Salary_imputed")
    val natRows = native.select("Name", "age_imputed", "Experience_imputed", "Salary_imputed")
    assert(mlRows.except(natRows).count() == 0 && natRows.except(mlRows).count() == 0)
  }

  test("A6 median and mode strategies") {
    val med = Nulls.impute(df, Seq("age"), "median")
    // ages 21,23,24,29,30,31,34,36 -> exact percentile(0.5) = 29.5 -> int 29
    assert(med.filter(col("Name") === "Mahesh").select("age_imputed").head().getInt(0) == 29)
    val mod = Nulls.impute(df, Seq("Experience"), "mode")
    // Experience values 10,8,4,3,1,2,10 -> mode 10
    assert(mod.filter(col("Name") === "Mahesh").select("Experience_imputed").head().getInt(0) == 10)
  }
}
