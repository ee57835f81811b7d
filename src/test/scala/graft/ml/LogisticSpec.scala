package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** GD logistic regression: separable data pushes the weight the right
  * way and beats the chance loss; the fit is layout-independent. */
class LogisticSpec extends SparkSpec {

  test("fitGd: separable feature earns a positive weight and beats chance log-loss") {
    import spark.implicits._
    // y = 1 iff x1 large; x2 pure noise (alternating, uncorrelated)
    val df = (1 to 200).map { i =>
      val x1 = i.toDouble
      (x1, if (i % 2 == 0) 1.0 else -1.0, if (i > 100) 1 else 0)
    }.toDF("x1", "x2", "label")
    val r = Logistic.fitGd(df, Seq("x1", "x2"), col("label") === 1).collect()(0)
    val (w0, w1, w2, loss) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    assert(w1 > 0.3, s"separating weight should grow: $w1")
    assert(math.abs(w2) < 0.1, s"noise weight should stay small: $w2")
    assert(loss < math.log(2.0), s"must beat chance: $loss")
    assert(math.abs(w0) < 0.2, s"balanced classes keep intercept small: $w0")
  }

  test("fitGd: deterministic across partitioning (rounded gradients cannot drift)") {
    import spark.implicits._
    val df = (1 to 500).map(i =>
      (i.toDouble % 37, (i * 13 % 101).toDouble, i % 3 == 0))
      .toDF("a", "b", "y")
    val r1 = Logistic.fitGd(df, Seq("a", "b"), col("y")).collect()(0)
    val r2 = Logistic.fitGd(df.repartition(11), Seq("a", "b"), col("y"))
      .collect()(0)
    assert(r1 == r2, s"$r1 vs $r2")
  }
}
