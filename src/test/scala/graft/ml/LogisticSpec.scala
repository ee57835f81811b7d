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

  test("auc: perfect / inverted / tied scores give 1, 0, 0.5; tie correction exact") {
    import spark.implicits._
    val perfect = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1))
      .toDF("s", "y")
    assert(Logistic.auc(perfect, col("s"), col("y") === 1)
      .collect()(0).getDouble(2) == 1.0)
    assert(Logistic.auc(perfect, -col("s"), col("y") === 1)
      .collect()(0).getDouble(2) == 0.0)
    val allTied = Seq((5.0, 0), (5.0, 1), (5.0, 0), (5.0, 1)).toDF("s", "y")
    assert(Logistic.auc(allTied, col("s"), col("y") === 1)
      .collect()(0).getDouble(2) == 0.5)
    // hand case: scores 1(neg), 2(pos+neg tie), 3(pos):
    // U = 1*(1 + 0.5) + 1*(2 + 0) = 3.5 over n_pos*n_neg = 4 -> 0.875
    val mixed = Seq((1.0, 0), (2.0, 1), (2.0, 0), (3.0, 1)).toDF("s", "y")
    val r = Logistic.auc(mixed, col("s"), col("y") === 1).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 2L, 0.875)),
      r.toString)
  }

  test("prCurve: running tp/fp down the score order, exact ratios at every threshold") {
    import spark.implicits._
    // scores desc: 4(pos), 3(neg), 2(pos), 1(neg)
    val df = Seq((4.0, 1), (3.0, 0), (2.0, 1), (1.0, 0)).toDF("s", "y")
    val got = Logistic.prCurve(df, col("s"), col("y") === 1)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(4.0) == ((1L, 0L, 1.0, 0.5)), got.toString)
    assert(got(3.0) == ((1L, 1L, 0.5, 0.5)))
    assert(got(2.0) == ((2L, 1L, 0.666667, 1.0)))
    assert(got(1.0) == ((2L, 2L, 0.5, 1.0)))
  }

  test("fitGd: a zero-variance feature fails loudly, not as null coefficients") {
    import spark.implicits._
    val df = (1 to 50).map(i => (7.0, i % 2 == 0)).toDF("a", "y")
    val e = intercept[Exception] {
      Logistic.fitGd(df, Seq("a"), col("y")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("zero variance")), e.getMessage)
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
