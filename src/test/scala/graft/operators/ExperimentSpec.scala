package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CUPED adjustment and the two-proportion z-test: planted covariate
  * structure is fully explained (variance to zero), guards return null
  * instead of erroring, and assignment matches the shared hash base. */
class ExperimentSpec extends SparkSpec {

  import spark.implicits._

  test("cupedReport: y = 2x exactly -> theta 2, adjusted variance 0, 100% reduction") {
    // user i: pre value i at Jan 10, post value 2i at Jan 20
    val ev = (1 to 10).flatMap { i =>
      Seq((i.toLong, "2024-01-10 00:00:00", i.toDouble),
        (i.toLong, "2024-01-20 00:00:00", 2.0 * i))
    }.toDF("user_id", "s", "value")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("value"))
    val rows = Experiment.cupedReport(ev, "2024-01-16").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) == 2.0, s"theta ${r.getDouble(2)}")       // theta
      // the round-6 intermediate moments leave a <=1e-5 residual
      assert(math.abs(r.getDouble(6)) <= 1e-5, s"var_cuped ${r.getDouble(6)}")
      assert(r.getDouble(7) >= 99.9, s"reduction ${r.getDouble(7)}")
      // the adjustment is mean-preserving up to the covariate delta:
      // mean_cuped = mean_y - theta*(mean_x - x_bar), finite and defined
      assert(!r.isNullAt(4))
    }
  }

  test("abTestZ: counts match a hand-replicated assignment; degenerate pooled rate yields null z, not an error") {
    val ev = (1 to 20).flatMap { i =>
      // every user exists pre-cutoff; even-valued users convert post
      Seq((i.toLong, "signup", "2024-01-05 00:00:00", 1.0)) ++
        (if (i % 2 == 0) Seq((i.toLong, "purchase", "2024-01-20 00:00:00", 200.0))
         else Seq.empty)
    }.toDF("user_id", "event_type", "s", "value")
      .select(col("user_id"), col("event_type"),
        col("s").cast("timestamp").as("ts"), col("value"))
    val r = Experiment.abTestZ(ev, "purchase", "2024-01-16", minValue = 150.0)
      .collect()(0)
    val (n0, c0, n1, c1) = (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
    assert(n0 + n1 == 20 && c0 + c1 == 10, r.toString)
    // replicate the assignment through the same shared hash base
    val expected = ev.select(col("user_id")).distinct()
      .withColumn("variant", (Sampling.hashBucket(col("user_id")) % 2).cast("int"))
      .withColumn("conv", (col("user_id") % 2 === 0).cast("long"))
      .groupBy(col("variant")).agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      .collect().map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(expected(0) == ((n0, c0)) && expected(1) == ((n1, c1)), r.toString)
    // every unit converts -> pooled rate 1 -> z undefined -> null
    val all = (1 to 6).map(i =>
      (i.toLong, "purchase", "2024-01-20 00:00:00", 200.0))
      .toDF("user_id", "event_type", "s", "value")
      .select(col("user_id"), col("event_type"),
        col("s").cast("timestamp").as("ts"), col("value"))
    assert(Experiment.abTestZ(all, "purchase", "2024-01-16", 150.0)
      .collect()(0).isNullAt(7))
  }

  test("minDetectableEffect: shrinks with n (1/sqrt scaling), degenerate baseline goes NULL") {
    import org.apache.spark.sql.functions.{col, lit}
    def evOf(users: Int) = {
      import spark.implicits._
      (1 to users).flatMap { u =>
        Seq((u.toLong, "view", "2024-01-10 00:00:00", 10.0)) ++
          (if (u % 5 == 0)
            Seq((u.toLong, "purchase", "2024-01-20 00:00:00", 200.0))
          else Nil)
      }.toDF("user_id", "event_type", "s", "value")
        .select(col("user_id"), col("event_type"),
          col("s").cast("timestamp").as("ts"), col("value"))
    }
    val small = Experiment.minDetectableEffect(
      evOf(200), "purchase", "2024-01-16", 150.0).collect()(0)
    val big = Experiment.minDetectableEffect(
      evOf(2000), "purchase", "2024-01-16", 150.0).collect()(0)
    assert(small.getDouble(2) > 0.15 && small.getDouble(2) < 0.25,
      small.toString) // ~20% baseline
    // 10x units -> MDE shrinks ~sqrt(10)
    val ratio = small.getDouble(3) / big.getDouble(3)
    assert(ratio > 2.5 && ratio < 4.0, s"MDE scaling ratio $ratio")
    // no conversions at all: absolute MDE 0-ish band, relative NULL
    val none = Experiment.minDetectableEffect(
      evOf(100).filter(col("event_type") =!= lit("purchase")),
      "purchase", "2024-01-16", 150.0).collect()(0)
    assert(none.isNullAt(4), none.toString)
  }

  test("sampleRatioMismatch: healthy hash split passes, a biased funnel flags") {
    import org.apache.spark.sql.functions.col
    val ev = spark.range(4000).select(col("id").as("user_id"))
    val ok = Experiment.sampleRatioMismatch(ev).collect()(0)
    assert(ok.getLong(0) + ok.getLong(1) == 4000L, ok.toString)
    assert(!ok.getBoolean(3), s"md5 split should not trip SRM: $ok")
    // simulate upstream loss of one arm (the exact failure SRM exists to
    // catch): keep only variant-0 units -> chi2 = n0, flagged
    val biased = ev.filter(
      graft.operators.Sampling.hashBucket(col("user_id")) % 2 === 0)
    val bad = Experiment.sampleRatioMismatch(biased).collect()(0)
    assert(bad.getLong(1) == 0L && bad.getBoolean(3), bad.toString)
  }

  test("diffInDiff: planted effect recovered net of the common trend; parallel trends -> 0") {
    // control users 2,4; treated 1,3 (explicit assignment, not hash).
    // pre means 15 / 35; both cohorts trend +2; treated get +5 on top.
    def ev(post: Map[Long, Double]) = (Seq(
      (1L, "2024-01-10 00:00:00", 30.0), (3L, "2024-01-10 00:00:00", 40.0),
      (2L, "2024-01-10 00:00:00", 10.0), (4L, "2024-01-10 00:00:00", 20.0)) ++
      post.toSeq.map { case (u, v) => (u, "2024-01-20 00:00:00", v) })
      .toDF("user_id", "s", "value")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("value"))
    val treat = (u: org.apache.spark.sql.Column) => u % 2 === 1
    val eff = Experiment.diffInDiff(
      ev(Map(1L -> 37.0, 3L -> 47.0, 2L -> 12.0, 4L -> 22.0)),
      "2024-01-16", treat).collect()(0)
    // (42-35) - (17-15) = 5; all cell SAMPLE variances 50 (n=2, the
    // n(n−1) welchT convention), se = sqrt(4 * 50/2) = 10, t = 0.5
    assert(eff.getAs[Double]("did") == 5.0, eff.toString)
    assert(eff.getAs[Double]("se") == 10.0, eff.toString)
    assert(eff.getAs[Double]("t_stat") == 0.5, eff.toString)
    // parallel trends, no effect: did exactly 0
    val flat = Experiment.diffInDiff(
      ev(Map(1L -> 32.0, 3L -> 42.0, 2L -> 12.0, 4L -> 22.0)),
      "2024-01-16", treat).collect()(0)
    assert(flat.getAs[Double]("did") == 0.0, flat.toString)
    assert(flat.getAs[Double]("t_stat") == 0.0, flat.toString)
  }

  test("cohenKappa: perfect agreement 1, hand-computed 2x2 fixture, anti-correlated negative") {
    import spark.implicits._
    def kappa(rows: Seq[(String, String)]): (Long, Long, Double) = {
      val r = Experiment.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    // identical raters: kappa exactly 1 regardless of marginals
    assert(kappa(Seq(("x", "x"), ("y", "y"), ("x", "x"))) == ((3L, 3L, 1.0)))
    // classic 2x2 fixture: n=100, agree=80, na=(60,40), nb=(50,50)
    // pe_num = 60*50 + 40*50 = 5000; kappa = (8000-5000)/(10000-5000) = 0.6
    val fix = Seq.fill(45)(("p", "p")) ++ Seq.fill(15)(("p", "n")) ++
      Seq.fill(5)(("n", "p")) ++ Seq.fill(35)(("n", "n"))
    assert(kappa(fix) == ((100L, 80L, 0.6)))
    // perfectly anti-correlated raters on a balanced binary label: -1
    assert(kappa(Seq(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x")))
      == ((4L, 0L, -1.0)))
  }
}
