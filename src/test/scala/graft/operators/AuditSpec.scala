package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Data-quality audit: planted violations counted exactly, NULL predicate
  * results fail the rule, and the whole report is one scan. */
class AuditSpec extends SparkSpec {

  test("ruleReport: planted violations counted; NULL predicate counts as violation; one scan, no join") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(-5.0), "ok"),   // violates positive
      (3L, None, "ok"),         // NULL -> positive rule cannot evaluate -> violation
      (4L, Some(3.0), "bad")    // violates status_known
    ).toDF("id", "amount", "status")
    val got = Audit.ruleReport(df, Seq(
      "amount_positive" -> (col("amount") > 0),
      "status_known" -> col("status").isin("ok"),
      "id_present" -> col("id").isNotNull))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got("amount_positive") == ((2L, 4L, 0.5)), got.toString)
    assert(got("status_known") == ((1L, 4L, 0.25)))
    assert(got("id_present") == ((0L, 4L, 0.0)))
    // all rules fold into ONE aggregation pass — no join, no second scan
    val plan = Audit.ruleReport(df, Seq("p" -> (col("amount") > 0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("referentialOrphans: exactly the fact rows without a dim partner") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (3L, "c"), (3L, "c2"))
      .toDF("fk", "payload")
    val dim = Seq(1L, 9L).toDF("dk")
    val got = Audit.referentialOrphans(fact, dim, "fk", "dk")
      .select("fk").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L, 3L))
  }

  test("tableChecksum: layout-independent; a one-row change surfaces in the bucket census") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val base = Audit.tableChecksum(df, Seq("id", "v"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val shuffled = Audit.tableChecksum(df.repartition(9), Seq("id", "v"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(base == shuffled, "checksum must not depend on layout")
    // corrupt one row: at most the 2 touched buckets change, never zero
    val corrupt = df.withColumn("v",
      when(col("id") === 250L, "CORRUPT").otherwise(col("v")))
    val diff = Audit.tableChecksum(corrupt, Seq("id", "v"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val changed = (base.keySet ++ diff.keySet)
      .filter(b => base.get(b) != diff.get(b))
    assert(changed.nonEmpty && changed.size <= 2, changed.toString)
    assert(base.values.map(_._1).sum == diff.values.map(_._1).sum)
  }

  test("giniByKeyCount: census formula matches hand-computed Gini; uniform is 0") {
    import spark.implicits._
    // counts (1, 1, 2): sorted ranks give Σi·x = 9 → G = (18-16)/12
    val df = Seq("a", "b", "c", "c").toDF("k")
    val got = Audit.giniByKeyCount(df, "k").collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getDouble(2))
      == ((3L, 4L, math.rint(2.0 / 12 * 1e6) / 1e6)), got.toString)
    val uniform = Audit.giniByKeyCount(Seq("a", "b", "c").toDF("k"), "k")
      .collect()(0)
    assert(uniform.getDouble(2) == 0.0)
    // counts (1, 9): G = (2·19 − 3·10) / (2·10) = 0.4
    val skewed = Audit.giniByKeyCount(
      (Seq("a") ++ Seq.fill(9)("b")).toDF("k"), "k").collect()(0)
    assert(skewed.getDouble(2) == 0.4, skewed.toString)
  }

  test("joinCardinality: estimate equals the executed join's count; worst key named without running it") {
    import spark.implicits._
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("lk")
    val right = Seq(1L, 1L, 2L, 4L).toDF("rk")
    val got = Audit.joinCardinality(left, right, "lk", "rk").collect()(0)
    val real = left.join(right, col("lk") === col("rk")).count()
    // key 1: 3·2 = 6, key 2: 1·1 = 1; key 3/4 one-sided
    assert(got.getLong(0) == real && real == 7L, got.toString)
    assert(got.getLong(1) == 2L && got.getLong(2) == 6L)
    assert(got.getDouble(3) == math.rint(6.0 / 7.0 * 1e6) / 1e6)
  }

  test("madOutliers: planted spike flagged, clean group flags nothing, stats exact") {
    import spark.implicits._
    // group g: median 11, MAD 2 -> thresh 3*1.4826*2 = 8.8956; only the
    // 100 spike (dev 89) is out, 13 is within (dev 2). group h: near-
    // constant -> MAD 0, thresh 0, any deviation flags — 5.0 only.
    val df = Seq(
      ("g", 9.0), ("g", 10.0), ("g", 11.0), ("g", 13.0), ("g", 100.0),
      ("h", 5.0), ("h", 7.0), ("h", 7.0), ("h", 7.0), ("h", 7.0)
    ).toDF("grp", "v")
    val got = Audit.madOutliers(df, "grp", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(5), r.getDouble(6)))).toMap
    assert(got("g") == ((5L, 11.0, 2.0, 1L, 0.2)), got.toString)
    assert(got("h") == ((5L, 7.0, 0.0, 1L, 0.2)), got.toString)
  }

  test("chiSquareIndependence: independent table has zero chi2; marginals exact") {
    import spark.implicits._
    // perfectly independent 2x2: counts = row*col/n exactly
    val ind = Seq.fill(4)(("a", "x")) ++ Seq.fill(4)(("a", "y")) ++
      Seq.fill(4)(("b", "x")) ++ Seq.fill(4)(("b", "y"))
    val got = Audit.chiSquareIndependence(ind.toDF("u", "v"), "u", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.size == 4)
    assert(got.values.forall(c => c._1 == 4L && c._2 == 4.0 && c._3 == 0.0),
      got.toString)
    // dependent corner: all mass on the diagonal
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
    val chi2 = Audit.chiSquareIndependence(dep.toDF("u", "v"), "u", "v")
      .agg(sum(col("chi2_part"))).collect()(0).getDouble(0)
    assert(chi2 == 4.0, chi2.toString) // n * (1*1-0*0)^2... exact for 2x2 diagonal
  }

  test("entropyProfile: constant column 0 bits, balanced binary 1 bit, top_share exact") {
    import spark.implicits._
    val df = Seq(("c", "h", 1), ("c", "t", 2), ("c", "h", 3), ("c", "t", 4))
      .toDF("const_col", "coin", "id")
    val got = Audit.entropyProfile(df, Seq("const_col", "coin", "id"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("const_col") == ((1L, 0.0, 1.0)), got.toString)
    assert(got("coin") == ((2L, 1.0, 0.5)))
    assert(got("id") == ((4L, 2.0, 0.25)))
  }

  test("calibrationByDecile: deterministic buckets, exact event rates, ranges ordered") {
    import spark.implicits._
    // 20 rows, score = id, event = score > 10 — top deciles all-event
    val df = (1 to 20).map(i => (i.toLong, i.toDouble)).toDF("k", "s")
    val got = Audit.calibrationByDecile(df, "k", "s", col("s") > 10.0)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.size == 10 && got.values.forall(_._1 == 2L), got.toString)
    assert(got(1) == ((2L, 1.0, 2.0, 0L, 0.0)))
    assert(got(6) == ((2L, 11.0, 12.0, 2L, 1.0)))
    assert(got(10) == ((2L, 19.0, 20.0, 2L, 1.0)))
    // decile ranges are non-overlapping and ordered
    val ordered = got.toSeq.sortBy(_._1).map(_._2)
    assert(ordered.sliding(2).forall {
      case Seq(a, b) => a._3 <= b._2; case _ => true })
  }

  test("groupedMoments: symmetric data has zero skew, uniform-ish kurtosis negative, exact mean/sd") {
    import spark.implicits._
    // g: symmetric {1,2,3,4,5} -> mean 3, m2 = 2, skew 0, kurt 1.7-3
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("g", _)).toDF("grp", "v")
    val r = Audit.groupedMoments(df, "grp", "v").collect()(0)
    assert(r.getLong(1) == 5L && r.getDouble(2) == 3.0, r.toString)
    assert(r.getDouble(3) == BigDecimal(math.sqrt(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(4) == 0.0, s"symmetric skew: $r")
    assert(r.getDouble(5) == -1.3, s"uniform-5 excess kurtosis: $r")
  }

  test("metricStability: constant metric has zero spread; report is layout-independent") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, 10.0)).toDF("id", "v")
    val r = Audit.metricStability(df, "id", "v", 16).collect()(0)
    assert(r.getLong(0) == 16L, r.toString)       // every bucket hit
    assert(r.getDouble(1) == 10.0 && r.getDouble(2) == 0.0 &&
      r.getDouble(3) == 0.0, r.toString)
    // layout independence: md5 buckets don't care about partitioning
    val varied = (1 to 500).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val a = Audit.metricStability(varied, "id", "v").collect()(0)
    val b = Audit.metricStability(varied.repartition(7), "id", "v").collect()(0)
    assert(a == b, s"$a vs $b")
    assert(a.getDouble(2) > 0.0)
  }

  test("poissonBootstrapCI: CI brackets the sample mean, narrows with n, layout-independent") {
    import spark.implicits._
    val small = (1 to 60).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "g", "v")
    val big = (1 to 600).map(i => (i.toLong, "g", (i % 60 + 1).toDouble)).toDF("id", "g", "v")
    def ci(df: org.apache.spark.sql.DataFrame) = {
      val r = Audit.poissonBootstrapCI(df, "id", "v", "g").collect()(0)
      (r.getDouble(2), r.getDouble(3), r.getDouble(4)) // mean, lo, hi
    }
    val (m1, lo1, hi1) = ci(small)
    assert(lo1 <= m1 && m1 <= hi1, s"CI [$lo1,$hi1] misses mean $m1")
    val (m2, lo2, hi2) = ci(big)
    assert(lo2 <= m2 && m2 <= hi2)
    assert(hi2 - lo2 < hi1 - lo1, "10x the rows should narrow the CI")
    // md5-derived weights don't care about physical layout
    val a = Audit.poissonBootstrapCI(small, "id", "v", "g").collect()(0)
    val b = Audit.poissonBootstrapCI(small.repartition(7), "id", "v", "g").collect()(0)
    assert(a == b, s"$a vs $b")
  }

  test("benfordReport: digit census exact, expected sums to n, chi2 parts nonnegative") {
    import spark.implicits._
    // leading digits planted: 1 x4, 2 x3, 9 x1, and a power-of-ten edge
    val df = Seq(1.5, 12.0, 150.0, 1999.0, 2.0, 25.0, 0.29, 90.0, 1000.0)
      .toDF("v")
    val got = Audit.benfordReport(df, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 5, 2 -> 3, 9 -> 1), got.toString)
    val rows = Audit.benfordReport(df, "v").collect()
    assert(rows.forall(_.getLong(2) == 9L))
    assert(rows.forall(_.getDouble(4) >= 0.0))
    // expected count of digit 1 = 9 * log10(2)
    val e1 = rows.find(_.getInt(0) == 1).get.getDouble(3)
    assert(math.abs(e1 - 9 * math.log10(2.0)) < 1e-3, e1.toString)
  }

  test("mutualInformation: independent columns share 0 nats; diagonal shares H = ln 2") {
    import spark.implicits._
    val ind = (Seq.fill(4)(("a", "x")) ++ Seq.fill(4)(("a", "y")) ++
      Seq.fill(4)(("b", "x")) ++ Seq.fill(4)(("b", "y"))).toDF("u", "v")
    val miInd = Audit.mutualInformation(ind, "u", "v")
      .agg(sum(col("mi_contrib"))).collect()(0).getDouble(0)
    assert(miInd == 0.0, miInd.toString)
    // perfect diagonal dependence on a balanced binary pair: MI = ln 2
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("u", "v")
    val miDep = Audit.mutualInformation(dep, "u", "v")
      .agg(sum(col("mi_contrib"))).collect()(0).getDouble(0)
    assert(math.abs(miDep - math.log(2.0)) < 1e-5, miDep.toString)
  }

  test("cramersV: perfect diagonal association gives V = 1; independence gives 0") {
    import spark.implicits._
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("u", "v")
    val r = Audit.cramersV(dep, "u", "v").collect()(0)
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2)) == ((4L, 4.0, 1.0)),
      r.toString)
    val ind = (Seq.fill(4)(("a", "x")) ++ Seq.fill(4)(("a", "y")) ++
      Seq.fill(4)(("b", "x")) ++ Seq.fill(4)(("b", "y"))).toDF("u", "v")
    assert(Audit.cramersV(ind, "u", "v").collect()(0).getDouble(2) == 0.0)
  }

  test("fdCheck: g3 error counts the minimum deletions; an exact FD reports holds") {
    import spark.implicits._
    // det=1: dep {x,x,y} -> top 2, 1 deletion; det=2: {z} clean
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "z")).toDF("a", "b")
    val r = Audit.fdCheck(df, "a_b", Seq("a"), "b").collect()(0)
    assert(r.getString(0) == "a_b" && r.getLong(1) == 4L && r.getLong(2) == 2L, r.toString)
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L && !r.getBoolean(5), r.toString)
    // key-determined dep holds exactly
    val clean = Seq((1, "x"), (2, "y"), (2, "y")).toDF("a", "b")
    val c = Audit.fdCheck(clean, "a_b", Seq("a"), "b").collect()(0)
    assert(c.getLong(4) == 0L && c.getBoolean(5), c.toString)
  }

  test("anovaOneWay matches the hand-computed F on a planted 3-group fixture") {
    import spark.implicits._
    // groups a{1,2,3} b{2,3,4} c{5,6,7}: means 2,3,6, grand 33/9 = 11/3;
    // SSB = 3·((2−11/3)² + (3−11/3)² + (6−11/3)²) = 26, SSW = 2+2+2 = 6,
    // F = (26/2)/(6/6) = 13
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0), ("c", 7.0)).toDF("g", "v")
    val r = Audit.anovaOneWay(df, "v", "g").collect()(0)
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L, r.toString)
    assert(r.getDouble(2) == 13.0, r.toString)
    // equal group means -> F = 0 exactly
    val flat = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0))
      .toDF("g", "v")
    assert(Audit.anovaOneWay(flat, "v", "g").collect()(0).getDouble(2) == 0.0)
  }

  test("welchT: hand-computed t/df/d on an unequal-variance fixture; equal samples score 0") {
    import spark.implicits._
    // a{1,2,3} (v=1) vs b{4,6} (v=2): se² = 4/3, t = −3/√(4/3) = −2.5981,
    // Welch–Satterthwaite df = 1.68, pooled-sd Cohen's d = −2.5981
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(4.0, 6.0).toDF("v")
    val r = Audit.welchT(a, b, "v").collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((3L, 2L)), r.toString)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0, r.toString)
    assert(r.getDouble(4) == -2.5981, r.toString)
    assert(r.getDouble(5) == 1.68, r.toString)
    assert(r.getDouble(6) == -2.5981, r.toString)
    // identical samples -> t = 0, d = 0
    val z = Audit.welchT(a, a, "v").collect()(0)
    assert(z.getDouble(4) == 0.0 && z.getDouble(6) == 0.0, z.toString)
  }

  test("mannWhitney: tie-averaged ranks, exact U and tie-corrected z on a hand fixture") {
    import spark.implicits._
    // a{1,2,3,4} vs b{3,4,5,6}: pooled ranks 1,2,3.5,3.5,5.5,5.5,7,8
    // R1 = 1+2+3.5+5.5 = 12, U1 = 12-10 = 2; ties sum (t^3-t) = 12,
    // var = 16/12·(9 − 12/56) = 11.714286, z = −6/3.422614 = −1.753
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = Audit.mannWhitney(a, b, "v").collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L, r.toString)
    assert(r.getDouble(2) == 2.0, r.toString)
    assert(r.getDouble(3) == -1.753, r.toString)
    // symmetry: swapping the samples flips U around n1*n2 and negates z
    val s = Audit.mannWhitney(b, a, "v").collect()(0)
    assert(s.getDouble(2) == 14.0 && s.getDouble(3) == 1.753, s.toString)
  }
}
