package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PSI drift report and k-anonymity census/suppression. */
class DriftPrivacySpec extends SparkSpec {

  import spark.implicits._

  test("psi is zero when the snapshots are identical") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rep = Drift.psiReport(docs, docs, col("n_chars"), 100.0)
    assert(rep.filter(col("contrib") =!= 0.0).count() == 0)
    assert(Drift.psiSummary(rep).head().getDouble(0) == 0.0)
  }

  test("a planted distribution shift drives psi above the action threshold") {
    val base = spark.range(0, 1000).select((col("id") % 10 * 100).as("v"))
    val shifted = spark.range(0, 1000).select((col("id") % 10 * 100 + 500).as("v"))
    val psi = Drift.psiSummary(
      Drift.psiReport(base, shifted, col("v"), 100.0)).head().getDouble(0)
    assert(psi > 0.25, s"psi $psi") // disjoint mass on half the bins
  }

  test("one-sided bins get the smoothed finite penalty, not infinity") {
    val base = Seq(100L, 110L, 120L).toDF("v")      // bin 1 only
    val cur = Seq(100L, 350L).toDF("v")             // bins 1 and 3
    val rows = Drift.psiReport(base, cur, col("v"), 100.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(rows.keySet == Set(1L, 3L))
    assert(!rows.values.exists(_.isInfinite))
    assert(rows(3L) > 0) // present only in `cur` → positive contribution
  }

  test("vocabDrift: identical snapshots diverge zero; a planted term shift dominates; JS bounded by ln 2") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = (1 to 50).map(i => (i.toLong, "alpha beta gamma")).toDF("doc_id", "text")
    val same = Drift.vocabDrift(base, base, 10)
    assert(same.agg(sum(abs(col("js_contrib")))).head().getDouble(0) == 0.0)
    // current swaps gamma for ZETA in half the docs: zeta/gamma dominate
    val cur = (1 to 50).map(i =>
      (i.toLong, if (i % 2 == 0) "alpha beta zeta" else "alpha beta gamma"))
      .toDF("doc_id", "text")
    val drift = Drift.vocabDrift(base, cur, 10).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    val top = drift.maxBy(_._2)
    assert(Set("zeta", "gamma").contains(top._1), drift.toString)
    assert(drift("alpha") == 0.0 && drift("beta") == 0.0)
    val js = drift.values.sum
    assert(js > 0 && js <= math.log(2) + 1e-9, s"JS $js out of bounds")
  }

  test("k-anonymity census flags exactly the under-k groups") {
    val df = Seq.fill(12)(("A", 1)).toDF("seg", "nat")
      .unionByName(Seq.fill(3)(("B", 2)).toDF("seg", "nat"))
    val rows = Privacy.kAnonymityCensus(df, Seq("seg", "nat"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).toSet
    assert(rows == Set(("A", 12L, false), ("B", 3L, true)))
  }

  test("suppression masks QI cells of at-risk rows only, keeps the rest") {
    val df = (1 to 12).map(i => (i, "A", 1, i * 10.0))
      .toDF("id", "seg", "nat", "bal")
      .unionByName(Seq((99, "B", 2, 5.0)).toDF("id", "seg", "nat", "bal"))
    val out = Privacy.kAnonymize(df, Seq("seg", "nat"), k = 10).cache()
    assert(out.count() == 13)
    val risky = out.filter(col("id") === 99).head()
    assert(risky.isNullAt(1) && risky.isNullAt(2)) // seg + nat suppressed
    assert(risky.getDouble(3) == 5.0)              // non-QI column intact
    assert(out.filter(col("id") =!= 99 &&
      (col("seg").isNull || col("nat").isNull)).count() == 0)
  }

  test("suppressed relation keeps k-anonymity: every surviving QI group >= k") {
    val customers = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    val out = Privacy.kAnonymize(customers, Seq("c_mktsegment", "c_nationkey"), k = 5)
    val sizes = out.filter(col("c_mktsegment").isNotNull)
      .groupBy(col("c_mktsegment"), col("c_nationkey")).count()
    assert(sizes.filter(col("count") < 5).count() == 0)
  }

  test("lDiversityCensus: uniform group flagged even when k-large; diverse group passes") {
    import spark.implicits._
    // group A: 4 people, ALL sensitive=x (k-anonymous at 4, l=1 leak);
    // group B: 3 people, 3 distinct values
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"), ("B", "z")).toDF("qi", "sens")
    val got = Privacy.lDiversityCensus(df, Seq("qi"), "sens", minL = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got("A") == ((4L, 1L, 1.0, true)), got.toString)
    assert(got("B") == ((3L, 3L, 0.333333, false)), got.toString)
  }

  test("ksStatistic: identical samples give 0, disjoint ranges give 1, hand case exact") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    assert(Drift.ksStatistic(a, a, "v").collect()(0).getDouble(2) == 0.0)
    val b = Seq(10.0, 11.0).toDF("v")
    val dis = Drift.ksStatistic(a, b, "v").collect()(0)
    assert((dis.getLong(0), dis.getLong(1), dis.getDouble(2)) == ((3L, 2L, 1.0)))
    // a = {1,2}, b = {2,4}: ECDFs at 1: 0.5 vs 0 -> 0.5; at 2: 1 vs 0.5
    // -> 0.5; at 4: 1 vs 1 -> 0. KS = 0.5
    val h = Drift.ksStatistic(Seq(1.0, 2.0).toDF("v"),
      Seq(2.0, 4.0).toDF("v"), "v").collect()(0)
    assert(h.getDouble(2) == 0.5, h.toString)
  }

  test("tCloseness: a group matching the global distribution scores emd 0; fully-polarized groups score the hand-computed 0.5") {
    import spark.implicits._
    // groups A and B each concentrate on one of two sensitive values;
    // global is 50/50. p-q cumsums: A -> (+1/2, 0) => emd = 0.5/(m-1)=0.5
    val df = Seq(("A", 1), ("A", 1), ("B", 2), ("B", 2)).toDF("g", "v")
    val got = Privacy.tClosenessCensus(df, Seq("g"), "v", t = 0.3)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(got("A") == (0.5, true) && got("B") == (0.5, true), got.toString)
    // a group mirroring the global mix exactly scores 0
    val mixed = Seq(("A", 1), ("A", 2), ("B", 1), ("B", 2)).toDF("g", "v")
    val zero = Privacy.tClosenessCensus(mixed, Seq("g"), "v", t = 0.3)
      .collect().map(r => r.getDouble(3))
    assert(zero.forall(_ == 0.0), zero.mkString(","))
  }

  test("tCloseness: ordered EMD sees NEAR misses as closer than far ones (the l-diversity blind spot)") {
    import spark.implicits._
    // global over values 1..3 uniform; 'near' shifts mass 1->2 (adjacent),
    // 'far' shifts the same mass 1->3 (two steps) => far EMD strictly larger
    val df = Seq(
      ("near", 2), ("near", 2), ("near", 3),
      ("far", 3), ("far", 3), ("far", 2),
      ("base", 1), ("base", 1), ("base", 1)).toDF("g", "v")
    val got = Privacy.tClosenessCensus(df, Seq("g"), "v", t = 0.9)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("far") > got("near"), got.toString)
  }

  test("signedMmd: zero on identical samples, maximal on antipodal clusters") {
    val vecs = Seq(
      Seq(1.0f, 0.5f, -0.25f, 2.0f),
      Seq(-1.0f, 0.25f, 0.5f, -2.0f),
      Seq(0.5f, -1.5f, 1.0f, 0.75f))
    // both groups hold the SAME multiset -> group sign-means equal ->
    // every f-numerator is exactly 0
    val same = (vecs.map(v => (v, true)) ++ vecs.map(v => (v, false)))
      .toDF("embedding", "grp")
    val r0 = Drift.signedMmd(same, col("grp"), m = 8, inDims = 4).collect()(0)
    assert(r0.getLong(0) == 3L && r0.getLong(1) == 3L, r0.toString)
    assert(r0.getDouble(2) == 0.0, r0.toString)
    // P at +e1, Q at -e1: phi flips sign on every projection ->
    // numerator (4s·4 − (−4s)·4)² = 1024 per j, mmd2 = 8·1024/(8·256) = 4
    val anti = (
      Seq.fill(4)((Seq(1.0f, 0.0f, 0.0f, 0.0f), true)) ++
      Seq.fill(4)((Seq(-1.0f, 0.0f, 0.0f, 0.0f), false)))
      .toDF("embedding", "grp")
    val r1 = Drift.signedMmd(anti, col("grp"), m = 8, inDims = 4).collect()(0)
    assert(r1.getDouble(2) == 4.0, r1.toString)
  }

  test("signedMmd: an embedding shorter than inDims fails LOUDLY instead of diluting mmd2 toward 0") {
    // a 3-dim vector under inDims = 4 used to null its dot, map to
    // phi = 0 via otherwise(0), and still count in n_p — biasing the
    // statistic silently; the guard must raise instead
    val bad = Seq(
      (Seq(1.0f, 0.0f, 0.0f, 0.0f), true),
      (Seq(1.0f, 0.0f, 0.0f), false)) // short vector
      .toDF("embedding", "grp")
    val e = intercept[Exception] {
      Drift.signedMmd(bad, col("grp"), m = 4, inDims = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("signedMmd")), e.toString)
  }
}
