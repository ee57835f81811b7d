package graft.operators

import graft.SparkSpec

/** Fellegi-Sunter scoring over the edit-distance blocking tier: agreement
  * flags, the constant-prior log-odds sum, and tier thresholds. */
class LinkageSpec extends SparkSpec {

  private def ln(x: Double) = math.log(x)

  test("customerLinkage: all-agree pair scores the full log-odds and tiers as match; disagreements subtract") {
    import spark.implicits._
    val rows = Seq(
      // lev-1 name pair, every field agreeing
      ("Customer#000000001", 7L, "BUILDING", 1000.00),
      ("Customer#000000002", 7L, "BUILDING", 1000.50),
      // lev-1 from both, everything disagreeing
      ("Customer#000000003", 9L, "MACHINERY", 9000.00),
      // outside any 1-edit neighborhood of the others
      ("Totally#Different##", 7L, "BUILDING", 1000.00))
      .toDF("c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Linkage.customerLinkage(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getDouble(6), r.getString(7)))).toMap
    // blocking finds all three lev-1 pairs among the #00000000x names;
    // the Totally#Different name blocks with nobody
    assert(got.keySet == Set(
      ("Customer#000000001", "Customer#000000002"),
      ("Customer#000000001", "Customer#000000003"),
      ("Customer#000000002", "Customer#000000003")), got.keySet.toString)
    val full = BigDecimal(ln(0.95 / 0.04) + ln(0.9 / 0.2) + ln(0.7 / 0.02))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val none = BigDecimal(ln((1 - 0.95) / (1 - 0.04)) +
      ln((1 - 0.9) / (1 - 0.2)) + ln((1 - 0.7) / (1 - 0.02)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hit = got(("Customer#000000001", "Customer#000000002"))
    assert(hit == ((true, true, true, full, "match")), hit.toString)
    val miss = got(("Customer#000000002", "Customer#000000003"))
    assert(miss == ((false, false, false, none, "non_match")), miss.toString)
  }

  test("emFitPriors recovers planted (m, u, p) from a pattern-census mixture") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // plant a two-population mixture directly as agreement flags:
    // 100 true-match pairs agree on each field independently w.p. 0.9,
    // 900 non-match pairs w.p. 0.1 — independent draws from a FIXED
    // seed (EM's conditional-independence model must hold in the plant)
    val rng = new scala.util.Random(42)
    def planted(n: Int, rate: Double): Seq[(Boolean, Boolean, Boolean)] =
      Seq.fill(n)((rng.nextDouble() < rate, rng.nextDouble() < rate,
        rng.nextDouble() < rate))
    val flags = (planted(100, 0.9) ++ planted(900, 0.1))
      .toDF("nation_agree", "segment_agree", "balance_agree")
    val fit = Linkage.emFitPriors(flags,
        Seq("nation_agree", "segment_agree", "balance_agree"),
        iterations = 20)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    fit.foreach { case (field, (m, u, p)) =>
      assert(m > 0.75 && m <= 1.0, s"$field m=$m should recover ~0.9")
      assert(u >= 0.0 && u < 0.25, s"$field u=$u should recover ~0.1")
      assert(p > 0.03 && p < 0.3, s"$field p=$p should recover ~0.1")
      assert(m > u, s"$field: EM must separate m=$m > u=$u")
    }
    // the fitted log-odds must separate the two planted populations:
    // ln(m/u) strongly positive for every field
    assert(fit.values.forall { case (m, u, _) => math.log(m / u) > 1.0 })
  }
}
