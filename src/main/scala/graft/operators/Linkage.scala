package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, JASA 1969): candidate
  * pairs from the edit-distance blocking tier ([[FuzzyJoin
  * .editDistancePairs]] — never the O(n²) cross join), scored by the sum
  * of per-field log-odds: a field that AGREES contributes ln(m/u), one
  * that disagrees ln((1−m)/(1−u)), where m = P(agree | same entity) and
  * u = P(agree | different entities). Declared (m, u) priors are the
  * classical bootstrap (production systems EM-fit them; the scoring
  * algebra is identical), documented per field below.
  *
  * Scale shape: blocking is the FastSS/PassJoin segment join (linear in
  * distinct names, bucket-capped); attributes attach by two name-keyed
  * equi-joins; scoring is pure map-side arithmetic. The only ln calls
  * are on CONSTANT priors — cross-engine drift is one ulp into a 4-dp
  * rounded sum of four terms, the adamic-adar acceptance. Tier
  * thresholds compare the ROUNDED score. */
object Linkage {

  /** (field, m, u) priors: name-blocked customer pairs agree on nation
    * ~1/25 by chance, market segment 1/5, balance-within-100 rarely. */
  val Priors: Seq[(String, Double, Double)] = Seq(
    ("nation_agree", 0.95, 0.04),
    ("segment_agree", 0.90, 0.20),
    ("balance_agree", 0.70, 0.02))

  private def weight(flag: Column, m: Double, u: Double): Column =
    when(flag, log(lit(m) / lit(u))).otherwise(log(lit(1 - m) / lit(1 - u)))

  /** Score every edit-distance-1 candidate pair of customers (FastSS
    * deletion blocking — PassJoin's segment cap silently loses
    * suffix-edit pairs on the shared-prefix 'Customer#…' keys; see
    * [[FuzzyJoin.deletionNeighborhoodPairs]]). Output: names, the
    * blocking distance, the agreement flags, the summed log-odds score
    * (4 dp) and its match tier (thresholds on the ROUNDED score:
    * ≥ 4 match, ≥ 0 possible, else non_match). */
  def customerLinkage(customers: DataFrame): DataFrame = {
    val flagged = customerAgreementFlags(customers)
    val score = round(
      Priors.map { case (f, m, u) => weight(col(f), m, u) }.reduce(_ + _), 4)
    flagged.withColumn("score", score)
      .withColumn("tier",
        when(col("score") >= 4.0, "match")
          .when(col("score") >= 0.0, "possible")
          .otherwise("non_match"))
  }

  /** The shared blocking + per-field agreement-flag construction behind
    * [[customerLinkage]] (declared priors) and [[emFitPriors]]
    * (data-fit priors): FastSS edit-distance-1 candidate pairs, two
    * name-keyed attribute attaches, three boolean agreement fields. */
  def customerAgreementFlags(customers: DataFrame): DataFrame = {
    val pairs = FuzzyJoin.deletionNeighborhoodPairs(customers, "c_name")
    val attrs = customers.select(col("c_name").as("name"),
      col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
      round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))
    def side(s: String) =
      attrs.select(attrs.columns.map(c => col(c).as(s"${c}_$s")): _*)
    pairs
      .join(side("a"), col("value_a") === col("name_a"))
      .join(side("b"), col("value_b") === col("name_b"))
      .select(col("value_a").as("name_left"), col("value_b").as("name_right"),
        col("dist"),
        (col("nation_a") === col("nation_b")).as("nation_agree"),
        (col("segment_a") === col("segment_b")).as("segment_agree"),
        (abs(col("bal_cents_a") - col("bal_cents_b")) <= 10000L)
          .as("balance_agree"))
  }

  /** EM fit of the Fellegi–Sunter (m, u) parameters and the match
    * proportion p from the candidate pairs themselves (Winkler 1988's
    * classical EM under conditional independence) — the production
    * answer to [[Priors]]' declared bootstrap.
    *
    * Under conditional independence the E-step depends only on the
    * AGREEMENT PATTERN, so the pair relation collapses to a ≤ 2^K-row
    * pattern census (one corpus pass, map-side combined) and every EM
    * iteration is arithmetic on that census — the BPE/Lloyd
    * control-plane shape, with the census COLLECT bounded by 2^K = 8
    * rows (the vocabulary-bounded-collect precedent, `Bpe.scala`).
    * E-step: g(γ) = p·Π mᵏ / (p·Π mᵏ + (1−p)·Π uᵏ); M-step: p = Σng/N,
    * mₖ = Σng·γₖ/Σng, uₖ = Σn(1−g)·γₖ/(N−Σng). Every g and every
    * updated parameter is rounded to 9 dp PER ITERATION (the TextRank
    * round-each-step discipline) so float drift cannot compound across
    * engines; the fixed-iteration unroll is the oracle-replayable
    * surface (`q_record_linkage_em`). Output: one row per field
    * (field, m, u) plus the shared p and pair count, all rounded 6. */
  def emFitPriors(flagged: DataFrame, fields: Seq[String],
      iterations: Int = 5, seedM: Double = 0.9, seedU: Double = 0.1,
      seedP: Double = 0.1): DataFrame = {
    require(fields.nonEmpty && fields.size <= 10,
      s"1..10 agreement fields (census is 2^K rows), got ${fields.size}")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = flagged.sparkSession
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the ≤ 2^K pattern census — the ONLY corpus-sized pass
    val census = flagged
      .groupBy(fields.map(col): _*).agg(count(lit(1)).as("n"))
      .collect()
      .map(row => (fields.indices.map(row.getBoolean), row.getAs[Long]("n")))
      .sortBy(_._1.map(b => if (b) "1" else "0").mkString) // fixed fold order
    val nTotal = census.map(_._2).sum.toDouble
    var p = seedP
    var m = fields.map(_ => seedM).toArray
    var u = fields.map(_ => seedU).toArray
    (1 to iterations).foreach { _ =>
      val g = census.map { case (pat, _) =>
        val a = pat.zipWithIndex.foldLeft(p) { case (acc, (γ, k)) =>
          acc * (if (γ) m(k) else 1 - m(k)) }
        val b = pat.zipWithIndex.foldLeft(1 - p) { case (acc, (γ, k)) =>
          acc * (if (γ) u(k) else 1 - u(k)) }
        r9(a / (a + b))
      }
      val s = census.zip(g).map { case ((_, n), gi) => n * gi }.sum
      m = fields.indices.map { k =>
        r9(census.zip(g).collect { case ((pat, n), gi) if pat(k) => n * gi }
          .sum / s) }.toArray
      u = fields.indices.map { k =>
        r9(census.zip(g).collect { case ((pat, n), gi) if pat(k) =>
          n * (1 - gi) }.sum / (nTotal - s)) }.toArray
      p = r9(s / nTotal)
    }
    import spark.implicits._
    fields.zipWithIndex.map { case (f, k) =>
      (f, r6(m(k)), r6(u(k)), r6(p), nTotal.toLong) }
      .toDF("field", "m", "u", "p", "n_pairs")
  }
}
