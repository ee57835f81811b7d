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
    val pairs = FuzzyJoin.deletionNeighborhoodPairs(customers, "c_name")
    val attrs = customers.select(col("c_name").as("name"),
      col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
      round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))
    def side(s: String) =
      attrs.select(attrs.columns.map(c => col(c).as(s"${c}_$s")): _*)
    val flagged = pairs
      .join(side("a"), col("value_a") === col("name_a"))
      .join(side("b"), col("value_b") === col("name_b"))
      .select(col("value_a").as("name_left"), col("value_b").as("name_right"),
        col("dist"),
        (col("nation_a") === col("nation_b")).as("nation_agree"),
        (col("segment_a") === col("segment_b")).as("segment_agree"),
        (abs(col("bal_cents_a") - col("bal_cents_b")) <= 10000L)
          .as("balance_agree"))
    val score = round(
      Priors.map { case (f, m, u) => weight(col(f), m, u) }.reduce(_ + _), 4)
    flagged.withColumn("score", score)
      .withColumn("tier",
        when(col("score") >= 4.0, "match")
          .when(col("score") >= 0.0, "possible")
          .otherwise("non_match"))
  }
}
