package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy census operators — the k-anonymity complement to the PII
  * regex scrub (`Text.redactPii`): PII removal cleans VALUES, k-anonymity
  * measures whether quasi-identifier COMBINATIONS (segment × nation × …)
  * isolate individuals, the standard re-identification risk model for
  * releasing or training on user-derived tabular data.
  *
  * Scale shape: the census is one hash aggregate over the quasi-identifier
  * tuple (map-side combinable, group count ≤ the QI-value cross product,
  * never corpus-sized). Suppression needs each ROW tagged with its group's
  * size — a window count over the same partitioning key, one shuffle by
  * QI, no join, no second scan. */
object Privacy {

  /** Per-group census: one row per quasi-identifier combination with its
    * population `n` and `at_risk = n < k`. */
  def kAnonymityCensus(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)

  /** l-diversity census: k-anonymity's blind spot is a UNIFORM group — 50
    * people sharing one quasi-identifier tuple AND one sensitive value
    * leak that value to anyone who can place a person in the group. Per
    * QI group: population n, distinct sensitive values l, the top value's
    * share, and `at_risk = l < minL`. Same one-aggregate shape as the
    * k census (the top-share needs a (QI, value) sub-census first — both
    * map-side combinable, both bounded by value cross products). */
  def lDiversityCensus(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, minL: Int): DataFrame = {
    val sub = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("nv"))
    sub.groupBy(qiCols.map(col): _*)
      .agg(sum(col("nv")).as("n"),
        count(lit(1)).as("l"),
        max(col("nv")).as("top_n"))
      .select(qiCols.map(col) ++ Seq(col("n"), col("l"),
        round(col("top_n").cast("double") / col("n"), 6).as("top_share"),
        (col("l") < minL).as("at_risk")): _*)
  }

  /** t-closeness census (Li, Li & Venkatasubramanian, ICDE 2007) —
    * l-diversity's blind spot is a SKEWED group: 10 distinct sensitive
    * values pass any l gate, but if 9 of them are rare and one dominates
    * the group far beyond its global share, membership in the group still
    * updates an attacker's belief. t-closeness bounds the Earth Mover's
    * Distance between each QI group's sensitive-value distribution and
    * the GLOBAL distribution. For an ordered attribute the EMD has the
    * closed form (1/(m−1))·Σᵢ|Σ_{j≤i}(p_j − q_j)| over the m-value
    * ordered domain.
    *
    * Engine-exact arithmetic: p_j − q_j = nv_j/n_g − gv_j/N is kept as
    * the INTEGER numerator nv_j·N − gv_j·n_g over the common denominator
    * n_g·N; cumulative sums and the |·| fold stay BIGINT-exact, and the
    * single division by n_g·N·(m−1) happens once at the output (safe
    * while m·N² < 2⁶³, i.e. N ≲ 6·10⁸ at m=25 — beyond that, pre-divide
    * the shares and accept float cumsums).
    *
    * Scale shape: two map-side-combinable censuses (QI×value and global
    * value), then a (groups × m) grid built by cross-joining the
    * post-aggregate group census with the ONE-ROW-per-value broadcast
    * global census — the corpus is scanned once and never re-shuffled;
    * the cumsum window partitions by QI over the tiny grid, never a
    * corpus-sized relation. */
  def tClosenessCensus(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    val sub = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("nv"))
    val glob = sub.groupBy(col(sensitiveCol))
      .agg(sum(col("nv")).as("gv"))
    val tot = glob.agg(sum(col("gv")).as("big_n"),
      count(lit(1)).as("m"))
    val groups = sub.groupBy(qiCols.map(col): _*)
      .agg(sum(col("nv")).as("n"))
    val grid = groups
      .crossJoin(broadcast(glob.crossJoin(tot)))
      .join(sub, qiCols :+ sensitiveCol, "left")
      .withColumn("diff_num",
        coalesce(col("nv"), lit(0L)) * col("big_n") - col("gv") * col("n"))
    val w = Window.partitionBy(qiCols.map(col): _*)
      .orderBy(col(sensitiveCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum_num", sum(col("diff_num")).over(w))
      .groupBy((qiCols.map(col) :+ col("n") :+ col("m") :+ col("big_n")): _*)
      .agg(sum(abs(col("cum_num"))).as("abs_cum_sum"))
      .select(qiCols.map(col) ++ Seq(col("n"), col("m"),
        round(col("abs_cum_sum").cast("double") /
          (col("n") * col("big_n") * (col("m") - 1L)).cast("double"), 6)
          .as("emd")): _*)
      .withColumn("at_risk", col("emd") > t)
  }

  /** Suppression: rows whose QI group holds fewer than `k` members get
    * every QI column nulled (cell suppression — the simplest
    * generalization step); all other columns pass through. The group size
    * comes from a window census over the QI partitioning, so the corpus
    * is shuffled ONCE and never joined. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(qiCols.map(col): _*)
    val masked = df.withColumn("_gn", count(lit(1)).over(w))
    val out = qiCols.foldLeft(masked) { (acc, c) =>
      acc.withColumn(c,
        when(col("_gn") >= k, col(c)).otherwise(lit(null).cast(df.schema(c).dataType)))
    }
    out.drop("_gn")
  }
}
