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
