package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality audit: declarative rule checks over a table (the
  * great-expectations/dbt-test surface) — the gate a training-data or
  * warehouse load runs between write and publish, next to
  * [[Evolve.snapshotDiff]] in the write-audit-publish loop.
  *
  * Design: ALL rules evaluate in ONE map-side-combinable aggregation pass
  * (each rule is a Column predicate folded into a conditional sum), so
  * auditing 20 rules costs one table scan, not 20. A NULL predicate
  * result counts as a violation — a rule that cannot evaluate has failed,
  * the SQL-three-valued-logic trap callers otherwise hit one incident at
  * a time. */
object Audit {

  /** Per-rule violation counts + rates. `rules` maps rule name → predicate
    * that must hold for every row. One aggregate row, exploded to one row
    * per rule (rule, n_violations, n_rows, violation_rate). */
  def ruleReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggd = df.agg(count(lit(1)).as("n_rows"),
      rules.map { case (name, p) =>
        sum(when(p, 0L).otherwise(1L)).as(name) }: _*)
    aggd.select(col("n_rows"), explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(name).as("n_violations")) }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_violations").as("n_violations"),
        col("n_rows"),
        round(col("r.n_violations") / col("n_rows"), 6).as("violation_rate"))
  }

  /** Gini concentration of per-key activity counts — "do 1% of the keys
    * own 90% of the rows?", the skew-risk summary behind salting and
    * quota decisions. 0 = perfectly even, → 1 = one key owns everything.
    *
    * Computed WITHOUT a global row ranking: ranking 10^9 keys to feed
    * Σ i·x_i is the naive plan and it funnels everything into one sorted
    * partition. But x_i here is a COUNT with a small value domain, and
    * Gini is invariant to tie order, so the per-key relation collapses to
    * a (value → #keys) census first; a tied run of `cnt` keys starting
    * after `offset` smaller keys contributes x·(cnt·offset +
    * cnt·(cnt+1)/2) exactly. The only ordered window runs over the
    * census (≤ distinct count values — dozens), and every term stays
    * integer until the single final division. */
  def giniByKeyCount(df: DataFrame, keyCol: String): DataFrame = {
    val census = df.groupBy(col(keyCol)).agg(count(lit(1)).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    census
      .withColumn("offset", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .agg(
        sum(col("x") * (col("cnt") * col("offset") +
          call_function("div", col("cnt") * (col("cnt") + lit(1L)), lit(2L))))
          .as("sum_ix"),
        sum(col("x") * col("cnt")).as("sum_x"),
        sum(col("cnt")).as("n"))
      .select(col("n").as("n_keys"), col("sum_x").as("total"),
        round((lit(2L) * col("sum_ix") - (col("n") + 1) * col("sum_x")) /
          (col("n") * col("sum_x")).cast("double"), 6).as("gini"))
  }

  /** Order-independent table fingerprint: per-bucket (row count, XOR of a
    * 52-bit row hash) over md5(key columns) — two replicas of a table
    * compare by exchanging `buckets` tiny rows instead of 100 TB of data,
    * and a mismatch names the bucket to re-sync (the anti-entropy /
    * backup-verification primitive). XOR is the aggregator because it is
    * commutative, associative, self-inverse, and CANNOT overflow — the
    * checksum is layout- and order-independent by construction.
    * One map-side-combinable aggregation; output is `buckets` rows. */
  def tableChecksum(df: DataFrame, keyCols: Seq[String],
      buckets: Int = 64): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val h = call_function("graft_md5_prefix",
      concat_ws("|", keyCols.map(c => col(c).cast("string")): _*), lit(13))
    df.select((h % buckets).cast("int").as("bucket"), h.as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))
  }

  /** Pre-flight join-cardinality estimate: the EXACT output size of
    * `left ⋈ right` on an equi-key, computed from per-key counts WITHOUT
    * running the join — |A ⋈ B| = Σ_k ca(k)·cb(k). The 100 TB planning
    * tool: a join that would explode (hot key, unexpected many-to-many)
    * names its blowup and its worst key from two map-side-combinable
    * aggregations plus a join of two key-count relations, each no larger
    * than the key cardinality.
    *
    * Output (one row): est_rows, n_keys (keys present on BOTH sides),
    * max_key_pairs (the worst key's contribution), top_key_share
    * (max/est — ≈1 means one key IS the join; salt it). All-integer until
    * the single final division, so the numbers are engine-exact. */
  def joinCardinality(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val la = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("ca"))
    val ra = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cb"))
    la.join(ra, Seq("k"))
      .agg(sum(col("ca") * col("cb")).as("est_rows"),
        count(lit(1)).as("n_keys"),
        max(col("ca") * col("cb")).as("max_key_pairs"))
      .select(col("est_rows"), col("n_keys"), col("max_key_pairs"),
        round(col("max_key_pairs") / col("est_rows").cast("double"), 6)
          .as("top_key_share"))
  }

  /** Referential-integrity audit: fact rows whose key has no partner in
    * the dimension (left anti join — broadcastable whenever the dim key
    * set fits, which is the normal case for a 100 TB fact table). */
  def referentialOrphans(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String): DataFrame =
    fact.join(dim.select(col(dimKey).as(factKey)).distinct(),
      Seq(factKey), "left_anti")
}
