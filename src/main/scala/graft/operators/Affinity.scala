package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-behavior analytics: market-basket association rules and RFM
  * (recency / frequency / monetary) segmentation — the affinity surface a
  * lakehouse serves to merchandising and lifecycle teams, built from the
  * same orders/lineitem ledger the reference's notebooks aggregate
  * (reference analogue: the groupBy census tier, pyspark-2.ipynb). */
object Affinity {

  /** Frequent item-pair association rules (support / confidence / lift)
    * over (basket, item) rows — a-priori pruned market-basket mining.
    *
    * Scale shape, in order: (1) the ledger collapses to DISTINCT
    * (basket, item) map-side; (2) a-priori prune — a pair can reach
    * `minSupport` only if BOTH members do, so baskets join the
    * frequent-item relation (item-vocabulary-sized, broadcast) BEFORE any
    * pair forms; (3) pairs expand WITHIN each basket from one sorted
    * in-basket array (a groupBy, not a self-join) — basket cardinality is
    * the natural bound (a cart, an order), and `maxBasket` caps
    * adversarial mega-baskets by keeping the `maxBasket` smallest item
    * ids (a capped basket under-counts pairs touching its dropped tail —
    * stated, not silent); (4) per-item support rides the pair structs, so
    * confidence and lift need no join back — the only post-pair shuffle
    * is the (item_a, item_b) count, and the basket total is ONE broadcast
    * scalar row. */
  def associationRules(rows: DataFrame, basketCol: String, itemCol: String,
      minSupport: Int, maxBasket: Int = 1024): DataFrame = {
    val b = rows.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val nb = b.agg(count_distinct(col("basket")).as("n_baskets"))
    val freq = b.groupBy(col("item")).agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= minSupport)
    b.join(broadcast(freq), "item")
      .groupBy(col("basket"))
      .agg(slice(array_sort(collect_list(struct(col("item"), col("supp")))),
        1, maxBasket).as("ms"))
      // pairsOf needs >= 2 elements (sequence(1,0) counts DOWN in Spark);
      // single-frequent-item baskets contribute no pairs anyway
      .filter(size(col("ms")) > 1)
      .select(explode(Dedup.pairsOf(col("ms"))).as("p"))
      .groupBy(col("p.a.item").as("item_a"), col("p.b.item").as("item_b"),
        col("p.a.supp").as("supp_a"), col("p.b.supp").as("supp_b"))
      .agg(count(lit(1)).as("pair_supp"))
      .filter(col("pair_supp") >= minSupport)
      .crossJoin(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("pair_supp"),
        col("supp_a"), col("supp_b"),
        round(col("pair_supp").cast("double") / col("supp_a"), 6).as("conf_ab"),
        round(col("pair_supp").cast("double") / col("supp_b"), 6).as("conf_ba"),
        round(col("pair_supp").cast("double") * col("n_baskets") /
          (col("supp_a") * col("supp_b")), 6).as("lift"))
  }

  /** RFM segmentation over an orders ledger: per-customer recency (days
    * since last order, anchored to the ledger's own max date so the
    * metric is reproducible without a wall clock), frequency (order
    * count) and monetary (total spend), each quintile-scored 1..5
    * (5 = best), plus a coarse lifecycle label from the R×F corners.
    *
    * Scale shape: the 100 TB side is the per-customer aggregation — one
    * map-side-combinable pass over the ledger. Scoring then runs on the
    * CUSTOMER DIMENSION (orders of magnitude smaller) — but a customer
    * dimension outgrows one sort task too, so each quintile is a
    * [[Sampling.bandedNtile]] replay: range bands + broadcast rank
    * offsets, bit-identical to `ntile(5) OVER (ORDER BY metric, key)`
    * (the q_calibration machinery) with no global sort anywhere. Ties
    * order by (metric, customer id) so boundaries are deterministic, and
    * monetary is rounded BEFORE ordering so float-sum noise cannot
    * reorder ties across engines. */
  def rfm(orders: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        round(sum(col("o_totalprice")), 2).as("monetary"))
    val anchor = per.agg(max(col("last_order")).as("anchor"))
    val base = per.crossJoin(broadcast(anchor))
      .withColumn("recency_days", datediff(col("anchor"), col("last_order")))
    val tie = Seq(col("o_custkey"))
    val scored = Sampling.bandedNtile(
      Sampling.bandedNtile(
        Sampling.bandedNtile(base,
          col("recency_days"), tie, 5, "r_score", desc = true),
        col("frequency"), tie, 5, "f_score"),
      col("monetary"), tie, 5, "m_score")
    scored
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "recent")
          .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "dormant")
          .otherwise("core").as("segment"))
  }
}
