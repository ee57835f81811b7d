package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-evolution surfaces: SCD2 dimension versioning and snapshot
  * diffing — the merge/upsert corner of the lake layer, expressed as pure
  * batch transformations (no transactional table format in this
  * environment; the OUTPUT is the next immutable snapshot, the
  * write-audit-publish pattern).
  *
  * Both operators are one equi-join on the key plus map-side column
  * compares: nothing quadratic, nothing driver-side, and the join is
  * broadcastable whenever one side is a delta batch (the common case —
  * updates are small against a big dimension).
  */
object Evolve {

  /** SCD2 (slowly-changing-dimension type 2) merge: `current` is the open
    * version set (valid_to IS NULL = live rows); `updates` is today's
    * batch keyed by `key` with the same attribute columns. Per key:
    *
    *   - attribute change → the live row CLOSES (valid_to = asOf) and a
    *     new version OPENS (valid_from = asOf, valid_to = null);
    *   - no change → the live row passes through untouched;
    *   - new key → a first version opens;
    *   - key absent from the batch → passes through (absence is not a
    *     delete in SCD2; deletes arrive as explicit tombstone updates).
    *
    * Closed history rows are NOT read or rewritten — at 100 TB the closed
    * partition is untouched and this merge runs over live rows only
    * (partition `current` by valid_to nullness). One outer equi-join on
    * `key`, ONE pass over the joined rows: each row emits its output
    * version rows (pass-through / close / open) through a conditional-
    * array explode — map-side, no re-scan, no materialization of the
    * joined dimension. Change detection is a null-safe struct compare. */
  def scd2Merge(current: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], asOf: Column): DataFrame = {
    val live = current.filter(col("valid_to").isNull)
    val closed = current.filter(col("valid_to").isNotNull)
    val u = updates.select(col(key).as("u_key"),
      struct(attrs.map(col): _*).as("u_attrs"))
    val joined = live
      .withColumn("l_attrs", struct(attrs.map(col): _*))
      .join(u, col(key) === col("u_key"), "full_outer")
    val matched = col("u_key").isNotNull && col(key).isNotNull
    val changed = matched && !(col("l_attrs") <=> col("u_attrs"))
    def version(k: Column, a: String => Column, from: Column,
        to: Column): Column =
      struct((Seq(k.as(key)) ++ attrs.map(c => a(c).as(c)) ++
        Seq(from.as("valid_from"), to.cast("timestamp").as("valid_to"))): _*)
    val nullTs = lit(null).cast("timestamp")
    val emitted = array(
      // surviving live row: unmatched key, or unchanged match
      when(col("u_key").isNull || (matched && !changed),
        version(col(key), col(_), col("valid_from"), col("valid_to"))),
      // matched-and-changed live row closes
      when(changed, version(col(key), col(_), col("valid_from"), asOf)),
      // changed + brand-new keys open a fresh version
      when(changed || col(key).isNull,
        version(coalesce(col(key), col("u_key")),
          a => col("u_attrs").getField(a), asOf, nullTs)))
    val merged = joined
      .select(explode(filter(emitted, _.isNotNull)).as("r"))
      .select(col("r.*"))
    closed.unionByName(merged.select(current.columns.map(col): _*))
  }

  /** Point-in-time (as-of) SCD2 resolution: each fact row joins the
    * dimension VERSION that was valid at the fact's event time — the
    * temporal fact→dimension join SCD2 exists to serve. A fact dated
    * before the key's first version (or an unknown key) resolves to null
    * attributes (left join), never to a later version.
    *
    * Scale shape: this is an EQUI-join on the key — the validity range is
    * a residual condition, not a join dimension — with build-side fanout
    * bounded by versions-per-key (small by construction: dimensions
    * change slowly). Since versions partition each key's timeline,
    * exactly one version matches; no dedup pass, no window, no range
    * bucketing needed. Broadcastable whenever the dimension fits. */
  def scd2Lookup(fact: DataFrame, dim: DataFrame, key: String,
      timeCol: String): DataFrame = {
    val d = dim.withColumnRenamed(key, "dim_key")
    fact.join(d,
      fact(key) === d("dim_key") && fact(timeCol) >= d("valid_from") &&
        (d("valid_to").isNull || fact(timeCol) < d("valid_to")),
      "left")
      .drop("dim_key")
  }

  /** Snapshot diff: row-level change report between two snapshots of the
    * same keyed table — `added` / `removed` / `changed` / `same` per key,
    * the audit step of write-audit-publish. One full-outer equi-join,
    * null-safe struct compare map-side. */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String,
      attrs: Seq[String]): DataFrame = {
    val b = before.select(col(key), struct(attrs.map(col): _*).as("b_attrs"))
    val a = after.select(col(key).as("a_key"),
      struct(attrs.map(col): _*).as("a_attrs"))
    b.join(a, col(key) === col("a_key"), "full_outer")
      .select(coalesce(col(key), col("a_key")).as(key),
        when(col(key).isNull, "added")
          .when(col("a_key").isNull, "removed")
          .when(col("b_attrs") <=> col("a_attrs"), "same")
          .otherwise("changed").as("status"))
  }

  /** MERGE upsert: apply a change batch (`source` = key + attrs + a
    * boolean `deletedCol`) to a snapshot — matched & deleted rows drop,
    * matched & live rows take the source attributes, unmatched source
    * rows insert, untouched target rows pass through. The next-snapshot
    * batch form of MERGE INTO (write-audit-publish; SCD2 is the
    * versioned sibling, this is the overwrite-in-place one).
    *
    * Scale shape: NO full-table shuffle anywhere. Leg 1 (pass-through /
    * update / delete) is the target LEFT-joined against the BROADCAST
    * batch — map-side. Leg 2 (inserts) needs "source keys absent from
    * the target", whose direct anti-join would shuffle the target; instead
    * the matched keys are first extracted as target SEMI broadcast(batch)
    * — map-side, output bounded by the batch size — and broadcast back
    * for the source-side anti join. At 100 TB add partition pruning on
    * the batch's key range so leg 1 rewrites only affected partitions. */
  def mergeUpsert(target: DataFrame, source: DataFrame, key: String,
      deletedCol: String = "deleted"): DataFrame = {
    val attrs = target.columns.filterNot(_ == key).toSeq
    val srcK = source.select(col(key).as("src_key"),
      col(deletedCol).as("src_del"), struct(attrs.map(col): _*).as("src_attrs"))
    val updated = target.join(broadcast(srcK),
        col(key) === col("src_key"), "left")
      .filter(col("src_key").isNull || !col("src_del"))
      .select(col(key) +: attrs.map(a =>
        when(col("src_key").isNotNull, col("src_attrs").getField(a))
          .otherwise(col(a)).as(a)): _*)
    val matchedKeys = target.join(broadcast(srcK.select(col("src_key"))),
      col(key) === col("src_key"), "left_semi").select(col(key))
    val inserts = source.filter(!col(deletedCol))
      .join(broadcast(matchedKeys), Seq(key), "left_anti")
      .select((key +: attrs).map(col): _*)
    updated.unionByName(inserts)
  }

  /** Right-to-be-forgotten propagation census: given a tombstone predicate
    * over the customer dimension, report how many rows each downstream
    * table loses when the deletion cascades customer → orders (by
    * custkey) → lineitem (by orderkey). The audit half of a GDPR erasure
    * job: run BEFORE the rewrite to size it, and after as the
    * verification that the cascade reached every table.
    *
    * Scale shape: the tombstone key set is a filtered dimension —
    * broadcast to both fact joins, so each fact table is ONE map-side
    * pass (left join against the broadcast set + conditional count); the
    * order-key relay set is likewise a filtered projection of orders. At
    * 100 TB, if a tombstone batch ever outgrew broadcast, the same plan
    * degrades gracefully to shuffle semi-joins — the COUNTS stay one
    * aggregation per table either way; AQE picks the join strategy. */
  def forgetCensus(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, tombstoned: Column): DataFrame = {
    val tomb = customer.filter(tombstoned)
      .select(col("c_custkey").as("tomb_key"))
    def census(tbl: String, df: DataFrame, key: String,
        keys: DataFrame): DataFrame =
      df.join(broadcast(keys), col(key) === col("tomb_key"), "left")
        .agg(sum(when(col("tomb_key").isNotNull, 1L).otherwise(0L))
            .as("n_purged"),
          sum(when(col("tomb_key").isNull, 1L).otherwise(0L)).as("n_kept"))
        .select(lit(tbl).as("tbl"), col("n_purged"), col("n_kept"))
    val purgedOrderKeys = orders
      .join(broadcast(tomb), col("o_custkey") === col("tomb_key"), "left_semi")
      .select(col("o_orderkey").as("tomb_key"))
    census("customer", customer, "c_custkey", tomb)
      .union(census("orders", orders, "o_custkey", tomb))
      .union(census("lineitem", lineitem, "l_orderkey", purgedOrderKeys))
  }
}
