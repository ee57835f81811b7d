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
    * `key`; change detection is a map-side struct compare (null-safe `<=>`
    * per attribute). */
  def scd2Merge(current: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], asOf: Column): DataFrame = {
    val live = current.filter(col("valid_to").isNull)
    val closed = current.filter(col("valid_to").isNotNull)
    val u = updates.select(col(key).as("u_key"),
      struct(attrs.map(col): _*).as("u_attrs"))
    val joined = live
      .withColumn("l_attrs", struct(attrs.map(col): _*))
      .join(u, col(key) === col("u_key"), "full_outer")
      .localCheckpoint(false) // three consumers below — join runs ONCE
    val changed = col("u_key").isNotNull && col(key).isNotNull &&
      !(col("l_attrs") <=> col("u_attrs"))
    // surviving live rows: unmatched keys + unchanged matches
    val kept = joined.filter(col("u_key").isNull ||
        (col(key).isNotNull && (col("l_attrs") <=> col("u_attrs"))))
      .select(current.columns.map(col): _*)
    // matched-and-changed live rows close
    val nowClosed = joined.filter(changed)
      .select((current.columns.filterNot(_ == "valid_to").map(col) :+
        asOf.as("valid_to")): _*)
    // changed + brand-new keys open a fresh version
    val opened = joined.filter(changed || col(key).isNull)
      .select((Seq(coalesce(col(key), col("u_key")).as(key)) ++
        attrs.map(a => col("u_attrs").getField(a).as(a)) ++
        Seq(asOf.as("valid_from"), lit(null).cast("timestamp").as("valid_to"))): _*)
    closed.unionByName(kept).unionByName(nowClosed).unionByName(opened)
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
}
