package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.registry._
import graft.registry.RegistryShared.pricingSummary


/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2 (+ the north-star LLM-pipeline operators), each with
  * equivalent ANSI SQL for the DuckDB oracle.
  *
  * Conventions for oracle parity:
  *  - every computed/aggregated column is aliased identically in Spark and
  *    SQL (the driver compare sorts columns by name);
  *  - floating-point aggregates are rounded (2-4 decimals) on BOTH sides
  *    so partial-aggregation order can't flip a hash;
  *  - thresholds are applied to the ROUNDED value so the selected row set
  *    is identical in both engines;
  *  - integer-typed derived columns are cast so Spark and DuckDB agree
  *    (DuckDB `sum(int)` is HUGEINT, `len()` is BIGINT, ...).
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7 minimum slice): pricing summary in the
    * shape of the reference's filter → groupBy → agg pipeline
    * (`/root/reference/pyspark-2.ipynb:360,547-617`) over lineitem.
    * Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    pricingSummary(spark, "/root/testdata/sf0.001")

  /** Union of the per-family registry slices (see graft.registry.*). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalRegistry.queries ++
    MonitoringRegistry.queries ++
    TextAnalysisRegistry.queries ++
    DedupRegistry.queries ++
    SimilarityRegistry.queries ++
    MiscRegistry.queries ++
    GraphRegistry.queries ++
    SeriesRegistry.queries ++
    MultimodalRegistry.queries ++
    LakeRegistry.queries

  /** DuckDB-runnable ANSI SQL per query; same parquet tables, same column
    * aliases, same rounding, same injected NULLs. */
  def oracleSql: Map[String, String] =
    RelationalRegistry.oracleSql ++
    MonitoringRegistry.oracleSql ++
    TextAnalysisRegistry.oracleSql ++
    DedupRegistry.oracleSql ++
    SimilarityRegistry.oracleSql ++
    MiscRegistry.oracleSql ++
    GraphRegistry.oracleSql ++
    SeriesRegistry.oracleSql ++
    MultimodalRegistry.oracleSql ++
    LakeRegistry.oracleSql
}
