package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE shared timing protocol — one definition of "a timed run", used by
  * every surface that produces a number someone compares: Bench's main
  * sweep, Bench's tail adjudication pass, and ProfileX spot-checks.
  *
  * Round-12 lesson: the adjudicator and ProfileX disagreed ~2× on
  * checkpoint-heavy dedup queries because their run protocols drifted
  * apart in two places — ProfileX had no untimed warm-up (its first run
  * absorbed codegen/JIT and the reader was left to discard it by eye)
  * and both cleared persistent RDD blocks NON-blocking, so how much of
  * the previous run's localCheckpoint residue was still alive at the
  * next run's start depended on context (a tail adjudication after a
  * 300-query sweep quiesces very differently from a cold ProfileX). One
  * protocol closes both gaps:
  *
  *  - [[clearState]] between every run: catalog cache, the CC label
  *    memo, and a BLOCKING unpersist of all persistent RDDs — the next
  *    run starts from the same block-manager state regardless of what
  *    ran before.
  *  - [[steadyRuns]] = 1 untimed warm-up + N timed runs; the reported
  *    steady value is the MEDIAN of the timed runs. Bench's adjudicator
  *    calls exactly this; ProfileX reports the same median as `steady`
  *    next to its full trace, so the two tools print comparable numbers
  *    by construction.
  */
object BenchProtocol {

  /** Inter-run cleanup: catalog-cached relations, the CC label memo
    * (a DataFrame backed by localCheckpoint blocks — must die in the
    * same breath as the blocks or every consumer fails with
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), and every persistent RDD.
    * BLOCKING unpersist: a non-blocking one leaves the actual block
    * eviction racing the next timed run, which is exactly the
    * context-dependent noise a shared protocol exists to remove. */
  def clearState(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    graft.operators.Dedup.clearCcCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }

  /** One timed full-plan execution (noop-format write, so Catalyst
    * cannot prune the query to a row count) with [[clearState]] ALWAYS
    * run after, success or failure. */
  def timeOnce(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => DataFrame): Double = {
    val t0 = System.nanoTime()
    try {
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    } finally clearState(spark)
  }

  /** The adjudication shape: `warmups` untimed passes (absorb Janino
    * codegen + JIT + page-cache first-touch) then `runs` timed ones.
    * Throws if the query itself throws — callers wanting partial
    * results wrap per-run. */
  def steadyRuns(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => DataFrame,
      warmups: Int = 1, runs: Int = 3): Seq[Double] = {
    (1 to warmups).foreach(_ => timeOnce(spark, sfDir, fn))
    (1 to runs).map(_ => timeOnce(spark, sfDir, fn))
  }

  /** Median: middle element for odd counts, mean of the two middle
    * elements for even (the partial-failure 2-run case). */
  def median(ts: Seq[Double]): Double = {
    val s = ts.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }
}
