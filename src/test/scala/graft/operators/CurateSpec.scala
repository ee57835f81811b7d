package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** End-to-end curation invariants: every output row passed the quality
  * gate, is its own dedup representative, and carries a valid split. */
class CurateSpec extends SparkSpec {

  test("curate output: unique survivors, quality floor, split partition") {
    val out = Curate.curate(spark, sfDir, 3)
    val n = out.count()
    assert(n > 0)
    assert(out.select("doc_id").distinct().count() == n)
    assert(out.filter(col("n_tokens") < Curate.MinTokens).count() == 0)
    assert(out.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
    assert(out.filter(!col("split").isin("train", "valid", "test")).count() == 0)
    // curation only ever removes documents
    assert(n <= Tables(spark, sfDir, "documents").count())
    // split is consistent with the deterministic bucket
    assert(out.filter(col("bucket") < 90 && col("split") =!= "train").count() == 0)
    assert(out.filter(col("bucket") >= 95 && col("split") =!= "test").count() == 0)
  }

  test("gateByQuantile keeps the at-or-above-median rows per stratum via broadcast thresholds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", 1), (2L, "en", 2), (3L, "en", 3), (4L, "en", 4), // median 2.5
      (10L, "fr", 10), (11L, "fr", 20), (12L, "fr", 30)           // median 20
    ).toDF("doc_id", "lang", "s")
    val kept = Curate.gateByQuantile(docs, col("s"), "lang", 0.5)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(3L, 4L, 11L, 12L))
    // thresholds are broadcast; no per-stratum window sort anywhere
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("Window "), plan)
  }
}
