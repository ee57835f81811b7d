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
}
