package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Text
import graft.lake.Tables

/** Sequence packing spans: interior sequences tile to exactly seqLen
  * tokens, every doc is fully covered by contiguous spans, and the bucket
  * count is a real parameter (not a hard-coded 100). */
class PackingSpec extends SparkSpec {

  private def spansOf(seqLen: Long, buckets: Int) =
    Packing.packSpans(Tables(spark, sfDir, "documents"), "doc_id",
      Text.tokenCount(col("text")), seqLen, buckets)

  // sf0.001 is small: pack into few buckets / short sequences so streams
  // actually cross boundaries (the production call uses 2048 x 100)
  test("interior sequences sum to exactly seqLen tokens") {
    val spans = spansOf(256, 4).cache()
    try {
      val lastSeq = spans.groupBy("bucket").agg(max("seq_id").as("last_seq"))
      val interior = spans.join(lastSeq, "bucket")
        .filter(col("seq_id") < col("last_seq"))
        .groupBy("bucket", "seq_id")
        .agg(sum(col("token_end") - col("token_start")).as("n"))
      val bad = interior.filter(col("n") =!= 256).count()
      val nInterior = interior.count()
      assert(nInterior > 0, "test data must produce at least one interior sequence")
      assert(bad == 0, s"$bad of $nInterior interior sequences don't sum to 256 (seqLen)")
    } finally spans.unpersist()
  }

  test("spans tile each doc contiguously: start 0, end n_tokens, no gaps") {
    val spans = spansOf(64, 4).cache()
    try {
      // per doc: min start 0, max end == n_tokens, lengths sum to n_tokens
      val perDoc = spans.groupBy("doc_id", "n_tokens")
        .agg(min("token_start").as("lo"), max("token_end").as("hi"),
          sum(col("token_end") - col("token_start")).as("covered"))
      assert(perDoc.filter(col("lo") =!= 0 || col("hi") =!= col("n_tokens") ||
        col("covered") =!= col("n_tokens")).count() == 0,
        "doc spans must cover [0, n_tokens) exactly")
      // contiguity: successive spans (by seq_id) butt-join within each doc
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("seq_id")
      val gaps = spans
        .withColumn("prev_end", lag("token_end", 1).over(w))
        .filter(col("prev_end").isNotNull && col("prev_end") =!= col("token_start"))
      assert(gaps.count() == 0, "spans within a doc must be contiguous")
      // split docs exist in the test data (otherwise this spec is vacuous)
      assert(spans.groupBy("doc_id").count().filter(col("count") > 1).count() > 0,
        "test data must contain at least one boundary-crossing doc")
    } finally spans.unpersist()
  }

  test("seq_offset places spans: within a sequence, spans tile [0, seqLen)") {
    val spans = spansOf(512, 10).cache()
    try {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket", "seq_id").orderBy("doc_id")
      val placed = spans
        .withColumn("prev_top",
          lag(col("seq_offset") + (col("token_end") - col("token_start")), 1).over(w))
      // first span of a sequence starts at 0 UNLESS nothing precedes it;
      // every later span starts exactly where the previous ended
      val misplaced = placed.filter(
        (col("prev_top").isNull && col("seq_offset") =!= 0) ||
        (col("prev_top").isNotNull && col("seq_offset") =!= col("prev_top"))).count()
      assert(misplaced == 0, s"$misplaced spans misplaced within their sequence")
    } finally spans.unpersist()
  }

  test("bucket count is a parameter; zero-token docs emit no span") {
    import spark.implicits._
    // explicit token counts: Text.tokenCount("") is 1 (split of empty
    // string yields [""]), so the zero-token path needs a real 0
    val docs = Seq((1L, 3L), (2L, 0L), (3L, 5L)).toDF("doc_id", "n_toks")
    val got = Packing.packSpans(docs, "doc_id", col("n_toks"),
      seqLen = 4, buckets = 7)
    val buckets = got.select("bucket").distinct().collect().map(_.getInt(0))
    assert(buckets.forall(b => b >= 0 && b < 7), s"buckets out of range: ${buckets.toSeq}")
    assert(got.filter(col("doc_id") === 2L).count() == 0, "empty doc must emit no span")
    // doc 3 (5 tokens) must split if it crosses a 4-token boundary — and
    // whatever the hash layout, total coverage equals total tokens
    val covered = got.agg(sum(col("token_end") - col("token_start"))).head().getLong(0)
    assert(covered == 8, s"total covered tokens $covered != 8")

    // idCol is a real parameter: a non-"doc_id" id column must work
    val chunks = Seq((10L, 3L), (11L, 5L)).toDF("chunk_id", "n_toks")
    val viaChunkId = Packing.packSpans(chunks, "chunk_id", col("n_toks"),
      seqLen = 4, buckets = 3)
    assert(viaChunkId.agg(sum(col("token_end") - col("token_start")))
      .head().getLong(0) == 8)
  }
}
