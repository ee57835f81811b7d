package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Text
import graft.lake.Tables

/** Bloom prefilter for incremental dedup: no false negatives, result
  * parity with the plain anti-join operator under ANY filter sizing
  * (false positives are verified away), broadcast probe plan. */
class BloomSpec extends SparkSpec {

  private def docs = Tables(spark, sfDir, "documents")
  private def corpus = docs.filter(col("doc_id") < 25)
  private def delta = docs.filter(col("doc_id") >= 25)

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("doc_id", "fingerprint").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("bloom-filtered incremental dedup == plain incremental dedup, at any filter size") {
    val expected = asSet(Dedup.incrementalExactDedup(corpus, delta))
    for ((bits, k) <- Seq((4096, 3), (64, 2), (128, 1))) {
      val got = asSet(Bloom.incrementalExactDedup(corpus, delta, bits, k))
      assert(got == expected, s"mismatch at bits=$bits k=$k: " +
        s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    }
  }

  test("no false negatives: every delta fingerprint present in the corpus is bloom-positive") {
    val ex = corpus.select(Text.fingerprint(col("text")).as("fingerprint")).distinct()
    val inc = delta.select(col("doc_id"), Text.fingerprint(col("text")).as("fingerprint"))
    val flagged = Bloom.probe(inc, Bloom.build(ex, 64, 2), 64, 2)
    val dupButNegative = flagged.filter(col("bloom_hit") === 0)
      .join(ex, Seq("fingerprint"), "left_semi")
    assert(dupButNegative.isEmpty, "a true duplicate probed bloom-negative")
  }

  test("a tiny filter forces false positives and they all survive the verify join") {
    // 64 bits over 25 corpus docs is ~full: most novel rows flag positive
    val out = Bloom.incrementalExactDedup(corpus, delta, bits = 64, k = 2)
    val fps = out.filter(col("bloom_hit") === 1).count()
    assert(fps > 0, "expected false positives at 64 bits; filter unrealistically clean")
    // and at a healthy size the same rows probe negative (skip the join)
    val healthy = Bloom.incrementalExactDedup(corpus, delta, bits = 4096, k = 3)
    assert(healthy.filter(col("bloom_hit") === 1).count() < fps)
  }

  test("filter relation is bounded by bits/32 words and the probe side is broadcast") {
    val ex = corpus.select(Text.fingerprint(col("text")).as("fingerprint")).distinct()
    assert(Bloom.build(ex, 4096, 3).count() <= 4096 / 32)
    val plan = Bloom.incrementalExactDedup(corpus, delta)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probe join not broadcast:\n$plan")
  }
}
