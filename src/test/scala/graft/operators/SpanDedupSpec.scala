package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sub-document span dedup (ExactSubstr tier): the report counts
  * corpus-duplicated k-spans with interval-union token coverage, the scrub
  * removes exactly the covered tokens, and the census runs join-free. */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  // 4-gram "alpha beta gamma delta" occurs in docs 1 and 2 (boilerplate);
  // doc 3 is unique; doc 4 is shorter than k; doc 5 IS the boilerplate
  // exactly (scrubs to empty)
  private val docs = Seq(
    (1L, "alpha beta gamma delta unique one tail words"),
    (2L, "prefix alpha beta gamma delta other ending"),
    (3L, "completely different content with no repeats at all"),
    (4L, "tiny doc"),
    (5L, "alpha beta gamma delta")).toDF("doc_id", "text")

  private def brute(k: Int): Map[Long, Set[Int]] = {
    // 0-indexed covered token positions per doc, recomputed naively
    val toks = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.toLowerCase.split("\\s+").toSeq).toMap
    val spans = toks.toSeq.flatMap { case (id, t) =>
      t.sliding(k).zipWithIndex.filter(_._1.size == k)
        .map { case (w, i) => (id, i, w.mkString(" ")) }.toSeq
    }
    val counts = spans.groupBy(_._3).view.mapValues(_.size).toMap
    spans.filter(s => counts(s._3) > 1)
      .groupBy(_._1).view
      .mapValues(_.flatMap(s => s._2 until s._2 + k).toSet).toMap
      .withDefaultValue(Set.empty)
  }

  test("dupSpanReport: counts and interval-union coverage match brute force") {
    val cov = brute(4)
    val rep = SpanDedup.dupSpanReport(docs, 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rep(1L).getAs[Long]("n_dup_tokens") == cov(1L).size)
    assert(rep(2L).getAs[Long]("n_dup_tokens") == cov(2L).size)
    assert(rep(3L).getAs[Long]("n_dup_spans") == 0
      && rep(3L).getAs[Long]("n_dup_tokens") == 0)
    // shorter than k: zero spans, zero coverage
    assert(rep(4L).getAs[Int]("n_spans") == 0
      && rep(4L).getAs[Double]("dup_token_frac") == 0.0)
    // doc 5 is pure boilerplate: all 4 tokens covered, frac = 1.0
    assert(rep(5L).getAs[Long]("n_dup_tokens") == 4
      && rep(5L).getAs[Double]("dup_token_frac") == 1.0)
  }

  test("overlapping duplicated spans count covered tokens once") {
    // "a b c d e" twice: spans (a b c d) and (b c d e) both duplicated and
    // overlap in 3 tokens — union is 5 per doc, not 8
    val two = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val rep = SpanDedup.dupSpanReport(two, 4).collect()
    assert(rep.forall(_.getAs[Long]("n_dup_spans") == 2))
    assert(rep.forall(_.getAs[Long]("n_dup_tokens") == 5))
  }

  test("scrub removes exactly the covered tokens, in order") {
    val cov = brute(4)
    val toks = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.toLowerCase.split("\\s+").toSeq).toMap
    val expect = toks.map { case (id, t) =>
      id -> t.zipWithIndex.collect { case (w, i) if !cov(id)(i) => w }.mkString(" ")
    }
    val got = SpanDedup.scrub(docs, 4).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expect)
    assert(got(5L) == "") // fully-boilerplate doc scrubs to empty
    assert(got(3L) == toks(3L).mkString(" ")) // unique doc intact
  }

  test("plan: census is a window over span_hash — no self-join of spans") {
    val plan = SpanDedup.duplicatedSpans(docs, 4)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"span census must not self-join:\n$plan")
    assert(plan.contains("Window"), s"expected window census:\n$plan")
  }
}
