package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Char-trigram LM quality scoring: extraction, additive counts artifact,
  * smoothing math, and the broadcast scoring plan. */
class CharLmSpec extends SparkSpec {

  import spark.implicits._

  test("charTrigrams: sliding character windows, lower-cased, empty below 3 chars") {
    val got = Seq(("AbCd", 1), ("ab", 2), ("", 3)).toDF("text", "id")
      .select(col("id"), CharLm.charTrigrams(col("text")).as("g"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(got(1) == Seq("abc", "bcd"))
    assert(got(2).isEmpty && got(3).isEmpty)
  }

  test("mergeCounts: appending a delta equals rebuilding over the union") {
    val a = Seq("abcd", "abab").toDF("text")
    val b = Seq("bcda").toDF("text")
    val merged = CharLm.mergeCounts(CharLm.trigramCounts(a), b)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rebuilt = CharLm.trigramCounts(a.unionByName(b))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == rebuilt && merged("abc") == 1L)
  }

  test("scoreDocs: exact add-α math on a hand-computed model, unseen mass applied") {
    // train "aaaa" -> grams {aaa: 2}; N=2, V=1; α=0.5
    //   logp(aaa)   = ln(2.5 / (2 + 0.5·2)) = ln(2.5/3)
    //   logp_unseen = ln(0.5 / 3)
    val train = Seq("aaaa").toDF("text")
    val docs = Seq((1L, "aaaa"), (2L, "xyz")).toDF("doc_id", "text")
    val got = CharLm.scoreDocs(docs, CharLm.trigramCounts(train))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val nllSeen   = BigDecimal(-math.log(2.5 / 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nllUnseen = BigDecimal(-math.log(0.5 / 3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((2L, nllSeen)))
    assert(got(2L) == ((1L, nllUnseen)))
    assert(got(1L)._2 < got(2L)._2, "in-domain text must score lower NLL")
  }

  test("perplexityAgainst separates in-domain from off-domain on the corpus") {
    val docs = graft.lake.Tables(spark, sfDir, "documents")
    val scored = CharLm.perplexityAgainst(docs, docs.filter(col("lang") === "en"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val byLang = scored.groupBy("lang").agg(avg("avg_nll").as("nll"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the model's own training slice must be the best-scoring language
    assert(byLang("en") == byLang.values.min,
      s"en should have min mean NLL: $byLang")
    // the scoring join is a broadcast of the charset-bounded model
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
