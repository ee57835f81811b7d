package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE merge learning: the Sennrich reference example hand-computed as a
  * golden, greedy merge-application semantics, and determinism. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // the classic corpus: low×5 lower×2 newest×6 widest×3 (no </w> marker)
  private lazy val words = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "n")

  test("learnMerges reproduces the hand-computed merge sequence with lexicographic ties") {
    // round 1: es=9 st=9 tie -> (e,s); round 2: (es,t)=9; round 3: lo=7 ow=7 tie -> (l,o)
    val got = Bpe.learnMerges(words, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L)))
  }

  test("learnMerges stops when no pairs remain") {
    val tiny = Seq(("ab", 3L)).toDF("word", "n")
    val got = Bpe.learnMerges(tiny, 5).collect()
    assert(got.length == 1 && got(0).getString(3) == "ab")
  }

  test("segment applies merges greedily left-to-right, non-overlapping") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val got = Seq("Lowest newest", "aaaa").toDF("text")
      .select(Bpe.segment(col("text"), merges).as("t"))
      .collect().map(_.getSeq[Seq[String]](0))
    assert(got(0) == Seq(Seq("lo", "w", "est"), Seq("n", "e", "w", "est")))
    // (a,a) not in merges: untouched chars
    assert(got(1) == Seq(Seq("a", "a", "a", "a")))
    val aa = Seq("aaaa aaa").toDF("text")
      .select(Bpe.segment(col("text"), Seq(("a", "a"))).as("t"))
      .collect()(0).getSeq[Seq[String]](0)
    // greedy non-overlapping: aaaa -> [aa, aa]; aaa -> [aa, a]
    assert(aa == Seq(Seq("aa", "aa"), Seq("aa", "a")))
  }

  test("wordCounts cap is deterministic; census on corpus matches recount") {
    val docs = graft.lake.Tables(spark, sfDir, "documents")
    val a = Bpe.charPairCensus(docs, 20).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Bpe.charPairCensus(docs, 20).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b && a.nonEmpty && a.values.forall(_ >= 20))
  }
}
