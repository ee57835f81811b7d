package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Segment-pigeonhole edit-distance join: completeness vs brute force
  * (the property the candidate scheme must never lose), degenerate-length
  * edges, and the documented hot-bucket recall cap. */
class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  private def brute(vals: Seq[String], k: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val distinct = vals.distinct
    (for {
      a <- distinct; b <- distinct if a < b
      dist = lev(a, b) if dist <= k
    } yield (a, b, dist)).toSet
  }

  private def run(vals: Seq[String], k: Int,
      maxBucket: Int = FuzzyJoin.MaxSegBucket): Set[(String, String, Int)] =
    FuzzyJoin.editDistancePairs(vals.toDF("s"), "s", k, maxBucket)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("complete vs brute force for k=1 and k=2 on mixed-length, mixed-edit data") {
    // substitutions, insertions, deletions, transposed-ish, unicode,
    // length-boundary strings, and far-apart decoys
    val vals = Seq(
      "red widget", "red widgot", "red widgets", "rd widget", "red wdgets",
      "blue bolt", "blue boat", "glue bolt", "bluebolt", "blue bolts",
      "小红部件", "小紅部件", "小红部件x",
      "ab", "ac", "a", "", "b", "abc", "abcd",
      "totally different string", "warm gear", "hot gear", "hot dear")
    for (k <- Seq(1, 2))
      assert(run(vals, k) == brute(vals, k), s"k=$k mismatch")
  }

  test("complete on adversarial shared-prefix keys (every segment bucket hot but uncapped)") {
    val vals = (0 until 60).map(i => f"Customer#$i%09d")
    assert(run(vals, 2) == brute(vals, 2))
  }

  test("maxBucket caps candidates: output ⊆ true pairs, and loss only from capped segments") {
    val vals = (0 until 60).map(i => f"Customer#$i%09d")
    val capped = run(vals, 2, maxBucket = 4)
    val full = brute(vals, 2)
    assert(capped.subsetOf(full))
    // verify still exact on whatever survives
    capped.foreach { case (a, b, d) => assert(full.contains((a, b, d))) }
  }

  test("setSimilarityPairs: LOSSLESS vs brute-force threshold join on the real table") {
    import spark.implicits._
    import graft.lake.Tables
    import graft.functions.Text
    val docs = Tables(spark, sfDir, "documents")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val got = FuzzyJoin.setSimilarityPairs(docs, 0.5).collect().map(key).toSet
    // brute force: the full cross product, no prefix filter
    val sets = Dedup.shingleSetRelation(docs)
    val brute = sets.as("a").join(sets.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double"))
      .withColumn("j",
        col("inter") / (size(col("a.sh")) + size(col("b.sh")) - col("inter")))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"), round(col("j"), 4))
      .collect().map(key).toSet
    assert(got == brute, s"prefix-filtered ${got.size} != brute ${brute.size}")
    assert(got.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("setSimilarityPairs: planted near-identical pair found at its exact Jaccard; prefix join prunes") {
    import spark.implicits._
    // docs 1/2 share all but one shingle; doc 3 disjoint
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val got = FuzzyJoin.setSimilarityPairs(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 6 shingles per doc, 5 shared -> J = 5/7 ≈ 0.7143; (1,3)/(2,3) disjoint
    assert(got.toSeq == Seq((1L, 2L, 0.7143)), got.mkString(","))
  }

  test("setSimilarityPairs: saturation guard refuses a mass-duplicated corpus loudly; normal corpus unaffected") {
    import spark.implicits._
    // mass duplication: 60 verbatim copies of each of two templates —
    // every prefix shingle's bucket holds 60 docs, raw candidate mass
    // ~ prefix·C(60,2) per template, far above 10 pairs/doc
    val spam = (0 until 120).map(i =>
      (i.toLong, if (i % 2 == 0) "the quick brown fox jumps over the lazy dog"
                 else "lorem ipsum dolor sit amet consectetur adipiscing elit"))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalStateException](
      FuzzyJoin.setSimilarityPairs(spam, 0.5, maxCandidatesPerDoc = 10L).count())
    assert(ex.getMessage.contains("saturation")
      && ex.getMessage.contains("containmentLshPairs"),
      s"guard message must name the prescribed tiers: ${ex.getMessage}")
    // the same corpus with the quadratic stage EXPLICITLY accepted still
    // produces the exact answer (the guard gates, never alters)
    val accepted = FuzzyJoin.setSimilarityPairs(spam, 0.5,
      maxCandidatesPerDoc = Long.MaxValue / 1024)
    assert(accepted.count() == 2L * 60 * 59 / 2)
    // distinct docs under the DEFAULT bound pass untouched
    val normal = (0 until 40).map(i =>
      (i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
      .toDF("doc_id", "text")
    assert(FuzzyJoin.setSimilarityPairs(normal, 0.5).count() == 0)
  }

  test("groupOverlap: pairwise set Jaccard between group shingle vocabularies; zero-overlap pairs absent; repeats deduped") {
    import spark.implicits._
    val docs = Seq(
      ("A", "a b c d"),       // {a b c, b c d}
      ("B", "a b c x"),       // {a b c, b c x}
      ("C", "z z z z"),       // {z z z} — repeated shingle dedups to one
      ("C", "z z z")          // same shingle again, same group
    ).toDF("source", "text")
    val got = FuzzyJoin.groupOverlap(docs, "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(("A", "B", 1L, 2L, 2L,
      math.rint(1.0 / 3 * 1e6) / 1e6)), got.mkString(","))
  }

  test("deletionNeighborhoodPairs ≡ brute force lev-1, including on the shared-prefix keys that cap PassJoin") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // ID-like shared-prefix names (the PassJoin killer) + indel shapes
    val names = (1 to 60).map(i => f"Customer#$i%09d") ++
      Seq("Customer#00000001", "abc", "abcd", "axc", "xyz")
    val brute = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    val got = FuzzyJoin.deletionNeighborhoodPairs(names.toDF("s"), "s")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == brute, s"got ${got.size} vs brute ${brute.size}")
    assert(brute.nonEmpty)
  }
}
