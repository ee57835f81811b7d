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
}
