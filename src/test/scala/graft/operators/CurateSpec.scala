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

  test("sourceReputation / gateBySource: below-mean source dropped whole, gate is a broadcast semi join") {
    import spark.implicits._
    // srcA scores (1,1), srcB (0,0), srcC (1,0): corpus mean 0.5 —
    // srcB (mean 0) falls under the bar, srcA and srcC stay
    val docs = Seq(
      (1L, "srcA", 1.0), (2L, "srcA", 1.0),
      (3L, "srcB", 0.0), (4L, "srcB", 0.0),
      (5L, "srcC", 1.0), (6L, "srcC", 0.0)).toDF("doc_id", "source", "s")
    val rep = Curate.sourceReputation(docs, col("s")).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(rep == Map("srcA" -> true, "srcB" -> false, "srcC" -> true))
    val kept = Curate.gateBySource(docs, col("s"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L, 6L))
    // the kept-source list joins broadcast — the corpus side reaches the
    // semi join without an exchange
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    val corpusSide = plan.split("BroadcastHashJoin", 2)(1).split("BroadcastExchange", 2)(0)
    assert(!corpusSide.contains("Exchange hashpartitioning"),
      s"corpus shuffled before the source gate:\n$plan")
  }

  test("gopher rules: each rule fires on its planted violation; clean doc passes") {
    import spark.implicits._
    val clean = (1 to 60).map(i => s"the quick brown fox of item$i").mkString(" ")
    val docs = Seq(
      1L -> clean,                                     // passes all rules
      2L -> "the short one of and that",               // < 50 words
      3L -> ((1 to 60).map(_ => "## ###").mkString(" ") + " the of and that be"), // symbol ratio
      4L -> (1 to 60).map(i => s"- the bullet of line $i\n").mkString, // bullet lines
      5L -> ((1 to 60).map(i => s"a$i 99 __x").mkString(" ") + " zz")  // no stopwords + low alpha
    ).toDF("doc_id", "text")
    val got = Curate.gopherRules(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("passes"), s"clean doc failed: ${got(1L)}")
    assert(!got(2L).getAs[Boolean]("passes") && got(2L).getAs[Long]("n_words") < 50)
    assert(!got(3L).getAs[Boolean]("passes") &&
      got(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!got(4L).getAs[Boolean]("passes") &&
      got(4L).getAs[Double]("bullet_ratio") > 0.9)
    assert(!got(5L).getAs[Boolean]("passes") &&
      got(5L).getAs[Long]("stopword_hits") < 2)
    // map-side only: the report plans without any exchange
    val plan = Curate.gopherRules(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopher rules must not shuffle:\n$plan")
  }

  test("sourceAblation: removing the heavy source moves the mean down by the exact hand-computed delta; single-source corpus yields null") {
    import spark.implicits._
    // source a: docs of 10 tokens x2; source b: 4 tokens x2
    // full mean = (20+8)/4 = 7; without a = 4.0 (delta -3), without b = 10.0 (delta +3)
    val docs = Seq(
      ("a", "w w w w w w w w w w"), ("a", "w w w w w w w w w w"),
      ("b", "w w w w"), ("b", "w w w w")
    ).toDF("source", "text")
    val got = Curate.sourceAblation(docs, graft.functions.Text.tokenCount(col("text")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("a") == ((2L, 7.0, 4.0, -3.0)), got.toString)
    assert(got("b") == ((2L, 7.0, 10.0, 3.0)), got.toString)
    val solo = Seq(("only", "w w")).toDF("source", "text")
    val r = Curate.sourceAblation(solo, graft.functions.Text.tokenCount(col("text"))).collect()(0)
    assert(r.isNullAt(3) && r.isNullAt(4), r.toString)
  }

  test("quantileNormalize: groups land on identical pooled marginals; singleton maps to pooled median") {
    import spark.implicits._
    // g1 {2,4,6}, g2 {10,20,30}: pooled sorted (2,4,6,10,20,30); each
    // group's ranks 1..3 map to pooled positions 1, 3, 6 -> {2, 6, 30}
    val df = Seq(("g1", 1L, 2L), ("g1", 2L, 4L), ("g1", 3L, 6L),
      ("g2", 4L, 10L), ("g2", 5L, 20L), ("g2", 6L, 30L))
      .toDF("src", "id", "v")
    val got = Curate.quantileNormalize(df, "src", "v", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 2L, 2L -> 6L, 3L -> 30L,
      4L -> 2L, 5L -> 6L, 6L -> 30L), got.toString)
    // post-normalization the two marginals are IDENTICAL multisets
    val bySrc = Curate.quantileNormalize(df, "src", "v", "id").collect()
      .groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(3)).sorted.toSeq).toMap
    assert(bySrc("g1") == bySrc("g2"))
    // a singleton group maps to the pooled median position
    val withSolo = df.unionByName(Seq(("g3", 7L, 7L)).toDF("src", "id", "v"))
    // N = 7: idx = 1 + 3 = 4 -> pooled sorted (2,4,6,7,10,20,30)(4) = 7
    val solo = Curate.quantileNormalize(withSolo, "src", "v", "id")
      .filter(col("id") === 7L).collect()(0)
    assert(solo.getLong(3) == 7L, solo.toString)
    // ties: census ranges, deterministic rank tie-break by id
    val ties = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("b", 3L, 5L), ("b", 4L, 9L))
      .toDF("src", "id", "v")
    val t = Curate.quantileNormalize(ties, "src", "v", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // N=4, census 5->[1,3], 9->[4,4]; rank1 -> idx1 = 5, rank2 -> idx4 = 9
    assert(t == Map(1L -> 5L, 2L -> 9L, 3L -> 5L, 4L -> 9L), t.toString)
  }

  test("quantileNormalize: UNEQUAL group sizes map onto the pooled reference but marginals differ element-wise (documented floor-index trade)") {
    import spark.implicits._
    // g1 has 4 members, g2 has 2: pooled sorted (1,2,3,4,10,20), N=6.
    // g1 ranks 1..4 -> idx 1 + (r-1)*5 div 3 = 1,2,4,6 -> {1,2,4,20}
    // g2 ranks 1..2 -> idx 1 + (r-1)*5 div 1 = 1,6   -> {1,20}
    val df = Seq(("g1", 1L, 1L), ("g1", 2L, 2L), ("g1", 3L, 3L),
      ("g1", 4L, 4L), ("g2", 5L, 10L), ("g2", 6L, 20L))
      .toDF("src", "id", "v")
    val bySrc = Curate.quantileNormalize(df, "src", "v", "id").collect()
      .groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(3)).sorted.toSeq).toMap
    assert(bySrc("g1") == Seq(1L, 2L, 4L, 20L), bySrc.toString)
    assert(bySrc("g2") == Seq(1L, 20L), bySrc.toString)
    // both groups share the pooled min/max anchors; the interiors sample
    // the pooled grid at different positions — NOT identical marginals
    assert(bySrc("g1").toSet != bySrc("g2").toSet)
    assert(bySrc.values.forall(s => s.head == 1L && s.last == 20L))
  }
}
