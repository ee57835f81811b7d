package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** Hash-based stratified sampling + incremental dedup: reproducibility
  * and rate/exclusion semantics. */
class SamplingSpec extends SparkSpec {

  test("stratifiedByHash is deterministic, honors per-stratum rates, keeps default strata whole") {
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("lang"))
    def run() = Sampling.stratifiedByHash(docs, "doc_id", "lang",
      Map("en" -> 30), 100).select("doc_id").collect().map(_.getLong(0)).toSet
    val a = run()
    assert(a == run(), "same input must sample the same rows")
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.stratifiedByHash(docs, "doc_id", "lang", Map("en" -> 30), 100)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are uniform: en keep-rate lands near 30%
    val enRate = kept("en").toDouble / total("en")
    assert(enRate > 0.15 && enRate < 0.45, s"en keep rate $enRate far from 0.30")
    // strata without a configured rate are kept whole
    total.keys.filter(_ != "en").foreach(l => assert(kept(l) == total(l)))
  }

  test("incrementalExactDedup: excludes corpus fingerprints AND in-batch duplicates") {
    import spark.implicits._
    val existing = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "ALPHA   text"),   // dup of corpus doc 1 (normalized) -> dropped
      (11L, "gamma text"),     // new -> survives
      (12L, "gamma  TEXT"),    // in-batch dup of 11 -> folded into min-id 11
      (13L, "delta text")      // new -> survives
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalExactDedup(existing, incoming)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 13L), s"got $got")
  }

  test("exactKByHash: exactly k per stratum, invariant under repartitioning, partial rank cut") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, if (i % 3 == 0) "fr" else "en"))
      .toDF("doc_id", "lang")
    val picked = Sampling.exactKByHash(df, "doc_id", "lang", 10)
    val perLang = picked.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == Map("en" -> 10L, "fr" -> 10L))
    // physical layout must not change the selection
    val reparted = Sampling.exactKByHash(df.repartition(7), "doc_id", "lang", 10)
    assert(picked.select("doc_id").as[Long].collect().toSet
      == reparted.select("doc_id").as[Long].collect().toSet)
    // the rank cut runs as a partial (per-task) group limit before the merge
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("tokenBudgetSelect ≡ naive inclusive-cumsum window, incl. zero-token and tie edges") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // strata exercising every census branch: whole bands kept, a boundary
    // band with in-band id-order cut, quality ties, zero-token rows, and a
    // stratum whose boundary lands EXACTLY on cum_excl == budget (only
    // leading zero-token rows of the band survive)
    val df = Seq(
      (1L, "en", 0.9, 30L), (2L, "en", 0.9, 30L),   // tie band, kept whole
      (3L, "en", 0.5, 30L), (4L, "en", 0.5, 0L),    // boundary: 3 fits, 4 trails a fit
      (5L, "en", 0.5, 40L), (6L, "en", 0.1, 1L),    // 5 overflows, 6 dropped band
      (7L, "fr", 0.8, 100L),                        // exact fill
      (8L, "fr", 0.3, 0L), (9L, "fr", 0.3, 5L),     // cum_excl == budget: zero-token 8 survives
      (10L, "zh", 0.7, 300L)                        // first row overflows alone
    ).toDF("doc_id", "lang", "quality", "n_toks")
    val budget = 100L
    val got = Sampling.tokenBudgetSelect(df, "doc_id", "lang",
      col("quality"), col("n_toks"), budget)
      .select("doc_id").as[Long].collect().toSet
    val naive = df.withColumn("cum", sum(col("n_toks")).over(Window
        .partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= budget)
      .select("doc_id").as[Long].collect().toSet
    assert(naive == Set(1L, 2L, 3L, 4L, 7L, 8L), s"fixture drifted: $naive")
    assert(got == naive, s"got $got, want $naive")
  }

  test("temperatureWeights: alpha=1 is proportional, alpha=0 uniform, weights sum to 1") {
    import spark.implicits._
    // 8 en, 2 fr
    val df = ((1 to 8).map(i => (i.toLong, "en")) ++ Seq((9L, "fr"), (10L, "fr")))
      .toDF("doc_id", "lang")
    def weights(alpha: Double): Map[String, Double] =
      Sampling.temperatureWeights(df, "lang", alpha).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(weights(1.0) == Map("en" -> 0.8, "fr" -> 0.2))
    assert(weights(0.0) == Map("en" -> 0.5, "fr" -> 0.5))
    // 0 < alpha < 1 damps the majority toward uniform, order preserved
    val w = weights(0.7)
    assert(w("en") < 0.8 && w("en") > w("fr") && math.abs(w.values.sum - 1.0) < 1e-6)
  }

  test("weightedKByHash: exact k per stratum, weight-proportional selection, layout-invariant, partial rank cut") {
    import spark.implicits._
    // 50 heavy (w=1000) + 150 light (w=1) rows in one stratum: with k=30,
    // A-Res keys u^(1/w) concentrate near 1 for heavy rows, so the sample
    // must be dominated by them (expected light picks ≈ 30·150/(50·1000+150)
    // ≪ 1 per draw batch; allow a generous margin)
    val df = (1L to 200L).map(i => (i, "en", if (i <= 50) 1000.0 else 1.0))
      .toDF("doc_id", "lang", "w")
    val picked = Sampling.weightedKByHash(df, "doc_id", "lang", col("w"), 30)
    assert(picked.count() == 30)
    val heavy = picked.filter(col("doc_id") <= 50).count()
    assert(heavy >= 25, s"heavy rows won only $heavy of 30 slots")
    // deterministic under physical layout changes
    val reparted = Sampling.weightedKByHash(df.repartition(7), "doc_id", "lang", col("w"), 30)
    assert(picked.select("doc_id").as[Long].collect().toSet
      == reparted.select("doc_id").as[Long].collect().toSet)
    // the per-stratum rank cut stays a partial (per-task) group limit
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("shuffleRank: dense 0..N-1, equals the naive global-sort rank, layout-invariant") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"p$i")).toDF("doc_id", "payload")
    val got = Sampling.shuffleRank(df, "doc_id", bandBits = 4)
      .select("doc_id", "shuffle_rank").as[(Long, Long)].collect().toMap
    // dense permutation
    assert(got.values.toSeq.sorted == (0L until 500L).toSeq)
    // ≡ one global window over (md5, id) — the plan shuffleRank avoids
    val naive = df
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id"))) - 1)
      .select("doc_id", "r").as[(Long, Long)].collect().toMap
    assert(got == naive)
    // physical layout must not change a single rank
    val reparted = Sampling.shuffleRank(df.repartition(7), "doc_id", bandBits = 4)
      .select("doc_id", "shuffle_rank").as[(Long, Long)].collect().toMap
    assert(got == reparted)
    // the corpus-wide rank window partitions by band (hash exchange), so
    // no partition ever holds more than ~N/bands rows; the only
    // SinglePartition exchange is the tiny band-census cumsum
    val plan = Sampling.shuffleRank(df, "doc_id", bandBits = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(band"), plan)
  }

  test("kfoldAssign: folds are id-determined (layout-invariant), bounded, and all occupied") {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"doc$i").toDF("id")
    val a = Sampling.kfoldAssign(df, "id", 5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val b = Sampling.kfoldAssign(df.repartition(7), "id", 5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(a == b)
    assert(a.values.forall(f => f >= 0 && f < 5))
    assert(a.values.toSet.size == 5, "1000 ids should hit every fold")
  }

  test("curriculumShards: integer token-budget cuts, easy docs first, zero-token tail clamped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d e f")
    ).toDF("doc_id", "text") // tokens 1,2,3,6 -> total 12, 3 shards of 4
    val got = Sampling.curriculumShards(docs,
      graft.functions.Text.tokenCount(col("text")), 3)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // cum-before: 0,1,3,6 -> (cum*3)//12 = 0,0,0,1
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1), got.toString)
    // shard is monotone in the (difficulty, id) order
    val rows = Sampling.curriculumShards(docs,
      graft.functions.Text.tokenCount(col("text")), 3)
      .orderBy("difficulty", "doc_id").collect().map(_.getInt(3))
    assert(rows.toSeq == rows.toSeq.sorted)
  }

  test("unimaxAllocation: hand-computed waterfill — head budget-limited, tails epoch-capped") {
    import spark.implicits._
    // per-stratum tokens: a=10, b=20, c=100 (one doc each, n words);
    // epochCap=1 -> capacities 10,20,100; budgetFrac=0.5 -> B=65.
    // ascending: a(10): 10*3=30 < 65 -> capped; b(20): 20*2=40 < 55 ->
    // capped; c: 100 >= 35 -> waterline. alloc: a=10, b=20, c=35.
    val docs = Seq(
      ("a", Seq.fill(10)("w").mkString(" ")),
      ("b", Seq.fill(20)("w").mkString(" ")),
      ("c", Seq.fill(100)("w").mkString(" "))
    ).toDF("lang", "text")
    val got = Sampling.unimaxAllocation(docs, "lang",
      graft.functions.Text.tokenCount(col("text")), 0.5, 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got == Map(
      "a" -> ((10.0, 1.0, true)),
      "b" -> ((20.0, 1.0, true)),
      "c" -> ((35.0, 0.35, false))), got.toString)
    // allocations exhaust the budget exactly when a waterline exists
    assert(got.values.map(_._1).sum == 65.0)
  }

  test("unimaxAllocation edges: all-capped when budget exceeds capacity; uniform when cap never binds") {
    import spark.implicits._
    val docs = Seq(
      ("a", Seq.fill(10)("w").mkString(" ")),
      ("b", Seq.fill(30)("w").mkString(" "))
    ).toDF("lang", "text")
    // epochCap 0.25 -> capacities 2.5, 7.5; budget 0.9*40=36 > 10 total:
    // no waterline, everyone capped at epochCap epochs
    val capped = Sampling.unimaxAllocation(docs, "lang",
      graft.functions.Text.tokenCount(col("text")), 0.9, 0.25)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(capped == Map(
      "a" -> ((2.5, 0.25, true)), "b" -> ((7.5, 0.25, true))), capped.toString)
    // epochCap 100 -> nobody caps: budget splits UNIFORMLY (the UniMax
    // point: tails do not get over-repeated relative head share)
    val uni = Sampling.unimaxAllocation(docs, "lang",
      graft.functions.Text.tokenCount(col("text")), 0.5, 100.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(uni == Map("a" -> 10.0, "b" -> 10.0), uni.toString)
  }
}
