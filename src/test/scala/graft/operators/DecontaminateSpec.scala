package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Benchmark decontamination: planted n-gram overlap is detected, shorter
  * overlap is not, and the corpus side joins broadcast (never shuffled). */
class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  // one benchmark doc; train docs: full 5-gram copy, 4-token overlap
  // (below n), disjoint text
  private val bench = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
  private val train = Seq(
    (10L, "noise words then alpha beta gamma delta epsilon more tail"),
    (11L, "has only alpha beta gamma delta and stops"),
    (12L, "completely different words with no shared phrases at all")).toDF("doc_id", "text")

  test("contaminationReport flags exactly the >=5-gram overlap") {
    val rep = Decontaminate.contaminationReport(train, bench, 5).collect()
    assert(rep.map(_.getLong(0)).toSet == Set(10L))
    val r = rep.head
    assert(r.getAs[Long]("n_shared_grams") == 1 && r.getAs[Long]("n_bench_docs") == 1)
  }

  test("clean drops contaminated docs and keeps the rest intact") {
    val kept = Decontaminate.clean(train, bench, 5)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(11L, 12L))
    // full rows survive (clean is a filter, not a projection)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
  }

  test("plan: benchmark gram set is broadcast; no shuffle of the corpus side before the join") {
    val plan = Decontaminate.contaminationReport(train, bench, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join for the benchmark grams, got:\n$plan")
    // the corpus (left/streamed) subtree prints between the join node and
    // the BroadcastExchange; it must be exchange-free — scan → explode →
    // join with no shuffle. (The bench side may dedup behind its
    // broadcast; it is benchmark-sized.)
    val corpusSide =
      plan.split("BroadcastHashJoin", 2)(1).split("BroadcastExchange", 2)(0)
    assert(!corpusSide.contains("Exchange hashpartitioning"),
      s"corpus side shuffled before join:\n$plan")
  }
}
