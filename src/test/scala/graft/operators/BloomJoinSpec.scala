package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** Bloom-pruned join: exact equivalence with the plain join (false
  * positives die in the join), real map-side pruning, and the degenerate
  * empty-dim edge. */
class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  test("bloomPrunedJoin ≡ plain join on the star schema") {
    val dim = Tables(spark, sfDir, "supplier").filter(col("s_acctbal") > 3000)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val fact = Tables(spark, sfDir, "lineitem")
    val got = Joins.bloomPrunedJoin(fact, dim, "l_suppkey")
      .groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = fact.join(dim, "l_suppkey")
      .groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("the Bloom filter prunes non-matching fact rows before the join") {
    val fact = (1L to 10000L).toDF("k")
    val dim = (1L to 10L).toDF("k")
    val bf = dim.agg(call_function("graft_bloom_agg",
      col("k"), lit(1000000L), lit(10000000L)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val kept = fact.filter(call_function("graft_might_contain", lit(bf), col("k"))).count()
    // all 10 true keys survive; false positives stay far under 1%
    assert(kept >= 10 && kept <= 10 + 100, s"kept $kept of 10000")
    // and the full operator returns exactly the true matches
    assert(Joins.bloomPrunedJoin(fact, dim, "k").count() == 10)
  }

  test("empty dim side yields an empty join, not an NPE") {
    val fact = (1L to 100L).toDF("k")
    val dim = fact.filter(lit(false))
    assert(Joins.bloomPrunedJoin(fact, dim, "k").count() == 0)
  }

  test("might_contain filters on the fact side below the join") {
    val dim = Tables(spark, sfDir, "supplier").filter(col("s_acctbal") > 3000)
      .select(col("s_suppkey").as("l_suppkey"))
    val plan = Joins.bloomPrunedJoin(Tables(spark, sfDir, "lineitem"), dim,
      "l_suppkey").queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }
}
