package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec
import graft.lake.Tables

/** As-of join: the union + running-last rewrite must equal the naive
  * range-join formulation (which is the semantic definition but a
  * per-key-quadratic scale-killer), and must plan with NO join node. */
class AsofJoinSpec extends SparkSpec {

  private def sides = {
    val ev = Tables(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id").as("click_id"), unix_millis(col("ts")).as("click_ms"))
    (purchases, clicks)
  }

  test("asofJoin == naive range join + latest-row window") {
    val (purchases, clicks) = sides
    val got = Joins.asofJoin(purchases, clicks, "user_id", "ms",
      Seq("purchase_id", "purchase_value"), Seq("click_id", "click_ms"))
      .select(col("user_id"), col("purchase_id"), col("asof_click_id"))
    val naive = purchases.join(
        clicks.select(col("user_id").as("c_user"), col("click_id"), col("click_ms")),
        col("user_id") === col("c_user") && col("click_ms") <= col("ms"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("purchase_id"))
        .orderBy(col("click_ms").desc, col("click_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("purchase_id"), col("click_id").as("asof_click_id"))
    assert(got.count() > 0)
    assert(got.except(naive).count() == 0 && naive.except(got).count() == 0)
  }

  test("asofJoin plans as one window pass: no join node, one shuffle by key") {
    val (purchases, clicks) = sides
    val p = Joins.asofJoin(purchases, clicks, "user_id", "ms",
      Seq("purchase_id", "purchase_value"), Seq("click_id", "click_ms"))
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Join"), s"as-of should be join-free:\n$p")
    assert(p.contains("Window"), s"expected the running-last window:\n$p")
  }

  test("asofJoin: purchases with no preceding click are dropped; ties at equal ms included") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 5L, 101L), (2L, 10L, 102L))
      .toDF("k", "t", "pid")
    val right = Seq((1L, 7L, 201L), (1L, 10L, 202L), (3L, 1L, 203L))
      .toDF("k", "t", "rid")
    val got = Joins.asofJoin(left, right, "k", "t", Seq("pid"), Seq("rid"))
      .select("pid", "asof_rid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pid 100 at t=10: click 202 at t=10 (tie included) beats 201 at t=7
    // pid 101 at t=5: no click at-or-before -> dropped
    // pid 102 (key 2): no right rows for the key -> dropped
    assert(got == Map(100L -> 202L))
  }
}
