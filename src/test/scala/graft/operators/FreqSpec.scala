package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Tables

/** Heavy-hitters sketch: exactness below eviction, the no-false-negatives
  * guarantee and error bounds under eviction, merge laws, and the basis-
  * point threshold arithmetic. */
class FreqSpec extends SparkSpec {

  import spark.implicits._

  private def serveOne(df: DataFrame, item: String, bp: Int,
      maxMapSize: Int = Sketches.FreqMaxMapSize) =
    Sketches.freqServeCheck(df, item, bp, maxMapSize)

  test("no-eviction regime: reported items equal the exact census") {
    val toks = Tables(spark, sfDir, "documents")
      .select(explode(graft.functions.Text.tokens(col("text"))).as("item"))
    val n = toks.count()
    val threshold = (100L * n + 9999L) / 10000L
    val exact = toks.groupBy(col("item")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reported = serveOne(toks, "item", bp = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reported == exact)
    assert(reported.nonEmpty)
  }

  test("eviction regime: every true heavy hitter is reported within bounds") {
    // 50k-distinct tail + two planted hot items, map size 64 → heavy
    // eviction; Misra-Gries must still report both hot items (no false
    // negatives) with lb <= true <= ub
    val tail = spark.range(0, 50000).select((col("id") % 50000).cast("string").as("item"))
    val hot = spark.range(0, 20000)
      .select(when(col("id") % 2 === 0, "HOT_A").otherwise("HOT_B").as("item"))
    val stream = tail.unionByName(hot) // 70k rows; hot items 10k each ≈ 14%
    val rows = Sketches.freqServeCheck(stream, "item", bp = 500, maxMapSize = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.contains("HOT_A") && rows.contains("HOT_B"), rows.toString)
    // est is within eps*N of true (eps·N = 3.5/64 · 70000 ≈ 3.8k)
    assert(math.abs(rows("HOT_A") - 10000) <= 4000, rows("HOT_A").toString)
    assert(math.abs(rows("HOT_B") - 10000) <= 4000, rows("HOT_B").toString)
  }

  test("freqIngest append ≡ rebuild in the exact regime") {
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_partkey").cast("string").as("pk"))
    val cells = Seq("l_returnflag")
    val old = li.filter(col("l_linestatus") === "F")
    val delta = li.filter(col("l_linestatus") =!= "F")
    def top(artifact: DataFrame) =
      Sketches.freqServe(artifact, cells, bp = 50).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val appended = Sketches.freqIngest(
      Sketches.freqBuild(old, cells, "pk"), delta, cells, "pk")
    assert(top(appended) == top(Sketches.freqBuild(li, cells, "pk")))
  }

  test("basis-point threshold is exact integer arithmetic (tie inclusive)") {
    // stream of 200 rows: item X exactly 2 (= 100bp of 200), others unique
    val stream = spark.range(0, 198).select(concat(lit("u"), col("id")).as("item"))
      .unionByName(Seq("X", "X").toDF("item"))
    val reported = serveOne(stream, "item", bp = 100, maxMapSize = 1024)
      .collect().map(_.getString(0)).toSet
    assert(reported.contains("X")) // ceil(100*200/10000) = 2 → X included
  }

  test("freq functions are reachable from plain SQL") {
    Seq("a", "a", "b").toDF("item").createOrReplaceTempView("freq_items_v")
    val rows = spark.sql(
      """SELECT inline(graft_freq_items(sk, 3000)) FROM
        |  (SELECT graft_freq_agg(item, 64) AS sk FROM freq_items_v)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSet == Set(("a", 2L), ("b", 1L)))
  }
}
