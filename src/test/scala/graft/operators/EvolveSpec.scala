package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SCD2 merge and snapshot diff: version bookkeeping on a hand fixture
  * where every path (change, no-op, new key, absent key, closed history)
  * is planted. */
class EvolveSpec extends SparkSpec {

  private val attrs = Seq("name", "seg")

  test("scd2Merge: change closes+reopens, no-op passes, new key opens, absent key untouched, closed history untouched") {
    import spark.implicits._
    val jan = lit("2024-01-01").cast("timestamp")
    val jun = lit("2024-06-01").cast("timestamp")
    val current = Seq(
      // closed history row for key 1 (must pass through verbatim)
      (1L, "a-old", "X", "2023-06-01", Some("2024-01-01")),
      (1L, "a", "X", "2024-01-01", None),   // live, updated with a CHANGE
      (2L, "b", "Y", "2024-01-01", None),   // live, update identical -> no-op
      (3L, "c", "Z", "2024-01-01", None)    // live, absent from batch
    ).toDF("k", "name", "seg", "vf", "vt")
      .select(col("k"), col("name"), col("seg"),
        col("vf").cast("timestamp").as("valid_from"),
        col("vt").cast("timestamp").as("valid_to"))
    val updates = Seq(
      (1L, "a2", "X"),  // changed name
      (2L, "b", "Y"),   // identical
      (9L, "new", "N")  // brand-new key
    ).toDF("k", "name", "seg")

    val got = Evolve.scd2Merge(current, updates, "k", attrs, jun)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getTimestamp(3).toString.take(10),
        Option(r.getTimestamp(4)).map(_.toString.take(10)))).toSet
    assert(got == Set(
      (1L, "a-old", "X", "2023-06-01", Some("2024-01-01")), // history intact
      (1L, "a", "X", "2024-01-01", Some("2024-06-01")),     // closed
      (1L, "a2", "X", "2024-06-01", None),                  // reopened
      (2L, "b", "Y", "2024-01-01", None),                   // no-op
      (3L, "c", "Z", "2024-01-01", None),                   // absent key
      (9L, "new", "N", "2024-06-01", None)                  // new key
    ), got.mkString("; "))
    // invariant: exactly one live row per surviving key
    val live = Evolve.scd2Merge(current, updates, "k", attrs, jun)
      .filter(col("valid_to").isNull).groupBy("k").count()
      .filter(col("count") > 1)
    assert(live.isEmpty, "a key has two live rows")
  }

  test("scd2Lookup: facts resolve the version valid at their time; pre-history and unknown keys resolve null; exactly one match") {
    import spark.implicits._
    val dim = Seq(
      (1L, "v1", "2024-01-01", Some("2024-06-01")),
      (1L, "v2", "2024-06-01", None),
      (2L, "only", "2024-03-01", None)
    ).toDF("k", "ver", "vf", "vt")
      .select(col("k"), col("ver"), col("vf").cast("timestamp").as("valid_from"),
        col("vt").cast("timestamp").as("valid_to"))
    val fact = Seq(
      (10L, 1L, "2024-02-15"),  // inside v1
      (11L, 1L, "2024-06-01"),  // boundary: valid_from inclusive -> v2
      (12L, 1L, "2024-09-01"),  // inside v2 (open)
      (13L, 1L, "2023-01-01"),  // before any version -> null
      (14L, 2L, "2024-04-01"),  // key 2's only version
      (15L, 9L, "2024-04-01")   // unknown key -> null
    ).toDF("fid", "k", "ft")
      .select(col("fid"), col("k"), col("ft").cast("timestamp").as("ft"))
    val got = Evolve.scd2Lookup(fact, dim, "k", "ft")
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got == Map(10L -> Some("v1"), 11L -> Some("v2"), 12L -> Some("v2"),
      13L -> None, 14L -> Some("only"), 15L -> None), got.toString)
    // versions partition time: the join never duplicates a fact row
    assert(Evolve.scd2Lookup(fact, dim, "k", "ft").count() == fact.count())
  }

  test("snapshotDiff: every status classified; null attrs compare null-safe") {
    import spark.implicits._
    val before = Seq((1L, "a", "X"), (2L, "b", "Y"), (3L, null, "Z"))
      .toDF("k", "name", "seg")
    val after = Seq((1L, "a", "X"), (2L, "b2", "Y"), (4L, "d", "W"),
      (3L, null, "Z")).toDF("k", "name", "seg")
    val got = Evolve.snapshotDiff(before, after, "k", attrs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "same", 2L -> "changed", 3L -> "same",
      4L -> "added"), got.toString)
    val gotRm = Evolve.snapshotDiff(after, before, "k", attrs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotRm(4L) == "removed")
  }

  test("mergeUpsert: update/delete/insert/pass-through exact; both legs broadcast (no sort-merge join)") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("k", "v")
    val batch = Seq((2L, false, "B2"), (3L, true, "c"), (9L, false, "i"),
      (7L, true, "ghost")) // a deleted row for an absent key is a no-op
      .toDF("k", "deleted", "v")
    val got = Evolve.mergeUpsert(target, batch, "k")
    assert(got.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      == Map(1L -> "a", 2L -> "B2", 4L -> "d", 5L -> "e", 9L -> "i"))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("forgetCensus: the cascade counts reach orders via custkey and lineitem via the orderkey relay") {
    import spark.implicits._
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(10L, 11L, 11L, 12L, 13L, 13L).toDF("l_orderkey")
    val got = Evolve.forgetCensus(customer, orders, lineitem,
        col("c_custkey") === 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // customer 2 → orders 11, 12 → lineitems 11, 11, 12
    assert(got("customer") == ((1L, 2L)), got.toString)
    assert(got("orders") == ((2L, 2L)))
    assert(got("lineitem") == ((3L, 3L)))
  }
}
