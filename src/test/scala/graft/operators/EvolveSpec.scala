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
}
