package graft.lake

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Evolve

/** Transactional table protocol: snapshot isolation for concurrent
  * readers, crash safety of the two-step WRITE→PUBLISH commit, re-run
  * convergence, append/overwrite/time-travel semantics, vacuum. */
class TxLakeSpec extends SparkSpec {

  private def tmpTable(): TxTable =
    TxTable(Files.createTempDirectory("txlake").toString + "/t")

  private def vals(df: org.apache.spark.sql.DataFrame): Set[(Int, String)] =
    df.collect().map(r => (r.getInt(0), r.getString(1))).toSet

  test("overwrite commits versions; time travel reads any retained snapshot") {
    import spark.implicits._
    val t = tmpTable()
    assert(t.latestVersion.isEmpty)
    val v1 = t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "s"))
    val v2 = t.overwrite(Seq((3, "c")).toDF("k", "s"))
    assert((v1, v2) == ((1L, 2L)) && t.latestVersion.contains(2L))
    assert(vals(t.read(spark)) == Set((3, "c")))
    assert(vals(t.read(spark, Some(1L))) == Set((1, "a"), (2, "b")))
  }

  test("append extends the snapshot; old files are never rewritten") {
    import spark.implicits._
    val t = tmpTable()
    t.overwrite(Seq((1, "a")).toDF("k", "s"))
    val before = t.filesAt(1L)
    t.append(Seq((2, "b")).toDF("k", "s"))
    assert(vals(t.read(spark)) == Set((1, "a"), (2, "b")))
    // v2's manifest carries v1's files forward untouched
    assert(t.filesAt(2L).toSet.intersect(before.toSet) == before.toSet)
  }

  test("snapshot isolation: a reader pinned before an overwrite still sees its version") {
    import spark.implicits._
    val t = tmpTable()
    t.overwrite(Seq((1, "old")).toDF("k", "s"))
    val pinned = t.read(spark) // resolves v1's immutable file list
    t.overwrite(Seq((2, "new")).toDF("k", "s"))
    assert(vals(pinned) == Set((1, "old")), "reader saw a concurrent write")
    assert(vals(t.read(spark)) == Set((2, "new")))
  }

  test("crash between WRITE and PUBLISH is invisible; re-run converges; vacuum reclaims orphans") {
    import spark.implicits._
    val t = tmpTable()
    t.overwrite(Seq((1, "live")).toDF("k", "s"))
    // simulate a writer dying after landing data files, before publishing
    val orphans = t.writeData(Seq((9, "dead")).toDF("k", "s"), v = 2L)
    assert(orphans.nonEmpty)
    assert(t.latestVersion.contains(1L), "unpublished write changed the version")
    assert(vals(t.read(spark)) == Set((1, "live")), "orphan files leaked into a read")
    // re-run of the same logical commit converges on a good new version
    val v2 = t.overwrite(Seq((9, "dead")).toDF("k", "s"))
    assert(v2 == 2L && vals(t.read(spark)) == Set((9, "dead")))
    // vacuum drops the crashed attempt's orphans and v1's now-unreferenced file
    val dropped = t.vacuum(keepVersions = 1)
    assert(dropped >= orphans.size, s"vacuum removed $dropped")
    assert(vals(t.read(spark)) == Set((9, "dead")), "vacuum touched live files")
  }

  test("publish is atomic create-if-absent: racing to the same version fails loudly") {
    import spark.implicits._
    val t = tmpTable()
    t.overwrite(Seq((1, "a")).toDF("k", "s"))
    val e = intercept[IllegalStateException] {
      t.publish(1L, Seq("phantom.parquet"))
    }
    assert(e.getMessage.contains("concurrent commit"))
    // the loser's temp manifest is cleaned up, the winner's intact
    assert(vals(t.read(spark)) == Set((1, "a")))
  }

  test("changes: appends yield exact row-level inserts per commit; overwrite reports churn") {
    import spark.implicits._
    val t = tmpTable()
    t.overwrite(Seq((1, "a")).toDF("k", "s"))              // v1
    t.append(Seq((2, "b")).toDF("k", "s"))                 // v2
    t.append(Seq((3, "c")).toDF("k", "s"))                 // v3
    val feed = t.changes(spark, 1L, 3L)
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.getAs[String]("_change_type"), r.getAs[Long]("_commit_version"))).toSet
    assert(feed == Set((2, "b", "insert", 2L), (3, "c", "insert", 3L)),
      s"append-only CDC feed wrong: $feed")
    // an overwrite reports the outgoing snapshot as deletes, incoming as inserts
    t.overwrite(Seq((9, "z")).toDF("k", "s"))              // v4
    val churn = t.changes(spark, 3L, 4L)
      .collect().map(r => (r.getInt(0), r.getAs[String]("_change_type"))).toSet
    assert(churn == Set((9, "insert"), (1, "delete"), (2, "delete"), (3, "delete")))
    // a same-version range is an empty feed with the CDC schema
    val empty = t.changes(spark, 4L, 4L)
    assert(empty.isEmpty && empty.columns.contains("_change_type"))
  }

  test("MERGE/SCD2 ride the transactional table: read-modify-overwrite is crash-safe") {
    import spark.implicits._
    val t = tmpTable()
    t.overwrite(Seq((1, "init"), (2, "keep")).toDF("k", "s"))
    val source = Seq((1, "patched", false), (3, "inserted", false))
      .toDF("k", "s", "deleted")
    val merged = Evolve.mergeUpsert(t.read(spark), source, "k")
    t.overwrite(merged)
    assert(vals(t.read(spark)) ==
      Set((1, "patched"), (2, "keep"), (3, "inserted")))
    // the pre-merge snapshot is still time-travelable
    assert(vals(t.read(spark, Some(1L))) == Set((1, "init"), (2, "keep")))
  }
}
