package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.lake.DeltaTable

/** Delta streaming sink: exactly-once batch delivery via the protocol's
  * `txn` action — replays no-op, watermarks survive checkpoint
  * compaction, compaction rewrites don't disturb either the data or the
  * CDC feed. */
class StreamingDeltaSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("sdelta").toString + "/t"

  private def keys(dt: DeltaTable): Seq[Long] =
    dt.read(spark).select("k").collect().map(_.getLong(0)).toSeq.sorted

  test("foreachBatch replay cannot double-append (txn idempotence)") {
    import spark.implicits._
    val root = tmp()
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val b1 = Seq((3L, "c")).toDF("k", "s")
    assert(StreamingDelta.deliver(root, "app", 0L, b0).contains(0L))
    assert(StreamingDelta.deliver(root, "app", 1L, b1).contains(1L))
    // crash-replay: the driver re-delivers batch 1 (at-least-once) — no-op
    assert(StreamingDelta.deliver(root, "app", 1L, b1).isEmpty)
    assert(StreamingDelta.deliver(root, "app", 0L, b0).isEmpty)
    assert(keys(DeltaTable(root)) == Seq(1L, 2L, 3L))
    // a DIFFERENT writer lineage is not blocked by this app's watermark
    assert(StreamingDelta.deliver(root, "other", 0L, Seq((9L, "z")).toDF("k", "s")).isDefined)
    assert(keys(DeltaTable(root)) == Seq(1L, 2L, 3L, 9L))
  }

  test("txn watermark survives checkpoint compaction of the log") {
    import spark.implicits._
    val root = tmp()
    StreamingDelta.deliver(root, "app", 0L, Seq((1L, "a")).toDF("k", "s"))
    StreamingDelta.deliver(root, "app", 1L, Seq((2L, "b")).toDF("k", "s"))
    val dt = DeltaTable(root)
    dt.checkpoint() // replay now starts AFTER the txn-carrying commits
    assert(dt.txnVersion("app").contains(1L))
    assert(StreamingDelta.deliver(root, "app", 1L, Seq((2L, "b")).toDF("k", "s")).isEmpty)
    assert(StreamingDelta.deliver(root, "app", 2L, Seq((3L, "c")).toDF("k", "s")).contains(2L))
    assert(keys(dt) == Seq(1L, 2L, 3L))
  }

  test("end-to-end MemoryStream run delivers each batch once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = tmp()
    val mem = MemoryStream[(Long, String)]
    val q = StreamingDelta.sink(mem.toDF().toDF("k", "s"), root, "pipe")
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(keys(DeltaTable(root)) == Seq(1L, 2L, 3L))
  }

  test("periodic compaction folds micro-batch files; data and CDC unchanged") {
    import spark.implicits._
    val root = tmp()
    val dt = DeltaTable(root)
    (0 until 4).foreach(i =>
      StreamingDelta.deliver(root, "app", i.toLong,
        Seq((i.toLong, s"v$i")).toDF("k", "s")))
    val before = dt.read(spark).inputFiles.length
    val cv = dt.compact()
    assert(dt.read(spark).inputFiles.length < before)
    assert(keys(dt) == Seq(0L, 1L, 2L, 3L))
    // the OPTIMIZE commit is dataChange=false: CDC over it is EMPTY
    assert(dt.changes(spark, cv - 1, cv).count() == 0L)
    // while the append commits still feed CDC as inserts
    val feed = dt.changes(spark, 0L, cv)
    assert(feed.filter("_change_type = 'insert'").count() == 3L) // v1..v3 adds
    // appends after compaction keep working, idempotence intact
    assert(StreamingDelta.deliver(root, "app", 3L, Seq((99L, "x")).toDF("k", "s")).isEmpty)
    assert(StreamingDelta.deliver(root, "app", 4L, Seq((4L, "v4")).toDF("k", "s")).isDefined)
    assert(keys(dt) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("vacuum reclaims pre-compaction files; retained snapshots still read") {
    import spark.implicits._
    val root = tmp()
    val dt = DeltaTable(root)
    (0 until 3).foreach(i =>
      StreamingDelta.deliver(root, "app", i.toLong,
        Seq((i.toLong, s"v$i")).toDF("k", "s")))
    dt.compact()
    // default retention keeps just-written files (in-flight-commit guard)
    assert(dt.vacuum(keepVersions = 1) == 0)
    val deleted = dt.vacuum(keepVersions = 1, retentionMs = 0L)
    assert(deleted >= 3) // the three micro-batch files are unreferenced now
    assert(keys(dt) == Seq(0L, 1L, 2L))
  }

  test("relay: Delta source -> transform -> Delta sink is incremental, exactly-once, replay-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val srcRoot = tmp()
    val snkRoot = tmp()
    val src = DeltaTable(srcRoot)
    def xform(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("k") % 2 === 0)

    src.append(Seq((0L, "a"), (1L, "b")).toDF("k", "s"))
    // pull 1: folds source v0 only
    assert(StreamingDelta.relay(spark, srcRoot, snkRoot, "c1")(xform)
      .contains(0L))
    assert(keys(DeltaTable(snkRoot)) == Seq(0L))
    src.append(Seq((2L, "c")).toDF("k", "s"))
    src.append(Seq((3L, "d"), (4L, "e")).toDF("k", "s"))
    // maintenance on the source is invisible to the feed
    src.compact()
    // pull 2: folds v1..v3 (the compact contributes nothing)
    assert(StreamingDelta.relay(spark, srcRoot, snkRoot, "c1")(xform).isDefined)
    // streamed ≡ batch: the sink equals the transform of the full source
    assert(keys(DeltaTable(snkRoot)) == Seq(0L, 2L, 4L))
    // caught up: nothing new -> no-op, sink untouched
    assert(StreamingDelta.relay(spark, srcRoot, snkRoot, "c1")(xform).isEmpty)
    assert(keys(DeltaTable(snkRoot)) == Seq(0L, 2L, 4L))
    // a second consumer has its own mark and re-reads from scratch
    val snk2 = tmp()
    assert(StreamingDelta.relay(spark, srcRoot, snk2, "c2")(xform).isDefined)
    assert(keys(DeltaTable(snk2)) == Seq(0L, 2L, 4L))
    // CDC mode surfaces change metadata to the transform
    val snk3 = tmp()
    StreamingDelta.relay(spark, srcRoot, snk3, "c3", cdc = true)(feed =>
      feed.where(col("_change_type") === "insert")
        .drop("_change_type", "_commit_version"))
    assert(keys(DeltaTable(snk3)) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("relay bounded pulls: an N-commit backlog drains over ceil(N/cap) pulls, exactly-once intact") {
    import spark.implicits._
    val srcRoot = tmp()
    val snkRoot = tmp()
    val src = DeltaTable(srcRoot)
    // 6-commit backlog, one single-file append each (a long-idle
    // consumer's worst case)
    (0L until 6L).foreach(k =>
      src.append(Seq((k, s"v$k")).toDF("k", "s").coalesce(1)))
    def pull(): Option[Long] =
      StreamingDelta.relay(spark, srcRoot, snkRoot, "cb",
        maxFilesPerPull = 2)(identity)
    // pull 1 folds commits v0..v1 (2 files), watermark lands at v1
    assert(pull().isDefined)
    assert(keys(DeltaTable(snkRoot)) == Seq(0L, 1L))
    assert(DeltaTable(snkRoot).txnVersion("cb").contains(1L))
    // pulls 2 and 3 drain the rest — ceil(6/2) = 3 total
    assert(pull().isDefined)
    assert(keys(DeltaTable(snkRoot)) == Seq(0L, 1L, 2L, 3L))
    assert(pull().isDefined)
    assert(keys(DeltaTable(snkRoot)) == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    // caught up: no-op; nothing double-applied anywhere
    assert(pull().isEmpty)
    assert(keys(DeltaTable(snkRoot)) == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    // an OVERSIZED first commit still rides alone (progress guarantee):
    // one 4-file commit exceeds the 2-file cap but drains in one pull
    src.append((10L to 13L).map(k => (k, s"v$k")).toDF("k", "s")
      .repartition(4))
    assert(pull().isDefined)
    assert(keys(DeltaTable(snkRoot)) ==
      Seq(0L, 1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 13L))
    // byte cap: three more commits, a tiny byte budget → one commit per
    // pull (first-always), two pulls to drain two of them
    (20L until 22L).foreach(k =>
      src.append(Seq((k, s"v$k")).toDF("k", "s").coalesce(1)))
    def bytePull(): Option[Long] =
      StreamingDelta.relay(spark, srcRoot, snkRoot, "cb",
        maxBytesPerPull = 1L)(identity)
    assert(bytePull().isDefined)
    assert(keys(DeltaTable(snkRoot)).count(_ >= 20L) == 1)
    assert(bytePull().isDefined)
    assert(keys(DeltaTable(snkRoot)).count(_ >= 20L) == 2)
    assert(bytePull().isEmpty)
  }
}
