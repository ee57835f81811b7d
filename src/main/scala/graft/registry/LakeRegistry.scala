package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.{DeltaTable, Tables}

/** Registry slice — open-format table interop: the Delta Lake
  * transaction log ([[graft.lake.DeltaTable]]). Each query exercises a
  * protocol path end-to-end (write → log replay → read → aggregate);
  * the aggregate is over a LOSSLESS roundtrip, so the oracle is the
  * same aggregate on the source table — any log-replay bug (missed
  * remove, wrong partition value, checkpoint drift) surfaces as a
  * row/hash mismatch, exactly the q_orc_roundtrip convention. */
object LakeRegistry {

  // Tables.raw (not the spread form): every consumer below is a FIXTURE
  // BUILDER whose write-side file census is part of the fixture contract —
  // a parallelism-dependent input partitioning would turn each 5000-row
  // overwrite into 32 tiny files (slower fixture builds, layout-dependent
  // file counts); builders that need a specific layout repartition
  // explicitly.
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.raw(s, d, "documents").select(col("doc_id"), col("source"),
      col("lang"), col("n_chars"))

  private def tmpRoot(s: SparkSession, d: String, q: String): String =
    s"target/tmp/${q}_${s.sparkContext.applicationId}_${new java.io.File(d).getName}"

  /** Recursively remove prior runs' `target/tmp/{prefix}*` roots. The
    * UUID-suffixed fixtures (clone destinations, foreign v0 logs) need a
    * virgin directory per run, so they can't reuse a fixed root in-place —
    * without this sweep repeated bench runs accumulate unbounded table
    * copies on disk. Scoped to STALE roots only: a directory belonging to
    * this application, or one modified within the last 30 minutes (a
    * concurrent run's live fixture), is never touched — deleting a live
    * UUID root mid-query would fail that run's read. */
  private def wipeStale(prefix: String): Unit = {
    val tmp = new java.io.File("target/tmp")
    val appId = org.apache.spark.sql.SparkSession.active
      .sparkContext.applicationId
    val cutoff = System.currentTimeMillis() - 30L * 60 * 1000
    val stale = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix) &&
        !f.getName.contains(appId) && f.lastModified() < cutoff)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    stale.foreach(rm)
  }

  private def bySource(df: DataFrame): DataFrame =
    df.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))

  /** Foreign-shaped COLUMN-MAPPING name-mode fixture over `documents`:
    * physical-named parquet under a fresh root plus a hand-written
    * protocol-v2 log whose schemaString carries the logical→physical
    * field metadata (per-file doc_id stats keyed PHYSICAL, so the
    * skipping index exercises the name indirection too). The overwrite
    * wipes any previous run's files and log — deterministic rebuild. */
  private def colmapRoot(s: SparkSession, d: String, q: String): String =
    colmapRoot(s, d, q, docs(s, d))

  private def colmapRoot(s: SparkSession, d: String, q: String,
      base: DataFrame): String = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
    val root = tmpRoot(s, d, q)
    val phys = Map("doc_id" -> "c-1", "source" -> "c-2",
      "lang" -> "c-3", "n_chars" -> "c-4")
    base.select(base.columns.map(c => col(c).as(phys(c))): _*)
      .repartitionByRange(8, col("c-1"))
      .write.mode("overwrite").parquet(root)
    val dir = Paths.get(root)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    // per-file stats on the physical doc_id key, computed from the
    // just-written files (the write-time stats pass, physical-keyed)
    val statsByFile = s.read.parquet(root)
      .groupBy(input_file_name().as("_f"))
      .agg(count(lit(1)).as("n"), min(col("c-1")).as("mn"),
        max(col("c-1")).as("mx"))
      .collect()
      .map(r => r.getString(0).split('/').last ->
        s"""{"numRecords":${r.getLong(1)},"minValues":{"c-1":${r.getLong(2)}},"maxValues":{"c-1":${r.getLong(3)}},"nullCount":{"c-1":0}}""")
      .toMap
    val parts = Files.list(dir).iterator()
    val adds = new scala.collection.mutable.ArrayBuffer[String]
    while (parts.hasNext) {
      val p = parts.next()
      val n = p.getFileName.toString
      if (n.endsWith(".parquet")) {
        val st = statsByFile.get(n).map(j =>
          s""","stats":${m.writeValueAsString(j)}""").getOrElse("")
        adds += s"""{"add":{"path":"$n","partitionValues":{},"size":${Files.size(p)},"modificationTime":1,"dataChange":true$st}}"""
      }
    }
    val logical = StructType(base.schema.fields.zipWithIndex.map {
      case (f, i) => StructField(f.name, f.dataType, f.nullable,
        new MetadataBuilder()
          .putString("delta.columnMapping.physicalName", phys(f.name))
          .putLong("delta.columnMapping.id", i + 1L).build())
    })
    val schemaLit = m.writeValueAsString(logical.json)
    val log =
      s"""{"commitInfo":{"timestamp":1,"operation":"WRITE","operationParameters":{}}}
         |{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
         |{"metaData":{"id":"cm","format":{"provider":"parquet","options":{}},"schemaString":$schemaLit,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"${base.schema.length}"},"createdTime":1}}
         |${adds.sorted.mkString("\n")}
         |""".stripMargin
    val logDir = dir.resolve("_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve(f"${0L}%020d.json"), log.getBytes("UTF-8"))
    root
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // overwrite + latest-snapshot replay: protocol/metaData/add actions,
    // schemaString-typed read
    "q_delta_roundtrip" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_rt"))
      dt.overwrite(docs(s, d))
      bySource(dt.read(s))
    }),
    // time travel: pin the overwrite's version, append on top, read the
    // pinned version — appended rows must NOT appear (re-runs append
    // more versions; the pinned snapshot is immutable)
    "q_delta_time_travel" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_tt"))
      val base = docs(s, d)
      val v0 = dt.overwrite(base.filter(col("doc_id") % 3 === 0))
      dt.append(base.filter(col("doc_id") % 3 =!= 0))
      bySource(dt.read(s, Some(v0)))
    }),
    // checkpoint: compact v0..v1 into parquet, append a JSON tail, read
    // latest — the snapshot must stitch checkpoint + tail losslessly
    "q_delta_checkpoint" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_cp"))
      val base = docs(s, d)
      dt.overwrite(base.filter(col("doc_id") % 3 === 0))
      dt.append(base.filter(col("doc_id") % 3 === 1))
      dt.checkpoint()
      dt.append(base.filter(col("doc_id") % 3 === 2))
      bySource(dt.read(s))
    }),
    // file-pruned MERGE: upsert by key in one atomic commit — matched
    // rows take the source version; only key-envelope-candidate files
    // rewrite (spec proves the pruning; this oracles the semantics)
    "q_delta_merge" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_mrg"))
      val base = docs(s, d)
      dt.overwrite(base.repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id"))
      dt.merge(base.filter(col("doc_id") % 10 === 3)
        .withColumn("n_chars", col("n_chars") + 1000), "doc_id")
      bySource(dt.read(s))
    }),
    // schema evolution: an append ADDS n_chars mid-table; the pre-
    // evolution files serve it as null and the aggregate proves both
    // populations (count vs count(col)) through the merged metaData
    "q_delta_evolution" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_evo"))
      val base = docs(s, d)
      dt.overwrite(base.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("source")))
      dt.append(base.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("source"), col("n_chars")))
      dt.read(s).groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        count(col("n_chars")).as("n_with_chars"),
        sum(col("n_chars")).as("sum_chars"))
    }),
    // data skipping: range-clustered write + per-file add.stats; the
    // read prunes files whose [min,max] envelope misses the predicate
    // BEFORE any scan — correctness identical to the full filter
    "q_delta_skipping" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_skip"))
      dt.overwrite(docs(s, d).repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id", "n_chars"))
      dt.readWhere(s, "doc_id", 100L, 299L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),
    // OPTIMIZE-style compaction: micro-batch files fold into scan-sized
    // ones in a dataChange=false commit — snapshot identical, CDC silent
    "q_delta_compact" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_opt"))
      val base = docs(s, d)
      dt.overwrite(base.filter(col("doc_id") % 2 === 0))
      dt.append(base.filter(col("doc_id") % 2 === 1))
      dt.compact()
      bySource(dt.read(s))
    }),
    // file-pruned DELETE: whole-file drops are remove-only metadata,
    // boundary files rewrite without the matching rows (spec proves the
    // three file classes; this oracles the row semantics end-to-end)
    "q_delta_delete" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_del"))
      dt.overwrite(docs(s, d).repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id"))
      dt.delete("doc_id", 100L, 299L)
      bySource(dt.read(s))
    }),
    // RESTORE: metadata-only rollback — overwrite on top of v0, restore
    // v0; the read must equal the ORIGINAL snapshot (re-added files,
    // removed overwrite files), with history intact
    "q_delta_restore" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_rst"))
      val base = docs(s, d)
      val v0 = dt.overwrite(base.filter(col("doc_id") % 3 === 0))
      dt.overwrite(base.filter(col("doc_id") % 3 === 1))
      dt.restore(v0)
      bySource(dt.read(s))
    }),
    // OPTIMIZE ZORDER BY: Morton-curve rewrite with two-dim stats; the
    // stats-pruned read then filters on the SECOND dim — pruning a
    // doc_id range sort could never serve — and must equal the filter
    "q_delta_zorder" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_zo"))
      dt.overwrite(docs(s, d).repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id"))
      dt.optimizeZOrder("doc_id", "n_chars", bits = 10, numFiles = 8)
      dt.readWhere(s, "n_chars", 150L, 250L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),
    // multi-part checkpoint (the protocol's large-table form): control
    // rows + adds split across %010d-of-%010d parts written by parallel
    // tasks; replay stitches all parts + the JSON tail losslessly
    "q_delta_checkpoint_parts" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_cpp"))
      val base = docs(s, d)
      dt.overwrite(base.filter(col("doc_id") % 3 === 0).repartition(4))
      dt.append(base.filter(col("doc_id") % 3 === 1))
      dt.checkpoint(parts = 3)
      dt.append(base.filter(col("doc_id") % 3 === 2))
      bySource(dt.read(s))
    }),
    // partition-value pruning: readWhere on a PARTITION column prunes on
    // the typed add.partitionValues entry (no per-file stats exist for
    // it) — metadata pruning on the same census filter path
    "q_delta_partition_prune" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_pp"))
      dt.overwrite(docs(s, d).withColumn("bucket", col("doc_id") % 8),
        partitionBy = Seq("bucket"))
      dt.readWhere(s, "bucket", 2L, 4L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),
    // timestampAsOf time travel: a wall-clock pin between two commits
    // serves the earlier snapshot (commit timestamps monotonic-adjusted)
    "q_delta_asof" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_ts"))
      val base = docs(s, d)
      dt.overwrite(base.filter(col("doc_id") % 3 === 0))
      Thread.sleep(5)
      val pin = System.currentTimeMillis
      Thread.sleep(5)
      dt.append(base.filter(col("doc_id") % 3 =!= 0))
      bySource(dt.readAsOf(s, pin))
    }),
    // incremental Delta SOURCE: the sink's txn mirror — a consumer's
    // high-water mark rides the DOWNSTREAM table, micro-batch pulls read
    // only new commits' files, a caught-up pull no-ops; the sink must
    // equal the transform of the full source (streamed ≡ batch).
    // Fresh roots per run: an incremental pipeline's state is its point.
    "q_delta_incremental" -> ((s, d) => {
      val u = java.util.UUID.randomUUID.toString.take(8)
      val srcRoot = tmpRoot(s, d, s"delta_isrc_$u")
      val snkRoot = tmpRoot(s, d, s"delta_isnk_$u")
      val src = DeltaTable(srcRoot)
      val base = docs(s, d)
      def pull(): Option[Long] =
        graft.streaming.StreamingDelta.relay(s, srcRoot, snkRoot, "relay")(
          df => df.filter(col("n_chars") >= 100))
      src.append(base.filter(col("doc_id") % 3 === 0))
      pull()
      src.append(base.filter(col("doc_id") % 3 === 1))
      src.append(base.filter(col("doc_id") % 3 === 2))
      pull()
      pull() // caught up: no-op, sink unchanged
      bySource(DeltaTable(snkRoot).read(s))
    }),
    // incremental OPTIMIZE: size/file-capped dataChange=false batches
    // converge over multiple commits (the 100 TB maintenance shape);
    // the snapshot — and so the aggregate — is identical throughout
    "q_delta_compact_incr" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_opti"))
      dt.overwrite(docs(s, d).repartition(16), statsFor = Seq("doc_id"))
      var guard = 0
      while (dt.compactIncremental(smallBytes = 16L << 30,
        maxBatchFiles = 6, statsFor = Seq("doc_id")).isDefined &&
        guard < 32) guard += 1
      bySource(dt.read(s))
    }),
    // incremental OPTIMIZE ZORDER: zcube-tagged capped batches converge
    // (untagged count strictly decreases); two-dim stats ride each
    // batch, so the second-dim stats-pruned read stays exact
    "q_delta_zorder_incr" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_zoi"))
      dt.overwrite(docs(s, d).repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id"))
      var guard = 0
      while (dt.optimizeZOrderIncremental("doc_id", "n_chars", bits = 10,
        maxBatchFiles = 3).isDefined && guard < 32) guard += 1
      dt.readWhere(s, "n_chars", 150L, 250L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),
    // DELETION VECTORS (protocol readerVersion 3): two overlapping
    // range deletes — the first writes Roaring-bitmap DVs for the
    // boundary files (same paths re-added, no rewrite), the second
    // MERGES into them; whole-envelope files stay remove-only. The read
    // applies every descriptor, so the aggregate equals the plain
    // NOT-BETWEEN filter
    "q_delta_dv" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_dv"))
      dt.overwrite(docs(s, d).repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id"))
      dt.delete("doc_id", 100L, 149L)
      dt.delete("doc_id", 130L, 179L)
      bySource(dt.read(s))
    }),
    // ROW-LEVEL change feed: a file-pruned DELETE's CDF rows are exactly
    // the deleted rows — whole-file drops contribute their live rows,
    // DV'd boundary files contribute their bitmap DIFF rows; a consumer
    // syncing a downstream store reads O(changed rows), never two file
    // images
    "q_delta_cdf" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_cdf"))
      dt.overwrite(docs(s, d).repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id"))
      val v = dt.delete("doc_id", 100L, 299L)
      bySource(dt.changesRows(s, v - 1, v)
        .filter(col("_change_type") === "delete")
        .drop("_change_type", "_commit_version"))
    }),
    // DESCRIBE HISTORY: the audit surface as a DataFrame — version,
    // operation, mode/version parameters and per-commit add/remove
    // action counts over a deterministic 4-commit sequence (overwrite
    // as 4 files, append 2, OPTIMIZE to 1, RESTORE to v1). Every count
    // is protocol-determined: the oracle is the literal expected log.
    // Timestamps excluded — wall-clock is not oracle-replayable
    "q_delta_history" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_hist"))
      val base = docs(s, d)
      dt.overwrite(base.filter(col("doc_id") % 3 === 0).repartition(4))
      dt.append(base.filter(col("doc_id") % 3 =!= 0).repartition(2))
      dt.compact()
      dt.restore(1L)
      dt.history(s).select(col("version"), col("operation"),
        element_at(col("operationParameters"), "mode").as("op_mode"),
        element_at(col("operationParameters"), "version")
          .as("restored_version"),
        col("n_adds"), col("n_removes"))
    }),
    // FOREIGN CDC consumption: a hand-written `cdc` action's
    // _change_data files ARE the commit's change set per the protocol —
    // the feed carries the foreign four-valued vocabulary
    // (update_preimage/postimage) that no add/remove file diff could
    // recover; the aggregate over the consumed feed is the oracle
    "q_delta_cdc" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      val u = java.util.UUID.randomUUID.toString.take(8)
      val root = tmpRoot(s, d, s"delta_cdc_$u")
      val dt = DeltaTable(root)
      val base = docs(s, d)
      dt.overwrite(base) // v0: our own writer
      val upd = base.filter(col("doc_id") % 10 === 3)
      val feedDf = upd.withColumn("_change_type", lit("update_preimage"))
        .unionByName(upd.withColumn("n_chars", col("n_chars") + 1000)
          .withColumn("_change_type", lit("update_postimage")))
      val scratch = Files.createTempDirectory("cdcq")
      feedDf.write.mode("overwrite").parquet(scratch.toString)
      val cdcDir = Paths.get(root, "_change_data")
      Files.createDirectories(cdcDir)
      val actions = new scala.collection.mutable.ArrayBuffer[String]
      val it = Files.list(scratch).iterator()
      var i = 0
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          val rel = s"_change_data/cdc-$i.parquet"
          Files.move(p, Paths.get(root, rel))
          actions += s"""{"cdc":{"path":"$rel","partitionValues":{},"size":${Files.size(Paths.get(root, rel))},"dataChange":false}}"""
          i += 1
        }
      }
      // v1: a foreign-shaped commit whose change set is the cdc payload
      val lines =
        s"""{"commitInfo":{"timestamp":2,"operation":"UPDATE","operationParameters":{}}}""" +:
          actions.toSeq
      Files.write(Paths.get(root, "_delta_log", f"${1L}%020d.json"),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      dt.changes(s, 0L, 1L)
        .groupBy(col("source"), col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),
    // COLUMN MAPPING name mode (the most common foreign-managed-runtime
    // table shape): data files carry PHYSICAL column names, the schema
    // JSON carries the logical→physical indirection in field metadata,
    // protocol minReaderVersion 2 — the reader resolves physical names
    // and serves the LOGICAL schema; the roundtrip aggregate proves it
    "q_delta_colmap" -> ((s, d) =>
      bySource(DeltaTable(colmapRoot(s, d, "delta_cm")).read(s))),
    // the ONE write legal on a column-mapping table: the DV DELETE is
    // metadata-only (bitmap + verbatim re-add of physical-keyed
    // payloads), so rows PII-delete IN PLACE from a foreign name-mode
    // table — the read after it equals the NOT-BETWEEN filter
    "q_delta_colmap_dv" -> ((s, d) => {
      val dt = DeltaTable(colmapRoot(s, d, "delta_cmdv"))
      dt.delete("doc_id", 100L, 299L)
      bySource(dt.read(s))
    }),
    // COLUMN-MAPPING APPEND (r15): new rows land as PHYSICAL-named
    // parquet with physical-keyed stats — a foreign managed-runtime
    // table accepts this engine's appends; the roundtrip over old+new
    // files through the same name indirection is the oracle
    "q_delta_colmap_append" -> ((s, d) => {
      val base = docs(s, d)
      val dt = DeltaTable(colmapRoot(s, d, "delta_cma",
        base.filter(col("doc_id") % 2 === 0)))
      dt.append(base.filter(col("doc_id") % 2 =!= 0))
      bySource(dt.read(s))
    }),
    // COLUMN-MAPPING MERGE (r15): matched rows die by DV, source rows
    // append physical-named — the full upsert verb on a foreign
    // name-mode table
    "q_delta_colmap_merge" -> ((s, d) => {
      val dt = DeltaTable(colmapRoot(s, d, "delta_cmm", docs(s, d)))
      dt.merge(docs(s, d).filter(col("doc_id") % 10 === 3)
        .withColumn("n_chars", col("n_chars") + 1000), "doc_id")
      bySource(dt.read(s))
    }),
    // COLUMN-MAPPING ID MODE read (r15): footers whose column NAMES
    // match nothing — only the parquet field ids (↔
    // delta.columnMapping.id) resolve them; stats stay physical-keyed
    "q_delta_colmap_id" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
      val root = tmpRoot(s, d, "delta_cmi")
      val base = docs(s, d).filter(col("doc_id") % 2 === 0)
      // footer columns named fzz1..fzz4 carrying field ids 1..4
      val footer = StructType(base.schema.fields.zipWithIndex.map {
        case (f, i) => StructField(s"fzz${i + 1}", f.dataType, f.nullable,
          new MetadataBuilder().putLong("parquet.field.id", i + 1L).build())
      })
      s.createDataFrame(
        base.repartitionByRange(8, col("doc_id")).rdd, footer)
        .write.mode("overwrite").parquet(root)
      val dir = Paths.get(root)
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val adds = new scala.collection.mutable.ArrayBuffer[String]
      val parts = Files.list(dir).iterator()
      while (parts.hasNext) {
        val p = parts.next()
        val n = p.getFileName.toString
        if (n.endsWith(".parquet"))
          adds += s"""{"add":{"path":"$n","partitionValues":{},"size":${Files.size(p)},"modificationTime":1,"dataChange":true}}"""
      }
      val phys = Map("doc_id" -> "c-1", "source" -> "c-2",
        "lang" -> "c-3", "n_chars" -> "c-4")
      val logical = StructType(base.schema.fields.zipWithIndex.map {
        case (f, i) => StructField(f.name, f.dataType, f.nullable,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", phys(f.name))
            .putLong("delta.columnMapping.id", i + 1L).build())
      })
      val schemaLit = m.writeValueAsString(logical.json)
      val log =
        s"""{"commitInfo":{"timestamp":1,"operation":"WRITE","operationParameters":{}}}
           |{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}
           |{"metaData":{"id":"cmi","format":{"provider":"parquet","options":{}},"schemaString":$schemaLit,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"4"},"createdTime":1}}
           |${adds.sorted.mkString("\n")}
           |""".stripMargin
      val logDir = dir.resolve("_delta_log")
      Files.createDirectories(logDir)
      Files.write(logDir.resolve(f"${0L}%020d.json"), log.getBytes("UTF-8"))
      // the WRITE side (r15): the engine appends the odd half — the new
      // footers carry parquet field ids, so the same id-resolving read
      // serves the union
      val dt = DeltaTable(root)
      dt.append(docs(s, d).filter(col("doc_id") % 2 =!= 0))
      bySource(dt.read(s))
    }),
    // COLUMN-MAPPING SCHEMA EVOLUTION (r15): an additive append to a
    // name-mode table assigns the new column a fresh physical name +
    // next column id and bumps maxColumnId — old files serve the new
    // column as null through the indirection, the q_delta_evolution
    // contract on a foreign-shaped table
    "q_delta_colmap_evolve" -> ((s, d) => {
      val base = docs(s, d)
      val dt = DeltaTable(colmapRoot(s, d, "delta_cmev",
        base.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("source"), col("lang"))))
      dt.append(base.filter(col("doc_id") % 2 =!= 0))
      dt.read(s).groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        count(col("n_chars")).as("n_with_chars"),
        sum(col("n_chars")).as("sum_chars"))
    }),
    // CDC EMISSION (r15): with delta.enableChangeDataFeed=true the DV
    // DELETE serializes its row-level change set into _change_data +
    // `cdc` actions; the feed consumer (this engine's own foreign-CDC
    // path) reads EXACTLY the deleted rows back
    "q_delta_cdc_emit" -> ((s, d) => {
      val u = java.util.UUID.randomUUID.toString.take(8)
      val dt = DeltaTable(tmpRoot(s, d, s"delta_cdce_$u"))
      dt.overwrite(docs(s, d).repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id"))
      dt.setProperties(Map("delta.enableChangeDataFeed" -> "true"))
      val v = dt.delete("doc_id", 100L, 299L)
      bySource(dt.changes(s, v - 1, v)
        .filter(col("_change_type") === "delete")
        .drop("_change_type", "_commit_version"))
    }),
    // V2 CHECKPOINT read (r15): the v2Checkpoint table feature — a
    // UUID-named manifest whose sidecar files carry the add census; the
    // fixture converts a self-written table, deletes the pre-checkpoint
    // JSON (replay MUST stitch manifest + sidecars) and appends a
    // foreign-shaped tail commit
    "q_delta_checkpoint_v2" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.Row
      import scala.jdk.CollectionConverters._
      val u = java.util.UUID.randomUUID.toString.take(8)
      val root = tmpRoot(s, d, s"delta_v2cp_$u")
      val dt = DeltaTable(root)
      val base = docs(s, d)
      dt.overwrite(base.filter(col("doc_id") % 3 === 0))
      dt.append(base.filter(col("doc_id") % 3 === 1))
      val rootPath = Paths.get(root)
      val logDir = rootPath.resolve("_delta_log")
      val scDir = logDir.resolve("_sidecars")
      Files.createDirectories(scDir)
      val live = Files.list(rootPath).iterator.asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        .sortBy(_.toString)
        .map(p => (p.getFileName.toString, Files.size(p)))
      val addType = StructType(Seq(StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType)))
      def stage(df: DataFrame, dest: java.nio.file.Path): Unit = {
        val scratch = Files.createTempDirectory("v2cpq")
        df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
        val part = Files.list(scratch).iterator.asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        Files.move(part, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      // two sidecars, each holding half the add census
      val (half1, half2) = live.splitAt(math.max(1, live.size / 2))
      val scSchema = StructType(Seq(StructField("add", addType)))
      def sidecar(name: String, files: Seq[(String, Long)]): Unit =
        stage(s.createDataFrame(files.map { case (n, sz) =>
          Row(Row(n, Map.empty[String, String], sz, 1L, true)) }.asJava,
          scSchema), scDir.resolve(name))
      sidecar(s"sc-$u-1.parquet", half1)
      sidecar(s"sc-$u-2.parquet", half2)
      val mfSchema = StructType(Seq(
        StructField("protocol", StructType(Seq(
          StructField("minReaderVersion", IntegerType),
          StructField("minWriterVersion", IntegerType),
          StructField("readerFeatures", ArrayType(StringType)),
          StructField("writerFeatures", ArrayType(StringType))))),
        StructField("metaData", StructType(Seq(
          StructField("id", StringType),
          StructField("format",
            StructType(Seq(StructField("provider", StringType)))),
          StructField("schemaString", StringType),
          StructField("partitionColumns", ArrayType(StringType)),
          StructField("configuration", MapType(StringType, StringType)),
          StructField("createdTime", LongType)))),
        StructField("sidecar", StructType(Seq(
          StructField("path", StringType),
          StructField("sizeInBytes", LongType),
          StructField("modificationTime", LongType))))))
      val mfRows = Seq(
        Row(Row(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint")), null, null),
        Row(null, Row("v2t", Row("parquet"), base.schema.json,
          Seq.empty[String], Map.empty[String, String], 1L), null),
        Row(null, null, Row(s"sc-$u-1.parquet", 1L, 1L)),
        Row(null, null, Row(s"sc-$u-2.parquet", 1L, 1L)))
      stage(s.createDataFrame(mfRows.asJava, mfSchema),
        logDir.resolve(f"${1L}%020d.checkpoint.$u-1111-2222.parquet"))
      // the WRITE side (r15): v2Checkpoint is an implemented writer
      // feature — the engine APPENDS the %3==2 slice to the v2 table and
      // re-checkpoints, which must produce the V2 form (UUID manifest +
      // fresh sidecars), then the pre-checkpoint JSON drops so the
      // engine-written manifest+sidecars are the ONLY census source
      val dt2 = DeltaTable(root)
      dt2.append(base.filter(col("doc_id") % 3 === 2))
      val cpv = dt2.checkpoint()
      (0L until cpv).foreach(v =>
        Files.deleteIfExists(logDir.resolve(f"$v%020d.json")))
      bySource(DeltaTable(root).read(s))
    }),
    // Hive-layout partitioned adds: partitionValues in the log, partition
    // column recovered from the directory layout and pruned at scan
    "q_delta_partitioned" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_part"))
      dt.overwrite(docs(s, d), partitionBy = Seq("source"))
      dt.read(s).filter(col("source").isin("src3", "src7", "src11"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),
    // shallow CLONE (r15): zero-copy table at a fresh root referencing
    // the source's files by absolute path; the clone then diverges with
    // a DV delete — the aggregate reads the CLONE (bitmaps under the
    // clone root against absolute files), the source's log untouched
    "q_delta_clone" -> ((s, d) => {
      val src = DeltaTable(tmpRoot(s, d, "delta_clsrc"))
      src.overwrite(docs(s, d).repartitionByRange(4, col("doc_id")),
        statsFor = Seq("doc_id"))
      val u = java.util.UUID.randomUUID.toString.take(8)
      val dst = src.shallowCloneTo(tmpRoot(s, d, s"delta_cldst_$u"))
      dst.delete("doc_id", 100L, 299L)
      bySource(dst.read(s))
    }),
    // timestampNtz table feature (r15): the overwrite introduces a
    // TIMESTAMP_NTZ column, declaring the reader+writer feature; the
    // roundtrip groups ON the ntz value (proving the type survives the
    // delta write/read), the oracle recomputes it in DuckDB — both
    // engines build the timestamp from the same integers, no zone math
    "q_delta_ntz" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_ntz"))
      val base = docs(s, d).withColumn("etl_ts", expr(
        "make_timestamp_ntz(2024, 1, CAST(1 + doc_id % 28 AS INT), " +
          "CAST(doc_id % 24 AS INT), 0, 0)"))
      dt.overwrite(base)
      dt.read(s).groupBy(hour(col("etl_ts")).as("hr"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("etl_ts")).as("n_ts"))
    }),
    // variantType table feature (r18): the overwrite introduces a
    // VARIANT column built from integer/string fields (declaring the
    // reader+writer feature in the same commit), a DV delete kills a
    // band, and the aggregate GROUPS ON variant_get extractions — the
    // roundtrip proves the binary variant layout survives the delta
    // write/read + DV path. The oracle recomputes the same values from
    // the underlying fields in DuckDB, engine-independently.
    "q_delta_variant" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_var"))
      val base = docs(s, d).withColumn("meta", expr(
        """parse_json(concat('{"a":', CAST(doc_id % 100 AS STRING),
          |',"lang":"', lang, '"}'))""".stripMargin.replace("\n", "")))
      dt.overwrite(base.repartitionByRange(4, col("doc_id")),
        statsFor = Seq("doc_id"))
      dt.delete("doc_id", 100L, 299L)
      dt.read(s)
        .select(expr("variant_get(meta, '$.a', 'long')").as("a"),
          expr("variant_get(meta, '$.lang', 'string')").as("vlang"),
          col("n_chars"))
        .groupBy(col("a"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("vlang")).as("n_langs"),
          sum(col("n_chars")).as("sum_chars"))
    }),
    // UPDATE verb (r15): stats-pruned DV-kill of the matched rows +
    // postimage append in ONE commit; SET expressions evaluate against
    // the pre-update row — the oracle restates the update as CASE
    "q_delta_update" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_upd"))
      val base = docs(s, d)
      dt.overwrite(base.repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id"))
      dt.update("doc_id", 100L, 299L,
        Map("n_chars" -> (col("n_chars") + 7), "lang" -> lit("xx")))
      bySource(dt.read(s))
    }),
    // CHECK-constraint ENFORCEMENT (r15): SET TBLPROPERTIES activates
    // two constraints (upgrading the protocol to the declaring tier 3);
    // the append's rows all satisfy them, so the write lands through the
    // inline per-row asserts and the roundtrip is lossless (violating
    // writes refusing — and refusing ATOMICALLY — is spec'd in
    // DeltaSpec's row-contract suite)
    "q_delta_constraint" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_ckq"))
      val base = docs(s, d)
      dt.overwrite(base.filter(col("doc_id") % 2 === 0))
      dt.setProperties(Map(
        "delta.constraints.chars_nonneg" -> "n_chars >= 0",
        "delta.constraints.id_present" -> "doc_id IS NOT NULL"))
      dt.append(base.filter(col("doc_id") % 2 =!= 0))
      bySource(dt.read(s))
    }),
    // GENERATED-column enforcement (r15): the table declares
    // chars_bucket = CAST(FLOOR(n_chars / 100) AS BIGINT) in field
    // metadata; the second append OMITS the column and the engine
    // computes it into the files — the oracle recomputes it in SQL
    "q_delta_generated" -> ((s, d) => {
      import org.apache.spark.sql.types.MetadataBuilder
      val dt = DeltaTable(tmpRoot(s, d, "delta_genq"))
      val base = docs(s, d)
      val genMeta = new MetadataBuilder().putString(
        "delta.generationExpression",
        "CAST(FLOOR(n_chars / 100) AS BIGINT)").build()
      dt.overwrite(base.filter(col("doc_id") % 2 === 0).select(
        col("doc_id"), col("source"), col("lang"), col("n_chars"),
        floor(col("n_chars") / 100).cast("bigint").as("chars_bucket", genMeta)))
      dt.append(base.filter(col("doc_id") % 2 =!= 0)) // column omitted
      dt.read(s).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("chars_bucket")).as("sum_buckets"),
          countDistinct(col("chars_bucket")).as("n_buckets"))
    }),
    // IDENTITY-column enforcement (r15): a fresh table declares
    // id = START 1000 STEP 3; two appends omit the column and the
    // engine assigns values DISTRIBUTED, continuing from the committed
    // high-water-mark — ids form the exact arithmetic sequence
    // 1000 + 3k over all rows, which the oracle states in closed form.
    // Fresh root per run: identity state accumulates across appends.
    "q_delta_identity" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType, MetadataBuilder}
      val u = java.util.UUID.randomUUID.toString.take(8)
      val dt = DeltaTable(tmpRoot(s, d, s"delta_idq_$u"))
      val base = docs(s, d).select(col("source"), col("lang"), col("n_chars"))
      val idMeta = new MetadataBuilder()
        .putLong("delta.identity.start", 1000L)
        .putLong("delta.identity.step", 3L).build()
      dt.overwrite(base.limit(0).select(col("*"),
        lit(null).cast(LongType).as("row_id", idMeta)))
      dt.append(base.filter(col("n_chars") % 2 === 0))
      dt.append(base.filter(col("n_chars") % 2 =!= 0))
      dt.read(s).agg(count(lit(1)).as("n_rows"),
        min(col("row_id")).as("min_id"), max(col("row_id")).as("max_id"),
        countDistinct(col("row_id")).as("n_ids"),
        sum(col("row_id")).as("sum_ids"))
    }),
    // RENAME + DROP COLUMN (r16): the verbs column mapping exists for —
    // metadata-only commits on the foreign name-mode fixture rewrite
    // the logical names while every physical column, stats key and
    // data file stays byte-identical; the aggregate reads through the
    // RENAMED column and proves the drop disturbed nothing else
    "q_delta_rename" -> ((s, d) => {
      val root = colmapRoot(s, d, "delta_renameq")
      val dt = DeltaTable(root)
      dt.renameColumn("n_chars", "char_count")
      dt.dropColumn("doc_id")
      dt.read(s).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("char_count")).as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"))
    }),
    // partitioned shallow CLONE (r16): the Hive-layout source clones
    // zero-copy (partitionValues ride the actions; the read recovers
    // partition columns from them, not the foreign directory layout),
    // then diverges with a mixed partition+stats predicate DV delete —
    // the aggregate reads the CLONE, the source's log untouched
    "q_delta_clone_part" -> ((s, d) => {
      val src = DeltaTable(tmpRoot(s, d, "delta_clpsrc"))
      src.overwrite(docs(s, d), partitionBy = Seq("lang"),
        statsFor = Seq("doc_id"))
      wipeStale("delta_clpdst_")
      val u = java.util.UUID.randomUUID.toString.take(8)
      val dst = src.shallowCloneTo(tmpRoot(s, d, s"delta_clpdst_$u"))
      dst.deleteWhere("lang = 'en' OR doc_id BETWEEN 100 AND 199")
      bySource(dst.read(s))
    }),
    // arbitrary-predicate DELETE (r16): a two-column conjunct the range
    // form cannot express — envelope-pruned per referenced column, DV'd
    // at boundaries; the oracle restates the survivors with SQL null
    // semantics (predicate FALSE or NULL keeps the row)
    "q_delta_delete_pred" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_delpred"))
      dt.overwrite(docs(s, d)
          .withColumn("nq", when(col("doc_id") % 7 === 0,
            lit(null).cast("long")).otherwise(col("n_chars")))
          .repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id", "lang", "n_chars", "nq"))
      dt.deleteWhere("lang = 'en' AND n_chars < 200")
      // negated conjunct over the NULLABLE column: rows where nq is
      // NULL evaluate the predicate NULL and MUST survive — the r17
      // NOT-envelope fix (two-valued duality would whole-file-drop
      // files whose non-null nq all clear 300)
      dt.deleteWhere("lang = 'fr' AND NOT (nq < 300)")
      bySource(dt.read(s))
    }),
    // arbitrary-predicate UPDATE (r16): SET applied exactly where the
    // conjunct holds; the oracle restates it as CASE
    "q_delta_update_pred" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_updpred"))
      dt.overwrite(docs(s, d)
          .withColumn("nq", when(col("doc_id") % 7 === 0,
            lit(null).cast("long")).otherwise(col("n_chars")))
          .repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id", "lang", "n_chars", "nq"))
      dt.updateWhere("lang = 'en' AND n_chars >= 200",
        Map("n_chars" -> (col("n_chars") + 13), "lang" -> lit("enx")))
      // negated conjunct over the NULLABLE column: NULL-nq rows match
      // neither (predicate NULL) and must ride through UNMODIFIED —
      // the r17 NOT-envelope fix (the old whole-update path silently
      // LOST such rows)
      dt.updateWhere("lang = 'de' AND NOT (nq < 300)",
        Map("n_chars" -> (col("n_chars") + 7)))
      bySource(dt.read(s))
    }),
    // typeWidening (r17): a FOREIGN table whose columns were WIDENED
    // (int32 files under a long/double schema with the protocol's
    // delta.typeChanges history) — the scan serves the declared types
    // from the narrow files (Spark parquet promotion), an engine
    // append adds wide-typed files, and the aggregate spans BOTH file
    // generations
    "q_delta_widened" -> ((s, d) => {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      wipeStale("delta_tw_")
      val root = tmpRoot(s, d, "delta_tw")
      val narrow = docs(s, d).select(
        col("doc_id").cast("int").as("doc_id"),
        col("n_chars").cast("int").as("n_chars"))
      val scratch = root + ".scratch"
      narrow.coalesce(1).write.mode("overwrite").parquet(scratch)
      Files.createDirectories(Paths.get(root))
      val part = Files.list(Paths.get(scratch)).iterator()
      var moved = false
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          Files.move(p, Paths.get(root, "f0.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
          moved = true
        }
      }
      require(moved, "typeWidening fixture: no part file staged")
      val log = Paths.get(root, "_delta_log")
      Files.createDirectories(log)
      val schemaLit =
        """{\"type\":\"struct\",\"fields\":[{\"name\":\"doc_id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.typeChanges\":[{\"fromType\":\"integer\",\"toType\":\"long\",\"tableVersion\":1}]}},{\"name\":\"n_chars\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.typeChanges\":[{\"fromType\":\"integer\",\"toType\":\"long\",\"tableVersion\":1}]}}]}"""
      Files.write(log.resolve(f"${0L}%020d.json"),
        (s"""{"commitInfo":{"timestamp":1,"operation":"WRITE","operationParameters":{}}}
            |{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}
            |{"metaData":{"id":"twq","format":{"provider":"parquet","options":{}},"schemaString":"$schemaLit","partitionColumns":[],"configuration":{},"createdTime":1}}
            |{"add":{"path":"f0.parquet","partitionValues":{},"size":${Files.size(Paths.get(root, "f0.parquet"))},"modificationTime":1,"dataChange":true}}
            |""").stripMargin.getBytes("UTF-8"))
      val dt = DeltaTable(root)
      dt.append(docs(s, d).select(
        (col("doc_id") + 100000L).as("doc_id"),
        (col("n_chars") * 2).cast("long").as("n_chars")))
      dt.read(s).agg(count(lit(1)).as("n_rows"),
        sum(col("doc_id")).as("sum_id"),
        sum(col("n_chars")).as("sum_chars"))
    }),
    // NESTED-column envelopes (r17): the documents ride inside a
    // struct; the predicate DELETE prunes on the nested stats
    // ($.minValues.meta.lang — the protocol's nested shape, which the
    // write-time stats pass now emits) and composes a negation over
    // the nested numeric field
    "q_delta_nested_pred" -> ((s, d) => {
      val dt = DeltaTable(tmpRoot(s, d, "delta_nested"))
      dt.overwrite(docs(s, d)
          .select(col("doc_id"), col("source"),
            struct(col("lang"), col("n_chars")).as("meta"))
          .repartitionByRange(8, col("doc_id")),
        statsFor = Seq("doc_id", "meta.lang", "meta.n_chars"))
      dt.deleteWhere("meta.lang = 'en' AND NOT (meta.n_chars >= 200)")
      dt.read(s).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("meta.n_chars")).as("sum_chars"),
          countDistinct(col("meta.lang")).as("n_langs"))
    }),
    // clustered foreign table (r17, reclustered r18): a hand-written
    // v0 declares the `clustering` writer feature + the delta.clustering
    // domain with TWO clustering columns (what delta-spark CLUSTER BY
    // tables carry by default). The engine appends, predicate-deletes,
    // then runs the RECLUSTERING OPTIMIZE — the one verb that refused
    // through r17 — which rewrites the live set along the declared
    // (doc_id, n_chars) Morton curve in a dataChange=false commit with
    // the domain intact; the output pins the surviving data unchanged
    // by the rewrite plus the intact domain.
    "q_delta_clustered" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      wipeStale("delta_clustered_")
      val root = tmpRoot(s, d, "delta_clustered")
      val base = docs(s, d)
      val log = Paths.get(root, "_delta_log")
      Files.createDirectories(log)
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val schemaLit = m.writeValueAsString(base.schema.json)
      Files.write(log.resolve(f"${0L}%020d.json"),
        (s"""{"commitInfo":{"timestamp":1,"operation":"CREATE TABLE","operationParameters":{}}}
            |{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","invariants","domainMetadata","clustering"]}}
            |{"metaData":{"id":"clq","format":{"provider":"parquet","options":{}},"schemaString":$schemaLit,"partitionColumns":[],"configuration":{},"createdTime":1}}
            |{"domainMetadata":{"domain":"delta.clustering","configuration":"{\\"clusteringColumns\\":[[\\"doc_id\\"],[\\"n_chars\\"]]}","removed":false}}
            |""").stripMargin.getBytes("UTF-8"))
      val dt = DeltaTable(root)
      dt.append(base.repartitionByRange(4, col("doc_id")),
        statsFor = Seq("doc_id", "lang", "n_chars"))
      dt.deleteWhere("lang = 'en' AND n_chars < 250")
      dt.optimizeClustered(numFiles = 4)
      val dom = dt.domainMetadata(s)
        .where(col("domain") === "delta.clustering")
        .select(count(lit(1)).as("n_cluster_domains"))
      bySource(dt.read(s)).crossJoin(broadcast(dom))
    }),
    // icebergCompatV2 (UniForm) ACTIVE append contract (r18): a
    // hand-written v0 declares name-mode columnMapping + the
    // icebergCompatV2 writer feature with delta.enableIcebergCompatV2
    // = true and no data. The engine appends both halves — legal
    // because the active contract's append shape is honored: every
    // written file carries Iceberg-compatible parquet field-id footers
    // and every add carries numRecords (enforced in commit; the
    // row-removing/rewriting verbs refuse on this table, spec'd in
    // DeltaSpec) — and the aggregate reads the composed table back.
    // Fresh UUID root per run (a v0-plus-appends fixture is not
    // idempotent in place).
    "q_delta_iceberg" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
      wipeStale("delta_iceberg_")
      val u = java.util.UUID.randomUUID.toString.take(8)
      val root = tmpRoot(s, d, s"delta_iceberg_$u")
      val base = docs(s, d)
      val log = Paths.get(root, "_delta_log")
      Files.createDirectories(log)
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val mapped = StructType(base.schema.fields.zipWithIndex.map {
        case (f, i) => StructField(f.name, f.dataType, f.nullable,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", f.name)
            .putLong("delta.columnMapping.id", i + 1L).build())
      })
      val schemaLit = m.writeValueAsString(mapped.json)
      Files.write(log.resolve(f"${0L}%020d.json"),
        (s"""{"commitInfo":{"timestamp":1,"operation":"CREATE TABLE","operationParameters":{}}}
            |{"protocol":{"minReaderVersion":2,"minWriterVersion":7,"readerFeatures":["columnMapping"],"writerFeatures":["appendOnly","invariants","columnMapping","icebergCompatV2"]}}
            |{"metaData":{"id":"icq","format":{"provider":"parquet","options":{}},"schemaString":$schemaLit,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"${base.schema.length}","delta.enableIcebergCompatV2":"true"},"createdTime":1}}
            |""").stripMargin.getBytes("UTF-8"))
      val dt = DeltaTable(root)
      dt.append(base.filter(col("doc_id") % 2 === 0)
        .repartitionByRange(2, col("doc_id")), statsFor = Seq("doc_id"))
      dt.append(base.filter(col("doc_id") % 2 =!= 0)
        .repartitionByRange(2, col("doc_id")), statsFor = Seq("doc_id"))
      bySource(dt.read(s))
    }),
    // rowTracking writer feature (r16, ENABLED-state moves r17): a
    // hand-written FOREIGN v0 declares rowTracking+domainMetadata with
    // delta.enableRowTracking=true (the modern delta-spark default);
    // the engine appends both halves (fresh disjoint baseRowId blocks,
    // advancing the delta.rowTracking high-water mark), DV-deletes a
    // band (ids preserved in place), then MOVES rows — an UPDATE band
    // and a whole-table OPTIMIZE — with every moved row's id riding
    // the materialized row-id column. The oracle pins THREE planes:
    // the live data; the final high-water mark in closed form
    // (N−1 from the appends, + matched-update rows, + live rows from
    // the OPTIMIZE rewrite — fresh blocks are assigned to every new
    // file, ids never reused); and n_id_drift = 0 — the per-doc row id
    // BEFORE the moves equals the id after them. Fresh root per run.
    "q_delta_rowtracking" -> ((s, d) => {
      import java.nio.file.{Files, Paths}
      wipeStale("delta_rowtrk_")
      val u = java.util.UUID.randomUUID.toString.take(8)
      val root = tmpRoot(s, d, s"delta_rowtrk_$u")
      val base = docs(s, d)
      val log = Paths.get(root, "_delta_log")
      Files.createDirectories(log)
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val schemaLit = m.writeValueAsString(base.schema.json)
      Files.write(log.resolve(f"${0L}%020d.json"),
        (s"""{"commitInfo":{"timestamp":1,"operation":"CREATE TABLE","operationParameters":{}}}
            |{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","invariants","domainMetadata","rowTracking"]}}
            |{"metaData":{"id":"rtq","format":{"provider":"parquet","options":{}},"schemaString":$schemaLit,"partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"},"createdTime":1}}
            |""").stripMargin.getBytes("UTF-8"))
      val dt = DeltaTable(root)
      dt.append(base.filter(col("doc_id") % 2 === 0)
        .repartitionByRange(4, col("doc_id")), statsFor = Seq("doc_id"))
      dt.append(base.filter(col("doc_id") % 2 =!= 0)
        .repartitionByRange(4, col("doc_id")), statsFor = Seq("doc_id"))
      dt.delete("doc_id", 100L, 299L)
      // pre-move lineage (the old files stay on disk — no vacuum — so
      // this frame keeps reading the pre-move snapshot lazily)
      val pre = dt.readWithRowLineage(s)
        .select(col("doc_id"), col("_row_id").as("rid0"))
      dt.update("doc_id", 300L, 349L,
        Map("n_chars" -> (col("n_chars") + 5)))
      dt.compact()
      val post = dt.readWithRowLineage(s)
        .select(col("doc_id"), col("_row_id").as("rid1"))
      val drift = pre.join(post, Seq("doc_id"), "full")
        .where(!(col("rid0") <=> col("rid1")))
        .agg(count(lit(1)).as("n_id_drift"))
      val hwm = dt.domainMetadata(s)
        .where(col("domain") === "delta.rowTracking")
        .select(get_json_object(col("configuration"),
          "$.rowIdHighWaterMark").cast("bigint").as("row_id_hwm"))
      dt.read(s).agg(count(lit(1)).as("n_live"),
          sum(col("n_chars")).as("sum_chars"))
        .crossJoin(broadcast(hwm))
        .crossJoin(broadcast(drift))
    }),
  )

  private val bySourceSql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(DISTINCT lang) AS n_langs
      |FROM documents""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_delta_roundtrip" -> s"$bySourceSql GROUP BY source",
    "q_delta_time_travel" ->
      s"$bySourceSql WHERE doc_id % 3 = 0 GROUP BY source",
    "q_delta_checkpoint" -> s"$bySourceSql GROUP BY source",
    "q_delta_compact" -> s"$bySourceSql GROUP BY source",
    "q_delta_merge" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars + CASE WHEN doc_id % 10 = 3 THEN 1000 ELSE 0 END)
        |    AS BIGINT) AS sum_chars,
        |  count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY source""".stripMargin,
    "q_delta_evolution" ->
      """SELECT source, count(*) AS n_docs,
        |  count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_with_chars,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
        |    AS sum_chars
        |FROM documents GROUP BY source""".stripMargin,
    "q_delta_skipping" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id BETWEEN 100 AND 299
        |GROUP BY source""".stripMargin,
    "q_delta_delete" ->
      s"$bySourceSql WHERE doc_id NOT BETWEEN 100 AND 299 GROUP BY source",
    "q_delta_dv" ->
      s"$bySourceSql WHERE doc_id NOT BETWEEN 100 AND 179 GROUP BY source",
    // the row-level delete feed is exactly the deleted rows
    "q_delta_cdf" ->
      s"$bySourceSql WHERE doc_id BETWEEN 100 AND 299 GROUP BY source",
    "q_delta_restore" ->
      s"$bySourceSql WHERE doc_id % 3 = 0 GROUP BY source",
    "q_delta_zorder" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars BETWEEN 150 AND 250
        |GROUP BY source""".stripMargin,
    "q_delta_incremental" ->
      s"$bySourceSql WHERE n_chars >= 100 GROUP BY source",
    "q_delta_checkpoint_parts" -> s"$bySourceSql GROUP BY source",
    // lossless roundtrip through the physical-name indirection
    "q_delta_colmap" -> s"$bySourceSql GROUP BY source",
    // in-place DV delete on the foreign name-mode table
    "q_delta_colmap_dv" ->
      s"$bySourceSql WHERE doc_id NOT BETWEEN 100 AND 299 GROUP BY source",
    // physical-named append: old (fixture) + new (engine-written) files
    // roundtrip to the full table
    "q_delta_colmap_append" -> s"$bySourceSql GROUP BY source",
    // physical-named merge ≡ the plain merge oracle
    "q_delta_colmap_merge" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars + CASE WHEN doc_id % 10 = 3 THEN 1000 ELSE 0 END)
        |    AS BIGINT) AS sum_chars,
        |  count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY source""".stripMargin,
    // field-id resolution serves the same logical table — fixture half
    // plus the engine-appended (field-id-footer) half
    "q_delta_colmap_id" -> s"$bySourceSql GROUP BY source",
    // evolution on the name-mode table: odd half carries n_chars through
    // the freshly-assigned physical column, even half serves nulls
    "q_delta_colmap_evolve" ->
      """SELECT source, count(*) AS n_docs,
        |  count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_with_chars,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
        |    AS sum_chars
        |FROM documents GROUP BY source""".stripMargin,
    // the emitted cdc payload is exactly the deleted rows
    "q_delta_cdc_emit" ->
      s"$bySourceSql WHERE doc_id BETWEEN 100 AND 299 GROUP BY source",
    // manifest + sidecars + tail stitch to the full table
    "q_delta_checkpoint_v2" -> s"$bySourceSql GROUP BY source",
    // the consumed foreign feed: pre-image rows at original n_chars,
    // post-image rows at +1000, one pair per doc_id ≡ 3 mod 10
    "q_delta_cdc" ->
      """SELECT source, ct AS change_type, count(*) AS n_docs,
        |  CAST(sum(n_chars + CASE WHEN ct = 'update_postimage'
        |    THEN 1000 ELSE 0 END) AS BIGINT) AS sum_chars
        |FROM documents
        |CROSS JOIN (VALUES ('update_preimage'), ('update_postimage')) AS t(ct)
        |WHERE doc_id % 10 = 3
        |GROUP BY source, ct""".stripMargin,
    "q_delta_partition_prune" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 8 BETWEEN 2 AND 4
        |GROUP BY source""".stripMargin,
    "q_delta_asof" ->
      s"$bySourceSql WHERE doc_id % 3 = 0 GROUP BY source",
    "q_delta_compact_incr" -> s"$bySourceSql GROUP BY source",
    "q_delta_zorder_incr" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars BETWEEN 150 AND 250
        |GROUP BY source""".stripMargin,
    "q_delta_partitioned" ->
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE source IN ('src3', 'src7', 'src11')
        |GROUP BY source, lang""".stripMargin,
    // the literal protocol-determined log: 4-file overwrite, 2-file
    // append, whole-table OPTIMIZE (1 add, 6 removes), RESTORE to v1
    // (re-adds the 6 originals, removes the compacted file)
    "q_delta_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(3 AS BIGINT), 'RESTORE', CAST(NULL AS VARCHAR), '1',
        |   CAST(6 AS BIGINT), CAST(1 AS BIGINT)),
        |  (2, 'OPTIMIZE', NULL, NULL, 1, 6),
        |  (1, 'WRITE', 'Append', NULL, 2, 0),
        |  (0, 'WRITE', 'Overwrite', NULL, 4, 0))
        | AS t(version, operation, op_mode, restored_version,
        |      n_adds, n_removes)""".stripMargin,
    // the clone serves the source minus the DV-deleted band
    "q_delta_clone" ->
      s"$bySourceSql WHERE doc_id NOT BETWEEN 100 AND 299 GROUP BY source",
    // the ntz timestamp recomputed from the same integer fields
    "q_delta_ntz" ->
      """SELECT CAST(hour(make_timestamp(2024, 1,
        |    CAST(1 + doc_id % 28 AS INT), CAST(doc_id % 24 AS INT),
        |    0, 0)) AS INT) AS hr,
        |  count(*) AS n_docs,
        |  count(DISTINCT make_timestamp(2024, 1,
        |    CAST(1 + doc_id % 28 AS INT), CAST(doc_id % 24 AS INT),
        |    0, 0)) AS n_ts
        |FROM documents GROUP BY 1""".stripMargin,
    // the variant extractions recomputed from the underlying fields
    "q_delta_variant" ->
      """SELECT CAST(doc_id % 100 AS BIGINT) AS a, count(*) AS n_docs,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id NOT BETWEEN 100 AND 299
        |GROUP BY 1""".stripMargin,
    // the UPDATE restated as CASE over the source table
    "q_delta_update" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars + CASE WHEN doc_id BETWEEN 100 AND 299
        |    THEN 7 ELSE 0 END) AS BIGINT) AS sum_chars,
        |  count(DISTINCT CASE WHEN doc_id BETWEEN 100 AND 299
        |    THEN 'xx' ELSE lang END) AS n_langs
        |FROM documents GROUP BY source""".stripMargin,
    // lossless roundtrip through the constraint-enforced append
    "q_delta_constraint" -> s"$bySourceSql GROUP BY source",
    // the oracle recomputes the generation expression in SQL (FLOOR on
    // both sides: DuckDB's CAST rounds half-even where Spark truncates)
    "q_delta_generated" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(CAST(FLOOR(n_chars / 100) AS BIGINT)) AS BIGINT)
        |    AS sum_buckets,
        |  count(DISTINCT CAST(FLOOR(n_chars / 100) AS BIGINT)) AS n_buckets
        |FROM documents GROUP BY source""".stripMargin,
    // identity values form the closed-form arithmetic sequence
    // 1000 + 3k, k = 0..n-1, independent of row-to-id permutation
    "q_delta_identity" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(1000 AS BIGINT) AS min_id,
        |  CAST(1000 + 3*(count(*) - 1) AS BIGINT) AS max_id,
        |  CAST(count(*) AS BIGINT) AS n_ids,
        |  CAST(1000*count(*) + 3*count(*)*(count(*) - 1)/2 AS BIGINT)
        |    AS sum_ids
        |FROM documents""".stripMargin,
    // rename/drop are lossless on the surviving columns: the renamed
    // logical column serves the same physical data
    "q_delta_rename" -> s"$bySourceSql GROUP BY source",
    // survivors of the partition+stats disjunct delete on the clone
    "q_delta_clone_part" ->
      s"""$bySourceSql
         |WHERE NOT COALESCE(lang = 'en' OR doc_id BETWEEN 100 AND 199,
         |  FALSE)
         |GROUP BY source""".stripMargin,
    // survivors of the conjunct delete: predicate FALSE or NULL keeps
    // the row (restated with COALESCE so DuckDB's null handling is
    // explicit and identical)
    // two composed deletes, the second NEGATED over a nullable derived
    // column (nq NULL on every 7th doc): predicate FALSE **or NULL**
    // keeps the row, hence the explicit COALESCE(..., FALSE) on each
    "q_delta_delete_pred" ->
      s"""$bySourceSql
         |WHERE NOT COALESCE(lang = 'en' AND n_chars < 200, FALSE)
         |  AND NOT COALESCE(lang = 'fr' AND NOT ((CASE
         |    WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END) < 300),
         |    FALSE)
         |GROUP BY source""".stripMargin,
    // the conjunct UPDATEs restated as CASE over the source table; the
    // second SET is negated over the nullable nq column, so NULL-nq
    // rows take neither branch (COALESCE pins DuckDB's null handling)
    "q_delta_update_pred" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars
        |    + CASE WHEN lang = 'en' AND n_chars >= 200 THEN 13 ELSE 0 END
        |    + CASE WHEN COALESCE(lang = 'de' AND NOT ((CASE
        |        WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END) < 300),
        |        FALSE) THEN 7 ELSE 0 END) AS BIGINT) AS sum_chars,
        |  count(DISTINCT CASE WHEN lang = 'en' AND n_chars >= 200
        |    THEN 'enx' ELSE lang END) AS n_langs
        |FROM documents GROUP BY source""".stripMargin,
    // both generations of the widened table: the narrow originals plus
    // the engine's wide append (ids +100000, chars ×2)
    "q_delta_widened" ->
      """SELECT CAST(2 * count(*) AS BIGINT) AS n_rows,
        |  CAST(2 * sum(doc_id) + 100000 * count(*) AS BIGINT) AS sum_id,
        |  CAST(3 * sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents""".stripMargin,
    // survivors of the nested-predicate delete (predicate FALSE or
    // NULL keeps the row; n_chars is never NULL so the negation is
    // two-valued here)
    "q_delta_nested_pred" ->
      s"""$bySourceSql
         |WHERE NOT COALESCE(lang = 'en' AND NOT (n_chars >= 200), FALSE)
         |GROUP BY source""".stripMargin,
    // survivors of the predicate delete on the clustered table, plus
    // the intact delta.clustering domain (always exactly 1)
    "q_delta_clustered" ->
      s"""SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  count(DISTINCT lang) AS n_langs,
         |  CAST(1 AS BIGINT) AS n_cluster_domains
         |FROM documents
         |WHERE NOT COALESCE(lang = 'en' AND n_chars < 250, FALSE)
         |GROUP BY source""".stripMargin,
    // the two engine appends compose the full table back
    "q_delta_iceberg" -> s"$bySourceSql GROUP BY source",
    // the live band after the DV delete (+5 on the updated 300–349
    // band), the high-water mark in closed form — N−1 from the appends,
    // + the update's moved rows, + the OPTIMIZE's full live rewrite
    // (fresh blocks per new file, ids never reused) — and zero row-id
    // drift across the moves (the enabled-state preservation contract)
    "q_delta_rowtracking" ->
      """SELECT CAST(count(CASE WHEN doc_id NOT BETWEEN 100 AND 299
        |    THEN 1 END) AS BIGINT) AS n_live,
        |  CAST(sum(CASE WHEN doc_id NOT BETWEEN 100 AND 299
        |    THEN n_chars + CASE WHEN doc_id BETWEEN 300 AND 349
        |      THEN 5 ELSE 0 END END) AS BIGINT) AS sum_chars,
        |  CAST(count(*) - 1
        |    + count(CASE WHEN doc_id BETWEEN 300 AND 349 THEN 1 END)
        |    + count(CASE WHEN doc_id NOT BETWEEN 100 AND 299 THEN 1 END)
        |    AS BIGINT) AS row_id_hwm,
        |  CAST(0 AS BIGINT) AS n_id_drift
        |FROM documents""".stripMargin,
  )
}
