package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Delta Lake TRANSACTION-LOG interop — reads and writes the actual
  * open `_delta_log` format (the public Delta protocol: newline-
  * delimited JSON action files `%020d.json`, parquet checkpoints
  * `%020d.checkpoint.parquet`, the `_last_checkpoint` pointer), so
  * tables written here are readable by any Delta reader and vice
  * versa — the external-interop boundary [[TxTable]] (a Delta-CLASS
  * protocol with its own manifest format) deliberately left open.
  *
  * Reference surface: the reference lake
  * (`ingestion-datalake-listings.py:60-107`) lands plain files in ADLS
  * containers; this is the north-star upgrade — an ACID table format a
  * 100 TB training-data lake actually needs for concurrent
  * ingest/compact/curate.
  *
  * Protocol subset (all public knowledge, delta.io PROTOCOL.md):
  *   - actions understood: `protocol`, `metaData`, `add`, `remove`,
  *     `commitInfo` (pass-through); unknown actions and unknown FIELDS
  *     of known actions are ignored on read, as the protocol requires.
  *   - snapshot = latest checkpoint ≤ target version (parquet, found by
  *     listing; `_last_checkpoint` is treated as a hint, not truth)
  *     replayed forward with the JSON tail. Within replay the LAST
  *     action per path wins; a `remove` tombstones the path.
  *   - `minReaderVersion` must be 1: features gated behind reader 2/3
  *     (column mapping, deletion vectors) change row visibility or
  *     physical names, and silently mis-reading them would corrupt
  *     results — LOUD FAILURE instead, per the engine discipline.
  *   - partitioned tables: `add.partitionValues` + Hive-style paths;
  *     reads recover partition columns from the directory layout
  *     (`basePath`), then cast to the `schemaString` types, so
  *     partition pruning stays a PartitionFilters push-down.
  *
  * Scale shape: the active-file SET is reconstructed driver-side (a
  * HashMap keyed by path — the delta-standalone design; bounded by
  * FILE count, not rows, and the JSON tail is bounded by the
  * checkpoint interval). The DATA plane is one multi-path parquet
  * scan — predicate/partition pruning intact. Checkpointing compacts
  * the log so replay cost never grows with table age.
  *
  * Commit publish is the same atomic same-FS `createLink` as
  * [[TxTable.publish]]: two racing writers of version v cannot both
  * win, which is exactly the protocol's "mutual exclusion on the
  * commit file" requirement (on S3-class stores this would ride a
  * conditional PUT / DynamoDB lock, same contract).
  */
final case class DeltaTable(root: String) {
  import DeltaTable._

  private def logDir: Path = Paths.get(root, "_delta_log")
  private def commitPath(v: Long): Path = logDir.resolve(f"$v%020d.json")
  private def checkpointPath(v: Long): Path =
    logDir.resolve(f"$v%020d.checkpoint.parquet")

  private def listLog(suffix: String): Seq[(Long, Path)] =
    if (!Files.isDirectory(logDir)) Nil
    else Files.list(logDir).iterator.asScala
      .filter(_.getFileName.toString.endsWith(suffix))
      .flatMap { p =>
        val name = p.getFileName.toString.stripSuffix(suffix)
        if (name.length == 20 && name.forall(_.isDigit)) Some(name.toLong -> p)
        else None
      }.toSeq.sortBy(_._1)

  /** Highest committed version, if any. */
  def latestVersion: Option[Long] = listLog(".json").lastOption.map(_._1)

  // ---- snapshot reconstruction ----------------------------------------

  private final case class AddFile(path: String, partitionValues: Map[String, String],
      statsJson: Option[String] = None)
  private final case class Snapshot(version: Long, schema: StructType,
      partitionColumns: Seq[String], files: Seq[AddFile],
      txns: Map[String, Long])

  private def snapshotAt(version: Option[Long]): Snapshot = {
    val latest = latestVersion.getOrElse(throw new IllegalStateException(
      s"DeltaTable $root: no _delta_log commits"))
    val target = version.getOrElse(latest)
    require(target <= latest,
      s"DeltaTable $root: version $target > latest $latest")

    val cp = listLog(".checkpoint.parquet").filter(_._1 <= target).lastOption
    val active = mutable.LinkedHashMap.empty[String, AddFile]
    val txns = mutable.HashMap.empty[String, Long]
    var schemaJson: Option[String] = None
    var partCols: Seq[String] = Nil
    var minReader = 1

    cp.foreach { case (_, p) =>
      // The checkpoint is parquet — the unbounded part of the log rides
      // the columnar scan; only (path, partitionValues) land on the
      // driver, one row per LIVE file.
      val spark = SparkSession.active
      val df = spark.read.parquet(p.toString)
      val cols = df.schema.fieldNames.toSet
      if (cols.contains("protocol"))
        df.select("protocol.minReaderVersion").na.drop().collect()
          .foreach(r => minReader = math.max(minReader, r.getInt(0)))
      if (cols.contains("metaData"))
        df.select("metaData.schemaString", "metaData.partitionColumns")
          .na.drop("all").collect().foreach { r =>
            if (!r.isNullAt(0)) schemaJson = Some(r.getString(0))
            if (!r.isNullAt(1)) partCols = r.getSeq[String](1)
          }
      if (cols.contains("add")) {
        val addCols = df.schema("add").dataType
          .asInstanceOf[StructType].fieldNames.toSet
        val statsSel =
          if (addCols.contains("stats")) df.col("add.stats")
          else org.apache.spark.sql.functions.lit(null).cast(StringType)
        df.select(df.col("add.path"), df.col("add.partitionValues"),
            statsSel.as("stats")).na.drop("all").collect()
          .foreach { r =>
            if (!r.isNullAt(0)) {
              val path = decodePath(r.getString(0))
              val pv = if (r.isNullAt(1)) Map.empty[String, String]
                       else r.getMap[String, String](1).toMap
              val st = if (r.isNullAt(2)) None else Some(r.getString(2))
              active(path) = AddFile(path, pv, st)
            }
          }
      }
      if (cols.contains("txn"))
        df.select("txn.appId", "txn.version").na.drop("all").collect()
          .foreach { r =>
            if (!r.isNullAt(0) && !r.isNullAt(1))
              txns(r.getString(0)) = math.max(
                txns.getOrElse(r.getString(0), Long.MinValue), r.getLong(1))
          }
      // checkpoint `remove` rows are expired tombstones — by protocol
      // they are NOT part of the live set; nothing to replay.
    }

    val from = cp.map(_._1 + 1).getOrElse(0L)
    val commits = listLog(".json").filter { case (v, _) => v >= from && v <= target }
    require(commits.map(_._1) == (from to target),
      s"DeltaTable $root: log gap — need versions $from..$target, " +
        s"have ${commits.map(_._1).mkString(",")}")

    val mapper = new ObjectMapper
    commits.foreach { case (_, p) =>
      Files.readAllLines(p).asScala.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        val add = node.get("add")
        val remove = node.get("remove")
        val meta = node.get("metaData")
        val protocol = node.get("protocol")
        if (protocol != null && protocol.hasNonNull("minReaderVersion"))
          minReader = math.max(minReader, protocol.get("minReaderVersion").asInt)
        if (meta != null) {
          if (meta.hasNonNull("schemaString"))
            schemaJson = Some(meta.get("schemaString").asText)
          if (meta.hasNonNull("partitionColumns"))
            partCols = meta.get("partitionColumns").elements.asScala
              .map(_.asText).toSeq
        }
        if (add != null && add.hasNonNull("path")) {
          val path = decodePath(add.get("path").asText)
          val st = if (add.hasNonNull("stats")) Some(add.get("stats").asText)
                   else None
          active(path) = AddFile(path, partitionValuesOf(add), st)
        }
        if (remove != null && remove.hasNonNull("path"))
          active.remove(decodePath(remove.get("path").asText))
        val txn = node.get("txn")
        if (txn != null && txn.hasNonNull("appId") && txn.hasNonNull("version")) {
          val app = txn.get("appId").asText
          txns(app) = math.max(txns.getOrElse(app, Long.MinValue),
            txn.get("version").asLong)
        }
      }
    }

    require(minReader <= 1,
      s"DeltaTable $root: minReaderVersion $minReader requires reader " +
        "features (column mapping / deletion vectors) this reader does not " +
        "implement — refusing to mis-read the table")
    val schema = schemaJson.map(s => DataType.fromJson(s).asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(
        s"DeltaTable $root: no metaData action found up to v$target"))
    Snapshot(target, schema, partCols, active.values.toSeq, txns.toMap)
  }

  /** Highest committed `txn` version for a writer appId (the protocol's
    * idempotent-write primitive), or None if the writer never committed
    * (or the table is empty). */
  def txnVersion(appId: String): Option[Long] =
    if (latestVersion.isEmpty) None
    else snapshotAt(None).txns.get(appId)

  private def partitionValuesOf(add: JsonNode): Map[String, String] = {
    val pv = add.get("partitionValues")
    if (pv == null || pv.isNull) Map.empty
    else pv.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap
  }

  /** Read the table at `version` (default: latest). Output columns are
    * exactly `schemaString`'s, in order and type — partition columns are
    * recovered from the Hive directory layout and cast back. */
  def read(spark: SparkSession, version: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val snap = snapshotAt(version)
    readFiles(spark, snap.schema, snap.partitionColumns, snap.files.map(_.path))
  }

  private def readFiles(spark: SparkSession, schema: StructType,
      partitionColumns: Seq[String], relPaths: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (relPaths.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    // absolute paths so `basePath` and the file list qualify identically
    val absRoot = Paths.get(root).toAbsolutePath.toString
    val paths = relPaths.map(f => Paths.get(absRoot, f).toString)
    val dataSchema = StructType(
      schema.filterNot(f => partitionColumns.contains(f.name)))
    val raw =
      if (partitionColumns.isEmpty)
        spark.read.schema(dataSchema).parquet(paths: _*)
      else
        spark.read.option("basePath", absRoot).schema(dataSchema).parquet(paths: _*)
    raw.select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  // ---- write side ------------------------------------------------------

  /** Commit `df` as a full replacement snapshot (removes every live file
    * of the previous version). Returns the committed version.
    * `statsFor` columns get per-file (numRecords, minValues, maxValues)
    * in the protocol's `add.stats` JSON — the data-skipping index
    * [[readWhere]] prunes by. */
  def overwrite(df: DataFrame, partitionBy: Seq[String] = Nil,
      statsFor: Seq[String] = Nil): Long = {
    val prev = latestVersion
    val removed = prev.map(v => snapshotAt(Some(v)).files).getOrElse(Nil)
    commit(df, partitionBy, removed.map(_.path), "WRITE",
      Map("mode" -> "Overwrite"), statsFor = statsFor)
  }

  /** Append `df`'s rows as new files. Returns the committed version. */
  def append(df: DataFrame, partitionBy: Seq[String] = Nil,
      statsFor: Seq[String] = Nil): Long =
    commit(df, partitionBy, Nil, "WRITE", Map("mode" -> "Append"),
      statsFor = statsFor)

  /** Exactly-once append for replayable writers (the protocol's `txn`
    * action): if `appId` has already committed a txn version ≥
    * `version`, the write is a NO-OP (returns None) — a streaming
    * `foreachBatch` replaying a landed micro-batch cannot double-append.
    * The check and the commit race window is closed by the atomic
    * publish: a racer that lands the same txn first makes THIS commit's
    * version collide and fail loudly, never double-apply silently. */
  def appendIdempotent(df: DataFrame, appId: String, version: Long,
      partitionBy: Seq[String] = Nil): Option[Long] =
    if (txnVersion(appId).exists(_ >= version)) None
    else Some(commit(df, partitionBy, Nil, "WRITE", Map("mode" -> "Append"),
      txn = Some((appId, version))))

  /** OPTIMIZE-style compaction: rewrite the current live file set into
    * `numFiles` files per partition-value combination WITHOUT changing
    * the data — removes + adds carry `dataChange=false`, so CDC
    * consumers ([[changes]]) skip the rewrite entirely, exactly as the
    * protocol prescribes. Small-file compaction is what keeps a 100 TB
    * streaming-ingested table scannable: thousands of micro-batch files
    * fold into scan-sized ones while readers stay snapshot-isolated. */
  def compact(numFiles: Int = 1): Long = {
    val spark = SparkSession.active
    val snap = snapshotAt(None)
    val current = read(spark)
    val compacted =
      if (snap.partitionColumns.isEmpty) current.repartition(numFiles)
      else current.repartition(numFiles,
        snap.partitionColumns.map(org.apache.spark.sql.functions.col): _*)
    commit(compacted, snap.partitionColumns, snap.files.map(_.path),
      "OPTIMIZE", Map.empty, dataChange = false)
  }

  private def commit(df: DataFrame, partitionBy: Seq[String],
      removePaths: Seq[String], op: String, opParams: Map[String, String],
      txn: Option[(String, Long)] = None, dataChange: Boolean = true,
      statsFor: Seq[String] = Nil): Long = {
    val v = latestVersion.map(_ + 1).getOrElse(0L)
    val token = java.util.UUID.randomUUID.toString.take(8)
    val scratch = Paths.get(root, s".tmp-delta-$token")
    val writer = if (partitionBy.isEmpty) df.write else df.write.partitionBy(partitionBy: _*)
    writer.mode("overwrite").parquet(scratch.toString)

    // move parts into the table root, keeping the Hive partition dirs
    val moved = mutable.ArrayBuffer.empty[(String, Long, Map[String, String])]
    def walk(dir: Path, rel: List[String], pv: Map[String, String]): Unit =
      Files.list(dir).iterator.asScala.toSeq.sortBy(_.toString).foreach { p =>
        val name = p.getFileName.toString
        if (Files.isDirectory(p) && name.contains("=")) {
          val Array(k, raw) = name.split("=", 2)
          val value = java.net.URLDecoder.decode(raw, "UTF-8")
          walk(p, name :: rel, pv + (k -> value))
        } else if (name.endsWith(".parquet")) {
          val unique = f"part-${moved.size}%05d-$token-v$v.snappy.parquet"
          val relPath = (unique :: rel).reverse.mkString("/")
          val dest = Paths.get(root, relPath)
          Files.createDirectories(dest.getParent)
          Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
          moved += ((relPath, Files.size(dest), pv))
        }
      }
    walk(scratch, Nil, Map.empty)
    deleteRecursively(scratch)

    // Per-file stats for the data-skipping index: ONE map-side-combined
    // aggregate over the JUST-WRITTEN files (O(new data), grouped by
    // input_file_name) — the write-time stats pass every Delta writer
    // performs. Keyed by the part-file NAME (unique per commit token).
    val statsByName: Map[String, String] =
      if (statsFor.isEmpty || moved.isEmpty) Map.empty
      else {
        val spark = df.sparkSession
        val absRoot = Paths.get(root).toAbsolutePath.toString
        val paths = moved.map { case (rel, _, _) =>
          Paths.get(absRoot, rel).toString }
        import org.apache.spark.sql.functions.{col => fcol, count => fcount,
          input_file_name, lit => flit, max => fmax, min => fmin}
        val reader = if (partitionBy.isEmpty) spark.read
                     else spark.read.option("basePath", absRoot)
        val aggs = fcount(flit(1)).as("_nrec") +: statsFor.flatMap(c =>
          Seq(fmin(fcol(c)).as(s"_min_$c"), fmax(fcol(c)).as(s"_max_$c")))
        val m = new ObjectMapper
        reader.parquet(paths.toSeq: _*)
          .groupBy(input_file_name().as("_file"))
          .agg(aggs.head, aggs.tail: _*).collect()
          .map { r =>
            val st = m.createObjectNode
            st.put("numRecords", r.getLong(1))
            val mins = st.putObject("minValues")
            val maxs = st.putObject("maxValues")
            statsFor.zipWithIndex.foreach { case (c, i) =>
              putScalar(mins, c, r.get(2 + 2 * i))
              putScalar(maxs, c, r.get(3 + 2 * i))
            }
            r.getString(0).split('/').last -> m.writeValueAsString(st)
          }.toMap
      }

    val mapper = new ObjectMapper
    val now = System.currentTimeMillis
    val actions = mutable.ArrayBuffer.empty[String]

    val ci = mapper.createObjectNode
    ci.put("timestamp", now).put("operation", op)
    val params = ci.putObject("operationParameters")
    opParams.foreach { case (k, x) => params.put(k, x) }
    actions += wrap(mapper, "commitInfo", ci)

    if (v == 0L) {
      val proto = mapper.createObjectNode
      proto.put("minReaderVersion", 1).put("minWriterVersion", 2)
      actions += wrap(mapper, "protocol", proto)
    }
    // Schema evolution, the Delta mergeSchema contract: an append whose
    // frame adds columns records the MERGED schema in a fresh metaData
    // action — older files then serve the new columns as nulls (the
    // parquet reader fills absent footer columns); an append may also
    // OMIT existing columns (its files serve them as nulls). Type
    // conflicts fail loudly. Overwrites replace the schema outright.
    val isOverwrite = removePaths.nonEmpty && dataChange
    val currentSchema: Option[StructType] =
      if (v == 0L) None else Some(snapshotAt(Some(v - 1)).schema)
    val recordedSchema: StructType = currentSchema match {
      case None => df.schema
      case Some(_) if isOverwrite => df.schema
      case Some(current) =>
        current.foreach { f =>
          df.schema.find(_.name == f.name).foreach { n =>
            if (n.dataType != f.dataType) throw new IllegalStateException(
              s"DeltaTable $root: column ${f.name} type conflict — table " +
                s"has ${f.dataType.simpleString}, append has " +
                s"${n.dataType.simpleString}")
          }
        }
        val oldNames = current.fieldNames.toSet
        StructType(current ++ df.schema.filterNot(f => oldNames(f.name)))
    }
    val schemaChanged = currentSchema.exists(_.json != recordedSchema.json)
    if (v == 0L || isOverwrite || schemaChanged) {
      actions += wrap(mapper, "metaData",
        metaNode(mapper, recordedSchema, partitionBy, now))
    }
    txn.foreach { case (appId, tv) =>
      val tx = mapper.createObjectNode
      tx.put("appId", appId).put("version", tv).put("lastUpdated", now)
      actions += wrap(mapper, "txn", tx)
    }
    removePaths.foreach { p =>
      val rm = mapper.createObjectNode
      rm.put("path", p).put("deletionTimestamp", now).put("dataChange", dataChange)
      actions += wrap(mapper, "remove", rm)
    }
    moved.foreach { case (path, size, pv) =>
      val add = mapper.createObjectNode
      add.put("path", path)
      val pvNode = add.putObject("partitionValues")
      pv.foreach { case (k, x) => pvNode.put(k, x) }
      add.put("size", size).put("modificationTime", now)
        .put("dataChange", dataChange)
      statsByName.get(path.split('/').last)
        .foreach(s => add.put("stats", s))
      actions += wrap(mapper, "add", add)
    }
    publish(v, actions.toSeq)
    v
  }

  private def metaNode(mapper: ObjectMapper, schema: StructType,
      partitionBy: Seq[String], now: Long): ObjectNode = {
    val meta = mapper.createObjectNode
    meta.put("id", java.util.UUID.nameUUIDFromBytes(root.getBytes("UTF-8")).toString)
    val fmt = meta.putObject("format")
    fmt.put("provider", "parquet"); fmt.putObject("options")
    meta.put("schemaString", schema.json)
    val pc = meta.putArray("partitionColumns")
    partitionBy.foreach(pc.add)
    meta.putObject("configuration")
    meta.put("createdTime", now)
    meta
  }

  private def wrap(mapper: ObjectMapper, key: String, node: ObjectNode): String = {
    val outer = mapper.createObjectNode
    outer.set[ObjectNode](key, node)
    mapper.writeValueAsString(outer)
  }

  private[lake] def publish(v: Long, actions: Seq[String]): Unit = {
    Files.createDirectories(logDir)
    val tmp = logDir.resolve(s".tmp-${java.util.UUID.randomUUID.toString.take(8)}")
    Files.write(tmp, (actions.mkString("\n") + "\n").getBytes("UTF-8"))
    try Files.createLink(commitPath(v), tmp) // atomic, fails if v exists
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"DeltaTable $root: concurrent commit already published v$v", e)
    } finally Files.deleteIfExists(tmp)
  }

  /** Write a parquet checkpoint of the CURRENT latest snapshot plus the
    * `_last_checkpoint` pointer, so future reads replay only the JSON
    * tail after it. Idempotent: re-checkpointing a version replaces the
    * derived files (checkpoints are cache, commits are truth). */
  def checkpoint(): Long = {
    val spark = SparkSession.active
    val snap = snapshotAt(None)
    val rows: Seq[Row] = {
      val protoRow = Row(Row(1, 2), null, null, null)
      val metaRow = Row(null,
        Row(java.util.UUID.nameUUIDFromBytes(root.getBytes("UTF-8")).toString,
          Row("parquet"), snap.schema.json, snap.partitionColumns,
          System.currentTimeMillis), null, null)
      val addRows = snap.files.map(f =>
        Row(null, null,
          Row(f.path, f.partitionValues, 0L, 0L, true, f.statsJson.orNull),
          null))
      // txn water-marks MUST ride the checkpoint: replay starts after it,
      // so idempotent writers would forget their high-water mark otherwise
      val txnRows = snap.txns.toSeq.sortBy(_._1).map { case (app, tv) =>
        Row(null, null, null, Row(app, tv, 0L))
      }
      protoRow +: metaRow +: (addRows ++ txnRows)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), checkpointSchema)
    val token = java.util.UUID.randomUUID.toString.take(8)
    val scratch = Paths.get(root, s".tmp-cp-$token")
    df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val part = Files.list(scratch).iterator.asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("checkpoint write produced no part"))
    Files.move(part, checkpointPath(snap.version),
      StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(scratch)
    val mapper = new ObjectMapper
    val lc = mapper.createObjectNode
    lc.put("version", snap.version).put("size", rows.size)
    val tmp = logDir.resolve(s".tmp-lc-$token")
    Files.write(tmp, (mapper.writeValueAsString(lc) + "\n").getBytes("UTF-8"))
    Files.move(tmp, logDir.resolve("_last_checkpoint"),
      StandardCopyOption.REPLACE_EXISTING)
    snap.version
  }

  // ---- stats-envelope pruning (shared by merge/readWhere/delete) -------

  /** Stats comparison: numbers numerically, everything else lexically
    * (the md5-free subset of Delta's typed stats). */
  private def cmpStat(stat: JsonNode, bound: Any): Int = bound match {
    case n: Number if stat.isNumber =>
      java.lang.Double.compare(stat.asDouble, n.doubleValue)
    case _ => stat.asText.compareTo(bound.toString)
  }

  private def statBounds(mapper: ObjectMapper, f: AddFile,
      column: String): Option[(JsonNode, JsonNode)] =
    f.statsJson.flatMap { s =>
      val node = mapper.readTree(s)
      def bound(kind: String): Option[JsonNode] =
        Option(node.get(kind)).flatMap(m => Option(m.get(column)))
          .filterNot(_.isNull)
      bound("minValues").zip(bound("maxValues"))
    }

  /** Envelope may intersect [lo, hi] — statless files conservatively
    * TRUE (must scan), so pruning never loses rows. */
  private def mayIntersect(mapper: ObjectMapper, f: AddFile, column: String,
      lo: Any, hi: Any): Boolean =
    statBounds(mapper, f, column) match {
      case Some((mn, mx)) => cmpStat(mx, lo) >= 0 && cmpStat(mn, hi) <= 0
      case None => true
    }

  /** Envelope provably inside [lo, hi] — statless files conservatively
    * FALSE (cannot prove containment without stats). */
  private def containedIn(mapper: ObjectMapper, f: AddFile, column: String,
      lo: Any, hi: Any): Boolean =
    statBounds(mapper, f, column) match {
      case Some((mn, mx)) => cmpStat(mn, lo) >= 0 && cmpStat(mx, hi) <= 0
      case None => false
    }

  /** File-pruned DELETE of rows with `column` in [lo, hi] — the Delta
    * DELETE cost model on the stats index, three file classes in ONE
    * atomic commit:
    *   - envelope MISSES the range → untouched (never opened);
    *   - envelope provably INSIDE the range → remove-only action — no
    *     read, no rewrite: deleting one day from a day-clustered 100 TB
    *     table is pure metadata;
    *   - boundary files → read, matching rows filtered out, survivors
    *     rewritten (with fresh stats, so the skipping index stays live).
    * Rows whose `column` is NULL never match a range predicate and are
    * kept, per SQL semantics. Statless files are conservatively treated
    * as boundary files — always exact, never fast-dropped. */
  def delete(column: String, lo: Any, hi: Any): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    val spark = SparkSession.active
    val snap = snapshotAt(None)
    val mapper = new ObjectMapper
    val cand = snap.files.filter(f => mayIntersect(mapper, f, column, lo, hi))
    if (cand.isEmpty) return snap.version
    val (whole, partial) = cand.partition(f =>
      containedIn(mapper, f, column, lo, hi))
    val survivors = readFiles(spark, snap.schema, snap.partitionColumns,
        partial.map(_.path))
      .filter(col(column).isNull || col(column) < lit(lo) || col(column) > lit(hi))
    commit(survivors, snap.partitionColumns, cand.map(_.path), "DELETE",
      Map("predicate" -> s"$column BETWEEN $lo AND $hi",
        "wholeFilesDropped" -> whole.size.toString),
      statsFor = Seq(column))
  }

  /** RESTORE the table to `version` as a NEW commit (the Delta RESTORE
    * command): removes files added since the target snapshot and
    * re-adds the target's files that are no longer live — pure
    * metadata, no data rewrite. The target's files must still exist on
    * disk (a vacuumed-out snapshot fails LOUDLY up front, never
    * half-restores). History is preserved: the restore is itself a
    * commit, so time travel to the intermediate versions still works,
    * and a second restore can undo the first. Re-added files keep
    * their stats, so data skipping survives the round trip. */
  def restore(version: Long): Long = {
    val target = snapshotAt(Some(version))
    val cur = snapshotAt(None)
    val curPaths = cur.files.map(_.path).toSet
    val tgtPaths = target.files.map(_.path).toSet
    val absRoot = Paths.get(root).toAbsolutePath
    val missing = target.files.filterNot(f => Files.exists(absRoot.resolve(f.path)))
    require(missing.isEmpty,
      s"DeltaTable $root: restore to v$version needs vacuumed-out files: " +
        missing.map(_.path).mkString(", "))
    val mapper = new ObjectMapper
    val now = System.currentTimeMillis
    val actions = mutable.ArrayBuffer.empty[String]
    val ci = mapper.createObjectNode
    ci.put("timestamp", now).put("operation", "RESTORE")
    ci.putObject("operationParameters").put("version", version.toString)
    actions += wrap(mapper, "commitInfo", ci)
    if (target.schema.json != cur.schema.json ||
        target.partitionColumns != cur.partitionColumns)
      actions += wrap(mapper, "metaData",
        metaNode(mapper, target.schema, target.partitionColumns, now))
    cur.files.filterNot(f => tgtPaths(f.path)).foreach { f =>
      val rm = mapper.createObjectNode
      rm.put("path", f.path).put("deletionTimestamp", now).put("dataChange", true)
      actions += wrap(mapper, "remove", rm)
    }
    target.files.filterNot(f => curPaths(f.path)).foreach { f =>
      val add = mapper.createObjectNode
      add.put("path", f.path)
      val pvNode = add.putObject("partitionValues")
      f.partitionValues.foreach { case (k, x) => pvNode.put(k, x) }
      add.put("size", Files.size(absRoot.resolve(f.path)))
        .put("modificationTime", now).put("dataChange", true)
      f.statsJson.foreach(s => add.put("stats", s))
      actions += wrap(mapper, "add", add)
    }
    val v = cur.version + 1
    publish(v, actions.toSeq)
    v
  }

  /** OPTIMIZE ZORDER BY — rewrite the live file set along the Morton
    * curve of `(dimA, dimB)` ([[ZOrder.withZValue]]) in a
    * `dataChange=false` commit with fresh per-file stats on BOTH dims:
    * each output file owns one contiguous curve segment, i.e. a bounded
    * RECTANGLE of (A, B) space in its stats envelope, so [[readWhere]]
    * prunes selective filters on EITHER dimension (a plain range sort
    * prunes only its one column). Snapshot is bit-identical — CDC
    * consumers skip the rewrite like any OPTIMIZE. */
  def optimizeZOrder(dimA: String, dimB: String, bits: Int = 12,
      numFiles: Int = 8): Long = {
    import org.apache.spark.sql.functions.col
    val spark = SparkSession.active
    val snap = snapshotAt(None)
    require(snap.partitionColumns.isEmpty,
      s"DeltaTable $root: z-order within Hive partitions not supported — " +
        "compact per partition instead")
    val zordered = ZOrder.withZValue(read(spark), dimA, dimB, bits)
      .repartitionByRange(numFiles, col("zvalue"))
      .sortWithinPartitions("zvalue")
      .drop("zvalue")
    commit(zordered, Nil, snap.files.map(_.path), "OPTIMIZE",
      Map("zOrderBy" -> s"""["$dimA","$dimB"]"""), dataChange = false,
      statsFor = Seq(dimA, dimB))
  }

  /** File-pruned MERGE (upsert by key) — the Delta MERGE INTO cost
    * model: only files whose stats envelope for `keyCol` intersects the
    * source's [min, max] key range (plus statless files, conservatively)
    * are REWRITTEN; every other live file is untouched — on a
    * range-clustered 100 TB table an upsert of one day's keys rewrites
    * one day's files, not the table. The rewrite replaces matched rows
    * with the source's and appends unmatched source rows; the whole
    * merge is ONE atomic commit (removes for the candidate files, adds
    * for their rewrite + the new rows), so readers see the old or the
    * new snapshot, never a half-merge. Source schema must match the
    * table's (use append for evolving merges). */
  def merge(source: DataFrame, keyCol: String): Long = {
    import org.apache.spark.sql.functions.{col, max => fmax, min => fmin}
    val spark = source.sparkSession
    val snap = snapshotAt(None)
    require(source.columns.toSeq == snap.schema.fieldNames.toSeq,
      s"DeltaTable $root: merge source columns ${source.columns.toSeq} " +
        s"!= table ${snap.schema.fieldNames.toSeq}")
    val keyed = source.localCheckpoint(false)
    val Array(lo, hi) = keyed.agg(fmin(col(keyCol)), fmax(col(keyCol)))
      .collect()(0).toSeq.toArray
    if (lo == null) return snap.version // empty source: no-op
    val mapper = new ObjectMapper
    val cand = snap.files.filter(f => mayIntersect(mapper, f, keyCol, lo, hi))
    val existing = readFiles(spark, snap.schema, snap.partitionColumns,
      cand.map(_.path))
    // matched rows take the source version; unmatched keep their row.
    // Rows in UNTOUCHED files cannot match: the key envelope proved it.
    val rewritten = existing
      .join(keyed.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .unionByName(keyed)
      .select(snap.schema.fieldNames.map(col): _*)
    commit(rewritten, snap.partitionColumns, cand.map(_.path), "MERGE",
      Map("predicate" -> s"$keyCol in [${lo}, ${hi}]"),
      statsFor = Seq(keyCol))
  }

  /** Stats-pruned range read — Delta's DATA-SKIPPING: only files whose
    * `add.stats` [min, max] envelope for `column` intersects [lo, hi]
    * are scanned (files without stats are conservatively kept, so the
    * result is always exact); the residual predicate still applies on
    * the survivors. On a range-clustered 100 TB table this is the read
    * path that touches 1 file in 10⁴ instead of the table — file-level
    * skipping BEFORE the scan, on top of parquet's own row-group
    * pruning after it. Numbers compare numerically, everything else
    * lexically (the md5-free subset of Delta's typed stats). */
  def readWhere(spark: SparkSession, column: String, lo: Any, hi: Any,
      version: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val snap = snapshotAt(version)
    val mapper = new ObjectMapper
    val survivors = snap.files.filter(f =>
      mayIntersect(mapper, f, column, lo, hi))
    readFiles(spark, snap.schema, snap.partitionColumns,
        survivors.map(_.path))
      .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  /** Change-data feed over `(fromVersion, toVersion]`: every row added
    * or removed by commits in the range, tagged `_change_type`
    * (`insert` | `delete`) and `_commit_version` — file-level CDC, the
    * same contract as [[TxTable.changes]]. Actions with
    * `dataChange=false` (compaction rewrites) are SKIPPED, per the
    * protocol — an OPTIMIZE between two versions contributes nothing to
    * the feed. The plan reads ONLY the changed files, so incremental
    * consumers process deltas, never the table. */
  def changes(spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(fromVersion <= toVersion,
      s"DeltaTable $root: changes($fromVersion, $toVersion) reversed")
    val latest = latestVersion.getOrElse(throw new IllegalStateException(
      s"DeltaTable $root: no _delta_log commits"))
    require(toVersion <= latest,
      s"DeltaTable $root: changes to v$toVersion > latest $latest")
    val mapper = new ObjectMapper
    val snapCache = mutable.HashMap.empty[Long, Snapshot]
    def snapOf(v: Long) = snapCache.getOrElseUpdate(v, snapshotAt(Some(v)))
    val slices = ((fromVersion + 1) to toVersion).flatMap { v =>
      val adds = mutable.ArrayBuffer.empty[String]
      val removes = mutable.ArrayBuffer.empty[String]
      Files.readAllLines(commitPath(v)).asScala.filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        val add = node.get("add")
        if (add != null && add.hasNonNull("path") &&
            (!add.has("dataChange") || add.get("dataChange").asBoolean))
          adds += decodePath(add.get("path").asText)
        val rm = node.get("remove")
        if (rm != null && rm.hasNonNull("path") &&
            (!rm.has("dataChange") || rm.get("dataChange").asBoolean))
          removes += decodePath(rm.get("path").asText)
      }
      val snap = snapOf(v)
      def slice(paths: Seq[String], kind: String) =
        if (paths.isEmpty) None
        else Some(readFiles(spark, snap.schema, snap.partitionColumns, paths.toSeq)
          .withColumn("_change_type", lit(kind))
          .withColumn("_commit_version", lit(v)))
      slice(adds.toSeq, "insert").toSeq ++ slice(removes.toSeq, "delete")
    }
    slices.reduceOption(_ unionByName _).getOrElse {
      val schema = snapOf(toVersion).schema
        .add("_change_type", StringType).add("_commit_version", LongType)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }
  }

  /** Delete data files referenced by NONE of the newest `keepVersions`
    * snapshots (tombstoned files past retention — the VACUUM contract).
    * Commits stay (the log is small and checkpoint-compacted); reading a
    * vacuumed-out old version fails at scan time on the missing file,
    * never returns partial data silently. Returns files deleted. */
  def vacuum(keepVersions: Int = 1): Int = {
    require(keepVersions >= 1, s"vacuum keepVersions $keepVersions < 1")
    val latest = latestVersion.getOrElse(return 0)
    val keepFrom = math.max(0L, latest - keepVersions + 1)
    val live = (keepFrom to latest).flatMap(v =>
      snapshotAt(Some(v)).files.map(_.path)).toSet
    val rootPath = Paths.get(root)
    var deleted = 0
    def walk(dir: Path): Unit =
      Files.list(dir).iterator.asScala.toSeq.foreach { p =>
        val name = p.getFileName.toString
        if (Files.isDirectory(p)) { if (name != "_delta_log") walk(p) }
        else if (name.endsWith(".parquet") &&
            !live.contains(rootPath.relativize(p).toString.replace('\\', '/'))) {
          Files.delete(p); deleted += 1
        }
      }
    walk(rootPath)
    deleted
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator.asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
}

object DeltaTable {
  /** JSON scalar for a stats value: numbers stay numbers, null stays
    * null, everything else serializes as its string form (dates,
    * timestamps, decimals — lexically comparable where it matters). */
  private def putScalar(node: ObjectNode, key: String, v: Any): Unit = v match {
    case null                 => node.putNull(key)
    case x: java.lang.Long    => node.put(key, x.longValue)
    case x: java.lang.Integer => node.put(key, x.intValue)
    case x: java.lang.Short   => node.put(key, x.intValue)
    case x: java.lang.Byte    => node.put(key, x.intValue)
    case x: java.lang.Double  => node.put(key, x.doubleValue)
    case x: java.lang.Float   => node.put(key, x.doubleValue)
    case x: java.math.BigDecimal => node.put(key, x)
    case x                    => node.put(key, x.toString)
  }

  /** Percent-decoding for add/remove paths (the protocol stores them as
    * relative URIs). `+` is NOT a space in a URI path, so protect it
    * from URLDecoder's form semantics. */
  private[lake] def decodePath(p: String): String =
    java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")

  /** Checkpoint parquet schema — the protocol's action columns, subset
    * we emit. Readers (ours included) select fields by name and ignore
    * the rest. */
  private[lake] val checkpointSchema: StructType = StructType(Seq(
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("createdTime", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))),
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType),
      StructField("lastUpdated", LongType))))))
}
