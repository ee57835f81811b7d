package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Minimal single-writer transactional table: manifest-file commits over
  * immutable parquet data files — the "Parquet/Delta" capability the
  * reference delegates to Databricks (BASELINE.json approach line; no
  * Delta jars exist in this zero-egress environment, so the commit
  * protocol is implemented directly).
  *
  * Layout:
  * {{{
  *   <root>/_commits/v00000001.json   // one manifest per committed version
  *   <root>/data/v1-<uuid>-<i>.parquet
  * }}}
  *
  * Protocol (the Delta-log shape, single-writer):
  *  1. WRITE: new data files land in `data/` under version-prefixed unique
  *     names. Data files are IMMUTABLE — never rewritten, never reused
  *     across versions; an overwrite just points the next manifest at a
  *     fresh file set.
  *  2. PUBLISH: the manifest (the version's complete file list) is written
  *     to a temp name, then linked into place as `v{N}.json` with an
  *     atomic create-if-absent (hard link, which FAILS if the target
  *     exists — a concurrent writer racing to the same version loses
  *     loudly instead of silently clobbering).
  *  3. READ: resolve the highest committed version (or an explicit one for
  *     time travel), read exactly its file list. A reader holding version
  *     N is isolated from every later commit because N's files are
  *     immutable and vacuum retains every file the LATEST manifest
  *     references plus everything younger than `keepVersions`.
  *
  * Crash safety: a writer dying before PUBLISH leaves orphan data files
  * and no manifest — invisible to readers, the previous snapshot stays
  * live, and a re-run converges (next version number, fresh files);
  * [[TxTable.vacuum]] reclaims the orphans.
  *
  * Scale notes: the manifest holds file NAMES only (a 100 TB table at
  * 1 GB/file is a ~10^5-line JSON — driver-trivial, like the Delta log);
  * data writes are full-parallel Spark jobs, only the rename/link step is
  * driver-side metadata. Atomic create-if-absent needs a POSIX/HDFS-class
  * store; on S3-class stores the publish step would ride a conditional
  * PUT, same as Delta's LogStore. */
final case class TxTable(root: String) {

  private def commitDir: Path = Paths.get(root, "_commits")
  private def dataDir: Path = Paths.get(root, "data")

  private def manifestPath(v: Long): Path =
    commitDir.resolve(f"v$v%08d.json")

  private def listDir(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Nil
    else {
      val s = Files.list(p)
      try s.iterator.asScala.toSeq finally s.close()
    }

  /** Highest committed version, if any commit exists. */
  def latestVersion: Option[Long] =
    listDir(commitDir)
      .flatMap(p => "^v(\\d{8})\\.json$".r
        .findFirstMatchIn(p.getFileName.toString).map(_.group(1).toLong))
      .maxOption

  /** File names committed at `v` (manifest body: one data-file name per
    * line after the header line(s) — a `schema=` line is metadata, not a
    * file). */
  private[lake] def filesAt(v: Long): Seq[String] = {
    val lines = Files.readAllLines(manifestPath(v)).asScala.toSeq
    lines.drop(1).filterNot(_.startsWith("schema="))
  }

  /** The snapshot schema recorded in `v`'s manifest header, if present
    * (manifests written before schema tracking carry none — readers fall
    * back to parquet footer inference). */
  def schemaAt(v: Long): Option[StructType] = {
    val lines = Files.readAllLines(manifestPath(v)).asScala.toSeq
    lines.drop(1).find(_.startsWith("schema="))
      .map(l => DataType.fromJson(l.stripPrefix("schema=")).asInstanceOf[StructType])
  }

  /** Snapshot read at `version` (default: latest). The returned frame is
    * pinned to that version's immutable file list — later commits cannot
    * change what it reads — and to that version's OWN recorded schema:
    * files written before a column was added are read with nulls for the
    * missing column (merge-by-name, the `mergeSchema` semantics without
    * ever rewriting history), and time travel to an old version sees that
    * version's narrower schema, not today's. */
  def read(spark: SparkSession, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"TxTable $root has no committed version"))
    val files = filesAt(v).map(f => dataDir.resolve(f).toString)
    (schemaAt(v), files) match {
      // an empty snapshot (e.g. a freshly-initialized accumulator table:
      // zero rows can mean zero part files under AQE) is readable as an
      // empty relation of the recorded schema
      case (Some(s), Nil) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case (None, Nil) =>
        throw new IllegalStateException(s"TxTable $root: v$v holds no data files")
      // explicit schema: the parquet reader fills columns absent from a
      // file's footer with nulls — old files serve new columns for free
      case (Some(s), _) => spark.read.schema(s).parquet(files: _*)
      case (None, _)    => spark.read.parquet(files: _*)
    }
  }

  /** Commit `df` as a full replacement snapshot. Returns the version. */
  def overwrite(df: DataFrame): Long = {
    val v = latestVersion.getOrElse(0L) + 1
    val moved = writeData(df, v)
    publish(v, moved, df.schema)
    v
  }

  /** Commit `df` as new files ON TOP of the latest snapshot's files (the
    * append form: old files stay in the manifest). Fails loudly if a
    * concurrent writer took this version — see [[appendWithRetry]] for
    * the optimistic-concurrency form. Columns in `df` that the table has
    * never seen are ADDED to the snapshot schema (add-column evolution);
    * a type conflict on an existing column aborts. */
  def append(df: DataFrame): Long = {
    val base = latestVersion
    val v = base.getOrElse(0L) + 1
    val moved = writeData(df, v)
    publish(v, base.map(filesAt).getOrElse(Nil) ++ moved, mergedSchema(base, df))
    v
  }

  /** Append with optimistic concurrency, the Delta-LogStore shape: write
    * data files once, then loop on the publish step — on losing the
    * version race, re-resolve the latest version and re-validate that
    * every intervening commit COMMUTES with a blind append (appends only
    * ever add files; an intervening overwrite/compaction REMOVED files,
    * which conflicts — the snapshot this append logically lands on is
    * gone — so it aborts loudly rather than resurrecting replaced data).
    * The data files written in step 1 are never re-written across
    * retries; only the driver-side manifest link is retried. */
  def appendWithRetry(df: DataFrame, maxRetries: Int = 10): Long = {
    val base = latestVersion
    retryPublish(base, writeData(df, base.getOrElse(0L) + 1), df.schema, maxRetries)
  }

  /** The optimistic publish loop, package-private so the race tests can
    * inject a deterministic interleaving (a stale `base` after a
    * concurrent overwrite/append has already landed). */
  private[lake] def retryPublish(base: Option[Long], moved: Seq[String],
                                 dfSchema: StructType, maxRetries: Int = 10): Long = {
    val baseFiles = base.map(filesAt).getOrElse(Nil)
    var attempt = 0
    while (true) {
      val latest = latestVersion
      val latestFiles = latest.map(filesAt).getOrElse(Nil)
      val removed = baseFiles.toSet -- latestFiles.toSet
      if (removed.nonEmpty)
        throw new IllegalStateException(
          s"TxTable $root: append conflicts with a concurrent overwrite — " +
            s"base files ${removed.toSeq.sorted.take(3).mkString(", ")}… were " +
            "replaced since this append started")
      val v = latest.getOrElse(0L) + 1
      try {
        publish(v, latestFiles ++ moved, mergedSchemaOf(latest, dfSchema))
        return v
      } catch {
        case e: IllegalStateException if e.getCause.isInstanceOf[java.nio.file.FileAlreadyExistsException] =>
          attempt += 1
          if (attempt > maxRetries)
            throw new IllegalStateException(
              s"TxTable $root: gave up after $maxRetries publish retries", e)
        // else: loop — re-resolve latest and re-validate
      }
    }
    -1L // unreachable
  }

  /** The table schema after appending `df` on top of `base`: base fields
    * in order, then fields `df` adds (matched by name, case-sensitive —
    * the manifest is the source of truth, not a session's resolver). A
    * same-name field with a DIFFERENT type is a conflict: automatic type
    * widening silently degrades every reader, so it aborts. */
  private def mergedSchema(base: Option[Long], df: DataFrame): StructType =
    mergedSchemaOf(base, df.schema)

  /** Footer-inferred schema of a LEGACY snapshot (a manifest written
    * before schema tracking records no `schema=` line). Zero recorded
    * columns is NOT zero actual columns: merging an append against an
    * empty base would record only the incoming schema, and read() would
    * then apply that explicit schema to the carried-forward legacy files,
    * silently nulling every column the append omitted. */
  private def inferredSchemaAt(v: Long): StructType =
    SparkSession.getActiveSession match {
      case Some(spark) =>
        spark.read.parquet(
          filesAt(v).map(f => dataDir.resolve(f).toString): _*).schema
      case None =>
        throw new IllegalStateException(
          s"TxTable $root: v$v predates schema tracking and no active " +
            "SparkSession is available to infer its footer schema — " +
            "refusing to record an append schema that would shadow it")
    }

  private def mergedSchemaOf(base: Option[Long], incoming: StructType): StructType = {
    val old: Seq[StructField] =
      base.map(v => schemaAt(v).getOrElse(
          if (filesAt(v).isEmpty) StructType(Nil) else inferredSchemaAt(v)))
        .map(_.fields.toSeq).getOrElse(Nil)
    old.foreach { f =>
      incoming.fields.find(_.name == f.name).foreach { n =>
        if (n.dataType != f.dataType)
          throw new IllegalStateException(
            s"TxTable $root: column ${f.name} type conflict — table has " +
              s"${f.dataType.simpleString}, append has ${n.dataType.simpleString}")
      }
    }
    val oldNames = old.map(_.name).toSet
    // appended rows may omit old columns (nulls) and add new ones
    StructType(old ++ incoming.fields.filterNot(f => oldNames(f.name)))
  }

  /** The WRITE step alone: land `df`'s parts in `data/` under
    * version-prefixed unique names WITHOUT publishing a manifest —
    * package-private so the crash test can die between WRITE and
    * PUBLISH. Returns the landed file names. */
  private[graft] def writeData(df: DataFrame, v: Long): Seq[String] = {
    Files.createDirectories(dataDir)
    val token = java.util.UUID.randomUUID.toString.take(8)
    // land the job output in a scratch dir, then move each part into
    // data/ under a version-prefixed unique name (same-FS rename)
    val scratch = Paths.get(root, s".tmp-write-$token")
    df.write.mode("overwrite").parquet(scratch.toString)
    val parts = listDir(scratch)
      .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
    val moved = parts.zipWithIndex.map { case (p, i) =>
      val name = f"v$v-$token-$i%05d.parquet"
      Files.move(p, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      name
    }
    deleteRecursively(scratch)
    moved
  }

  /** The atomic publish step, exposed package-private so the crash test
    * can exercise "died between WRITE and PUBLISH". */
  private[lake] def publish(v: Long, files: Seq[String]): Unit =
    publish(v, files, None)

  private[lake] def publish(v: Long, files: Seq[String], schema: StructType): Unit =
    publish(v, files, Some(schema))

  private[lake] def publish(v: Long, files: Seq[String],
                            schema: Option[StructType]): Unit = {
    Files.createDirectories(commitDir)
    val tmp = commitDir.resolve(s".tmp-${java.util.UUID.randomUUID.toString.take(8)}")
    // schema json is a single line (StructType.json never emits newlines),
    // recorded in the header region so filesAt can skip it by prefix
    val header = s"version=$v files=${files.size}" +:
      schema.map(s => s"schema=${s.json}").toSeq
    val body = (header ++ files).mkString("\n")
    Files.write(tmp, body.getBytes("UTF-8"))
    try Files.createLink(manifestPath(v), tmp) // atomic, fails if v exists
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"TxTable $root: concurrent commit already published v$v", e)
    } finally Files.deleteIfExists(tmp)
  }

  /** Change-data feed between two committed versions — every row added or
    * removed by the commits in `(fromVersion, toVersion]`, tagged with
    * `_change_type` (`insert` | `delete`) and `_commit_version` (the
    * commit that made the change). File-level CDC, the Delta-CDF shape
    * without deletion vectors: data files are immutable and never reused,
    * so each consecutive manifest diff IS that commit's change set.
    * Appends therefore yield exact row-level inserts at zero extra cost;
    * an overwrite reports the full rewrite (old snapshot as deletes, new
    * as inserts) — rewrite amplification a finer-grained layer would
    * suppress with row tracking.
    *
    * Scale shape: resolving the feed is a driver-side manifest walk over
    * ≤ (to−from) small JSON files; the returned plan reads ONLY changed
    * data files, so downstream incremental consumers (the `Dedup`
    * incremental tiers, streaming twins) process the delta, never the
    * table. */
  def changes(spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val perCommit = (fromVersion until toVersion).map { v =>
      val before = filesAt(v).toSet
      val after = filesAt(v + 1).toSet
      (v + 1, (after -- before).toSeq.sorted, (before -- after).toSeq.sorted)
    }
    def slice(v: Long, names: Seq[String], kind: String): Option[DataFrame] =
      if (names.isEmpty) None
      else Some(spark.read.parquet(names.map(f => dataDir.resolve(f).toString): _*)
        .withColumn("_change_type", org.apache.spark.sql.functions.lit(kind))
        .withColumn("_commit_version", org.apache.spark.sql.functions.lit(v)))
    val slices = perCommit.flatMap { case (v, added, removed) =>
      slice(v, added, "insert") ++ slice(v, removed, "delete")
    }
    // allowMissingColumns: slices from before an add-column commit are
    // narrower than later ones — the feed fills the gap with nulls
    slices.reduceOption(_.unionByName(_, allowMissingColumns = true)).getOrElse(
      read(spark, Some(toVersion)).limit(0)
        .withColumn("_change_type", org.apache.spark.sql.functions.lit(""))
        .withColumn("_commit_version", org.apache.spark.sql.functions.lit(0L)))
  }

  /** Reclaim data files no retained manifest references: keeps every file
    * reachable from the newest `keepVersions` manifests, drops the rest
    * (crashed-write orphans and files only older snapshots used). Returns
    * the number of files deleted. */
  def vacuum(keepVersions: Int = 1): Int = {
    require(keepVersions >= 1, "must retain at least the latest version")
    val latest = latestVersion.getOrElse(return 0)
    val keep = (latest - keepVersions + 1 to latest)
      .filter(v => Files.exists(manifestPath(v))).flatMap(filesAt).toSet
    val victims = listDir(dataDir)
      .filter(p => !keep.contains(p.getFileName.toString))
    victims.foreach(Files.delete)
    // drop the manifests of vacuumed-away versions too: a time-travel read
    // of a version whose files are gone must fail at resolve, not mid-scan
    (1L until latest - keepVersions + 1)
      .foreach(v => Files.deleteIfExists(manifestPath(v)))
    victims.size
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator.asScala.toSeq.reverseIterator
        .foreach(Files.deleteIfExists(_))
    }
}
