package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Lake namespace model: a container with hierarchical paths acting as
  * tables/partitions, as in the reference's
  * `datastorage/airbnb/spain/<region>_<city>_<file>.csv` layout
  * (`/root/reference/ingestion-datalake.py:103-105`) and
  * `datastorage/huggingface/<file>.parquet`
  * (`/root/reference/ingestion-datalake-parquet.py:104`).
  *
  * The control plane (SAS/Key Vault/RBAC) is abstracted: a [[LakeLocator]]
  * resolves (container, blobPath) to a physical URI. The local
  * implementation maps onto the filesystem; a cloud implementation would
  * map onto `abfss://...` — query code never changes.
  */
trait LakeLocator extends Serializable {
  def uri(container: String, blobPath: String): String
}

final case class LocalLakeLocator(root: String) extends LakeLocator {
  def uri(container: String, blobPath: String): String =
    s"$root/$container/$blobPath"
}

/** Pure path-derivation logic from the reference ingestion pipeline
  * (`/root/reference/ingestion-datalake.py:102-105`):
  * filename = last URL segment; region/city = segments -5..-3 joined;
  * blob path = `airbnb/spain/<region>_<city>_<filename>`.
  */
object LakePaths {
  /** Driver-side (pure Scala) form — unit-test target. */
  def derive(url: String, prefix: String = "airbnb/spain"): String = {
    val parts    = url.split("/")
    val filename = parts.last
    val regionCity = parts.slice(parts.length - 5, parts.length - 3).mkString("_")
    s"$prefix/${regionCity}_$filename"
  }

  /** Columnar form of the same derivation — runs distributed over a
    * manifest DataFrame of URLs. Uses only codegen'd built-ins.
    */
  def deriveCol(url: Column, prefix: String): Column = {
    val parts = split(url, "/")
    val n     = size(parts)
    val filename   = element_at(parts, -1)
    val regionCity = concat_ws("_", element_at(parts, n - 4), element_at(parts, n - 3))
    concat_ws("/", lit(prefix), concat_ws("_", regionCity, filename))
  }
}

/** Readers mirroring the reference's read surface (SURVEY.md §2.1).
  * The reference reads with `header=True, inferSchema=True`
  * (`/root/reference/pyspark-1.ipynb:68,103`); `inferSchema` costs an
  * extra full pass over the data, so the engine prefers explicit schemas
  * and keeps inference as an opt-in.
  */
object Readers {
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSONL (newline-delimited JSON) — the interchange format LLM-pipeline
    * tooling ships corpora in. The schema is REQUIRED: JSON schema
    * inference is a full extra pass over the data (unaffordable at
    * 100 TB), and an explicit schema also lets the Jackson parser skip
    * fields outside the requested columns instead of materializing every
    * record in full. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC scan — the second columnar format next to parquet; embedded
    * schema, predicate pushdown and column pruning all apply. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Streaming JSONL ingest: new files landing in `path` become
    * micro-batches — the daily-corpus-drop wiring. File-arrival tracking
    * is exactly-once per file (source checkpoint); schema is required for
    * the same reasons as the batch reader. */
  def jsonlStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Raw media ingest for the multimodal tier: Spark's `binaryFile`
    * source reads a directory of image/audio/video files as
    * (path, modificationTime, length, content BINARY) rows — the step
    * that turns a drop-zone of media files into the opaque-binary
    * column shape [[graft.operators.Multimodal]] processes. `glob`
    * prunes by extension at LISTING time (`pathGlobFilter` — non-matching
    * files are never opened), and the `length <= maxBytes` filter is
    * PUSHED DOWN by the binaryFile source (file metadata, checked before
    * any content is read): `spark.sql.files.maxPartitionBytes` cannot
    * split a binary row, so one multi-GB file would be one task and one
    * executor-memory-sized row — oversized media belongs in a chunked
    * side-channel, not this reader. */
  def binaryFiles(spark: SparkSession, path: String, glob: String,
      maxBytes: Long = 256L << 20): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .filter(col("length") <= maxBytes)
}

/** Writers mirroring the reference's blob sinks (SURVEY.md §2.2). The
  * reference PUTs whole files with `overwrite` semantics
  * (`/root/reference/ingestion-datalake.py:108-125`); the engine maps that
  * to idempotent `mode("overwrite")` directory writes, which additionally
  * gives atomic job commit and per-partition parallelism.
  */
object Writers {
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def orc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JSONL sink: one JSON object per line, one file per partition — the
    * hand-off format for downstream tokenizer/training jobs. Writes are
    * idempotent (`overwrite`) like the other sinks. */
  def jsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Range-sorted parquet layout: rows range-partitioned on `key` (sampled
    * range exchange → each output file owns one contiguous, non-overlapping
    * key interval) and sorted within each partition. Parquet stores per-file
    * and per-row-group min/max on every column, so a later
    * `WHERE key BETWEEN a AND b` prunes to the one or two files whose
    * interval intersects — the zone-map layout for a 100 TB fact table's
    * dominant filter column. One sampling pass + one exchange at write
    * time, amortized over every subsequent range scan. */
  def parquetRangeSorted(df: DataFrame, key: String, files: Int,
      path: String): Unit =
    df.repartitionByRange(files, org.apache.spark.sql.functions.col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Idempotent partition BACKFILL: rewrite ONLY the partitions present
    * in `df`, leaving every other partition's files untouched — the
    * reprocess-one-day move on a date-partitioned 100 TB table. Plain
    * `mode("overwrite")` would truncate the whole table; DYNAMIC
    * partition-overwrite commits per touched partition, so a backfill is
    * (a) bounded by the data it carries and (b) safely re-runnable — the
    * same input always converges to the same partition contents. */
  def backfillPartitions(df: DataFrame, path: String,
      partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "backfill needs partition columns")
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*).parquet(path)
  }

  /** Small-file compaction — the maintenance job every streaming sink
    * needs: micro-batch appends leave thousands of KB-sized files whose
    * per-file open/footer overhead dominates scans. Rewrites `src` as
    * `files` right-sized files at `dst` with `coalesce` (a partition
    * MERGE — no shuffle: Spark plans the narrow union of input splits),
    * then the caller swaps paths atomically at the table layer. `dst`
    * must differ from `src`: overwriting a path mid-read would delete
    * the very files the scan is consuming. */
  def compact(spark: SparkSession, src: String, dst: String, files: Int): Unit = {
    require(dst != src, "compact to a NEW path, then swap at the table layer")
    spark.read.parquet(src).coalesce(files)
      .write.mode("overwrite").parquet(dst)
  }
}

/** Bucketed table layout — the 100 TB answer to the fact⋈fact shuffle:
  * when both sides are written bucketed (and sorted) by the join key with
  * the same bucket count, the join plans with NO Exchange — each task
  * reads one co-located bucket pair. The shuffle is paid once at write
  * time and amortized over every subsequent join. */
object Bucketing {
  def bucketize(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}

object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one driver test table from an sf directory.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * with `spark.sql.legacy.parquet.nanosAsLong=true` (set by all engine
    * sessions) it arrives as a nano-epoch long and is converted here to a
    * microsecond timestamp — the same truncation DuckDB applies. */
  /** Tables whose queries are dominated by per-row CPU (tokenize / shingle
    * / hash / vector math) rather than scan+aggregate — the only tables
    * where paying one small exchange to escape a single-row-group scan is
    * a clear win. Relational tables (lineitem/orders/events) host
    * scan→filter→aggregate queries whose map side is cheap; spreading them
    * was measured NET-NEGATIVE (q1 0.26 s → 1.0 s). Key = the unique id
    * column: hash repartitioning avoids round-robin's
    * sort-before-repartition pass AND downstream id-keyed aggregations
    * reuse the partitioning (hash(doc_id) satisfies any grouping that
    * contains doc_id — exchanges disappear instead of moving). */
  private val cpuDenseKeys = Map("documents" -> "doc_id", "embeddings" -> "vec_id")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = raw(spark, sfDir, name)
    cpuDenseKeys.get(name).fold(df)(key => spread(spark, df, col(key)))
  }

  /** [[apply]] without the under-split spread — for FIXTURE BUILDERS whose
    * write-side file layout is part of the fixture contract (Delta tables
    * constructed with a deliberate file census): those paths control their
    * own partitioning and must not inherit a parallelism-dependent one. */
  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    else df
  }

  /** Spread a pathologically under-split scan across the session's
    * parallelism (optimization guide §2.5, "input skew: one huge
    * unsplittable file … repartition immediately after the read"): the
    * driver test tables are single-file, SINGLE-ROW-GROUP parquet, so the
    * scan cannot be split below one task no matter the split configs and
    * every map-side operator (tokenize/shingle/hash/decode) otherwise runs
    * on ONE core regardless of cluster size. A no-op whenever the planned
    * scan already meets the session's default parallelism — i.e. on any
    * properly laid-out multi-file / multi-row-group table (a real 100 TB
    * lake), where adding a corpus-sized exchange would be pure loss.
    * Filters and column pruning push through RepartitionByExpression, so
    * PushedFilters / ReadSchema at the scan are unchanged. */
  def spread(spark: SparkSession, df: DataFrame, key: Column): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
