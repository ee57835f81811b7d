package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Matches the reference's session bootstrap
  * (`/root/reference/pyspark-1.ipynb:56` `SparkSession.builder.appName(...)
  * .getOrCreate()`) but pins the settings that matter for a deterministic,
  * scale-ready engine: UTC session time zone, AQE on, shuffle partitions
  * sized to the actual parallelism instead of the 200 default (on a real
  * cluster this would be set to ~2-3x total executor cores).
  */
object Sessions {

  /** Oracle-parity reader configs shared by EVERY graft session (engine,
    * Bench, Verify, ScaleGen). A session missing one of these silently
    * diverges from the DuckDB oracle: the testdata parquet carries
    * isAdjustedToUTC=false timestamps that must be read as session-TZ
    * TIMESTAMP in UTC (not TIMESTAMP_NTZ — ntz breaks unix_millis and long
    * casts across the engine), and int96/nanos columns as long. Keep this
    * the ONLY place such configs live.
    */
  val baseConfigs: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    // AQE coalescing sizes partitions by BYTES; this engine's hot shuffles
    // carry compressed text/shingle payloads whose per-byte CPU (md5,
    // array_intersect, tokenize) is orders of magnitude above relational
    // data, so the default 1 MB floor collapses CPU-dense stages to 1-3
    // tasks (measured: the containment verify stage ran 3 tasks / 7.4 s
    // of task time on 32 idle cores). 64 KB keeps those stages wide;
    // with parallelismFirst (default true) the target is still
    // max(bytes/parallelism, floor), so large-shuffle stages — every
    // stage at production scale — are UNAFFECTED by the floor.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64k",
    // resolve parquet columns by footer field id whenever the read
    // schema carries `parquet.field.id` metadata — the Delta
    // column-mapping `id` mode contract (inert for every other read:
    // graft schemas never carry field ids outside that path)
    "spark.sql.parquet.fieldId.read.enabled" -> "true",
    "spark.sql.parquet.fieldId.write.enabled" -> "true",
    "spark.ui.enabled" -> "false")

  def local(cpus: Int = Runtime.getRuntime.availableProcessors(),
            extra: Map[String, String] = Map.empty): SparkSession = {
    val builder = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      // per-JVM temp warehouse: the in-memory catalog dies with the JVM,
      // so a persistent location would orphan managed-table dirs and fail
      // the next saveAsTable with LOCATION_ALREADY_EXISTS
      .config("spark.sql.warehouse.dir", sys.props.getOrElse("graft.warehouse",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString))
      .config("spark.sql.shuffle.partitions", cpus.toString)
    (baseConfigs ++ extra).foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
