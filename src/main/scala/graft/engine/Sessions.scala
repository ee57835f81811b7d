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
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata parquet carries isAdjustedToUTC=false timestamps; read
      // them as session-TZ TIMESTAMP (UTC above), the same way the DuckDB
      // oracle does, instead of TIMESTAMP_NTZ (ntz breaks unix_millis and
      // long casts across the engine)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
