package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Each query is executed with a noop-format write so the
  * FULL physical plan runs (a bare `.count()` lets Catalyst prune every
  * unreferenced projection — it would time a row count, not the query).
  * The one-line JSON metric is printed as the bare last stdout line for the
  * driver's parser (build.sbt routes forked stdout through unprefixed).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.engine.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: one pass of the flagship query exercises the scan
    // path, codegen and JIT so the first TIMED query doesn't absorb
    // one-time JVM startup cost (standard benchmarking practice).
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Two timed runs per query, report the min: first-touch effects (page
    // cache, codegen compile, broadcast build) land on run 1 and can't
    // masquerade as a plan regression. Caches are cleared between queries
    // so an operator's persist() can't subsidize (or tax) its neighbors.
    // Optional subset filter (comma-separated names) for scale probes and
    // regression re-timing; a subset run never overwrites the full-bench
    // round artifacts below.
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = subset.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        } finally {
          spark.catalog.clearCache()
          // clearCache drops only catalog-cached relations; localCheckpoint
          // blocks (containment/CC queries) linger in the block manager
          // until ContextCleaner GC — drop them so no query's working set
          // taxes its successors' memory. The CC label memo holds a
          // DataFrame BACKED by such blocks, so it must be invalidated in
          // the same breath — a stale memo entry whose blocks are gone
          // fails every consumer with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
          // (Each timed run therefore carries the full label computation:
          // honest per-query timing, at the cost of re-running CC for each
          // consumer query in the bench — production pipelines keep the
          // memo for the life of the session.)
          graft.operators.Dedup.clearCcCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        }
      }
      name -> times
    }
    // Failed queries are OMITTED from the per-query map (no -1 sentinel to
    // special-case); a query that failed one of its two runs is listed in
    // partial_failures — its surviving time is reported but flagged.
    val failed  = results.collect { case (n, ts) if ts.isEmpty => n }.sorted
    val partial = results.collect { case (n, ts) if ts.size == 1 => n }.sorted
    val ok = results.collect { case (n, ts) if ts.nonEmpty => n -> ts.min }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${arr(failed)},"partial_failures":${arr(partial)},"sf":"$sfDir"}"""
    spark.stop()
    // The driver's BENCH_r{N}.json keeps only a truncated tail of this
    // line, which hides ~20% of queries from round-over-round comparison;
    // persist the FULL map ourselves. The r{N} name is a best-effort guess
    // (one past the last driver-written BENCH_r*.json — wrong if the
    // driver already wrote this round's file), so ALSO overwrite a
    // stable-named latest artifact that is always the newest run.
    // Persist the round artifact only for a FULL registry run at the
    // driver's bench scale factor — a subset probe or an sf0.001 smoke
    // must never clobber BENCH_full_r{N}/latest (it happened: an sf0.001
    // smoke overwrote the round's sf0.1 map, silently breaking
    // tools/bench_diff.py's baseline).
    try if (subset.isEmpty && sfDir.contains("sf0.1")) {
      val round = Option(new java.io.File(".").listFiles()).toSeq.flatten
        .flatMap(f => "BENCH_r(\\d+)\\.json".r.findFirstMatchIn(f.getName))
        .map(_.group(1).toInt).maxOption.getOrElse(0) + 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(f"BENCH_full_r$round%02d.json"), line + "\n")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_full_latest.json"), line + "\n")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not persist full bench map: $e")
    }
    println(line)
  }
}
