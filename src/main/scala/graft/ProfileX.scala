package graft

/** Per-run profiler for a single registry query — the isolation protocol
  * the round-8 verdict prescribed for adjudicating driver/builder bench
  * gaps. Unlike Bench (which reports one median per query), this prints
  * EVERY run's time, so first-execution costs (Janino codegen of large
  * whole-stage stages, JIT, broadcast build) are visible separately from
  * steady-state plan cost: a query whose run trace is [25s, 5s, 5s, 5s]
  * has a compile problem, not a shuffle problem, and contention hits the
  * two very differently (compile competes for CPU with the C2 JIT, data
  * runs compete for memory bandwidth).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProfileX <query> [runs=5]
  */
object ProfileX {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.Sessions.local(cpus.toInt)
    val fn = SparkEntry.queries(name)
    val sentinel = SparkEntry.queries("q1_pricing_summary")
    def time(f: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      graft.operators.Dedup.clearCcCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }
    val s0 = time(sentinel)
    val ts = (1 to runs).map(_ => time(fn))
    val s1 = time(sentinel)
    // Locale.ROOT: the default-locale f"" interpolator would emit
    // comma-decimal (invalid JSON) under e.g. a de_DE JVM locale
    def f2(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
    def f3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    def fmt(xs: Seq[Double]) = xs.map(f2).mkString("[", ",", "]")
    println(s"""{"query":"$name","runs":${fmt(ts)},"sentinel_before":${f3(s0)},"sentinel_after":${f3(s1)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
