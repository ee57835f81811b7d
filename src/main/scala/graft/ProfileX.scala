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
  * Runs on [[BenchProtocol]] — the SAME timed-run definition (noop write,
  * blocking inter-run state clear) as Bench's sweep and its tail
  * adjudication. The printed `steady` field is the median of the runs
  * AFTER the first (run 1 is the de-facto warm-up), i.e. exactly the
  * number the adjudicator would report for this query — a ProfileX
  * spot-check and an in-artifact adjudicated value are the same
  * measurement by construction.
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
    def time(f: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      BenchProtocol.timeOnce(spark, sfDir, f)
    val s0 = time(sentinel)
    val ts = (1 to runs).map(_ => time(fn))
    val s1 = time(sentinel)
    val steady = BenchProtocol.median(if (ts.size > 1) ts.drop(1) else ts)
    // Locale.ROOT: the default-locale f"" interpolator would emit
    // comma-decimal (invalid JSON) under e.g. a de_DE JVM locale
    def f2(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
    def f3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    def fmt(xs: Seq[Double]) = xs.map(f2).mkString("[", ",", "]")
    println(s"""{"query":"$name","runs":${fmt(ts)},"steady":${f3(steady)},"sentinel_before":${f3(s0)},"sentinel_after":${f3(s1)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
