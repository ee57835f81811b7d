package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-stage timing probe for one registry query — the empirical half of
  * guide §1 ("decide whether the time is going to shuffle read, shuffle
  * write, executor compute, scheduler delay"): runs the query once warm,
  * then once instrumented with a SparkListener, and prints every stage's
  * wall duration, task count, and shuffle bytes. The UI is disabled in
  * these sessions (spark.ui.enabled=false), so this is the stage-page
  * substitute.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.StageProbe <query> [warms=1]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val warms = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.engine.Sessions.local(cpus.toInt)
    val fn = SparkEntry.queries(name)
    (1 to warms).foreach(_ => BenchProtocol.timeOnce(spark, sfDir, fn))

    case class St(var name: String = "", var tasks: Int = 0,
      var submitted: Long = 0, var completed: Long = 0,
      var shufRead: Long = 0, var shufWrite: Long = 0,
      var taskTimeMs: Long = 0)
    val stages = mutable.LinkedHashMap[Int, St]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        s.name = e.stageInfo.name.take(80)
        s.submitted = System.nanoTime()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        s.completed = System.nanoTime()
        s.tasks = e.stageInfo.numTasks
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          s.shufRead = m.shuffleReadMetrics.totalBytesRead
          s.shufWrite = m.shuffleWriteMetrics.bytesWritten
          s.taskTimeMs = m.executorRunTime
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t = BenchProtocol.timeOnce(spark, sfDir, fn)
    spark.sparkContext.removeSparkListener(listener)
    def f2(x: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))
    println(f"== $name: total ${f2(t)} s, $jobs jobs, ${stages.size} stages ==")
    stages.foreach { case (id, s) =>
      val wall = (s.completed - s.submitted) / 1e9
      println(f"stage $id%4d ${f2(wall)}%7s s  tasks=${s.tasks}%3d " +
        f"taskTime=${s.taskTimeMs}%6d ms  sr=${s.shufRead}%9d sw=${s.shufWrite}%9d  ${s.name}")
    }
    spark.stop()
  }
}
