package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job profiler for gate optimization (dev aid, like [[PlanDump]]):
  * `runMain graft.QueryProf [sfDir] [name,name...]` runs each matching
  * SparkEntry query (one warm-up + one measured evaluation) and prints,
  * per Spark job it triggered: wall-clock, summed task time, and the
  * job's stage row counts — separating eager build-time jobs
  * (persist counts, component rounds, driver-loop collects) from the
  * final action, which is where composed gates hide their cost.
  */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(',').toSeq else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, var t0: Long = 0L, var t1: Long = 0L,
      var taskTimeMs: Long = 0L, var tasks: Int = 0, var desc: String = "")
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val j = Job(e.jobId, t0 = e.time)
          j.desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobs(e.jobId) = j
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          // attribute the stage to the most recent unfinished job
          jobs.values.toSeq.reverseIterator
            .find(j => j.t1 == 0L)
            .foreach { j =>
              j.taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
              j.tasks += e.stageInfo.numTasks
            }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val totalToks = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.exists(n.contains) }
    totalToks.foreach { case (n, fn) =>
      // warm-up evaluation (JIT/codegen/footer caches), not profiled
      try fn(spark, dir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        System.err.println(s"[prof] $n warm-up failed: $e") }
      jobs.synchronized(jobs.clear())
      val w0 = System.nanoTime()
      val built = fn(spark, dir)
      val wBuild = (System.nanoTime() - w0) / 1e9
      val a0 = System.nanoTime()
      built.queryExecution.toRdd.count()
      val wAction = (System.nanoTime() - a0) / 1e9
      println(f"%n== $n build=$wBuild%.2fs action=$wAction%.2fs total=${wBuild + wAction}%.2fs")
      jobs.synchronized {
        jobs.values.foreach { j =>
          val wall = (j.t1 - j.t0) / 1e3
          println(f"  job ${j.id}%4d wall=$wall%6.2fs taskTime=${j.taskTimeMs / 1e3}%7.2fs tasks=${j.tasks}%4d ${j.desc.take(80)}")
        }
      }
    }
    graft.ext.CorpusCache.releaseAll()
    spark.stop()
  }
}
