package graft

import scala.collection.mutable

/** Dev tool: run one registered query (warm, then timed) and print the
  * per-Spark-job wall-clock timeline of the timed run — job id, duration,
  * stage count, task count, summed task time. The per-round cost of the
  * iterative operators is invisible in `explain` (the loop runs during plan
  * construction); this shows where the seconds go, job by job.
  *
  * Usage: runMain graft.ProfJobs <query> [sfDir] [reps]
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.local("graft-profjobs")
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, start: Long, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L,
      var names: List[String] = Nil, var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = mutable.Map.empty[Int, Int]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.synchronized {
          val j = Job(js.jobId, js.time)
          j.desc = Option(js.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse("")
          jobs(js.jobId) = j
          js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
        }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(je.jobId).foreach(_.end = je.time) }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageToJob.get(sc.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1
            j.tasks += sc.stageInfo.numTasks
            j.names ::= sc.stageInfo.name.takeWhile(_ != '\n').take(60)
          }
        }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          stageToJob.get(te.stageId).flatMap(jobs.get).foreach { j =>
            if (te.taskInfo != null) j.taskMs += te.taskInfo.duration
          }
        }
    })

    def run(): Double = {
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription("construct")
      val df = SparkEntry.queries(name)(spark, dir)
      val t1 = System.nanoTime()
      spark.sparkContext.setJobDescription("execute")
      df.write.format("noop").mode("overwrite").save()
      spark.sparkContext.setJobDescription(null)
      val t2 = System.nanoTime()
      println(f"[profjobs] construct ${(t1 - t0) / 1e9}%.3f s, " +
        f"execute ${(t2 - t1) / 1e9}%.3f s")
      (t2 - t0) / 1e9
    }
    run() // warm
    (1 until reps).foreach(_ => run())
    jobs.synchronized { jobs.clear(); stageToJob.clear() }
    val wall = run()
    Thread.sleep(500) // let listener events drain
    println(f"[profjobs] $name warm run: $wall%.3f s, ${jobs.size} jobs")
    var prevEnd = 0L
    jobs.values.toSeq.sortBy(_.start).foreach { j =>
      val dur = (j.end - j.start) / 1e3
      val gap = if (prevEnd == 0L) 0.0 else (j.start - prevEnd) / 1e3
      prevEnd = math.max(prevEnd, j.end)
      println(f"[profjobs]   job ${j.id}%3d  ${dur}%7.3f s  (+gap ${gap}%6.3f s)  " +
        f"stages=${j.stages}%2d tasks=${j.tasks}%4d taskTime=${j.taskMs / 1e3}%8.2f s  " +
        s"[${j.desc}] ${j.names.reverse.mkString(" | ")}")
    }
    val covered = jobs.values.map(j => j.end - j.start).sum / 1e3
    println(f"[profjobs] sum(job wall)=${covered}%.3f s of $wall%.3f s " +
      f"(driver-only gaps: ${wall - covered}%.3f s)")
    spark.stop()
  }
}
