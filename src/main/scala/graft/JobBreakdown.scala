package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev-loop per-job cost breakdown for one catalog query: prints every
  * Spark job the query schedules with its wall duration, task count and
  * shuffle-write bytes, in submission order — the tool that tells WHICH
  * of an iterative operator's barriers actually costs, where
  * [[DevProfile]] only totals them.
  *
  *   sbt "runMain graft.JobBreakdown /root/testdata/sf0.1 q_betweenness"
  */
object JobBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = Sessions.build()
    case class J(start: Long, var end: Long = -1, var tasks: Int = 0,
                 var shuf: Long = 0, desc: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, J(e.time,
          desc = Option(e.properties.getProperty("spark.job.description"))
            .getOrElse("").take(60)))
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.get(e.stageInfo.stageId)
        val j = jobs.get(jid)
        if (j != null) {
          j.tasks += e.stageInfo.numTasks
          j.shuf += e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    // warm lap then measured lap — JIT noise would drown the breakdown
    for (rep <- 1 to 2) {
      org.apache.spark.sql.graft.GraftSqlShim.drainListenerBus(spark)
      jobs.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.GraftSqlShim.drainListenerBus(spark)
      spark.catalog.clearCache()
      if (rep == 2) {
        println(f"JOB_BREAKDOWN $name wall=$wall%.2f")
        import scala.jdk.CollectionConverters._
        jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, j) =>
          val ms = if (j.end > 0) j.end - j.start else -1
          println(f"  job=$id%3d ms=$ms%6d tasks=${j.tasks}%4d " +
            f"shufMB=${j.shuf / 1024 / 1024}%5d ${j.desc}")
        }
      }
    }
    spark.stop()
  }
}
