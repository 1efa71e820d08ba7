package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-loop profiler: runs one catalog query and reports how many Spark
  * JOBS it scheduled and where the wall-clock went — the fixed-cost
  * picture behind the iterative-operator tuning in SCALE.md (a fixpoint
  * round that costs two jobs pays two scheduling barriers regardless of
  * data volume; this main makes that count visible).
  *
  *   sbt "runMain graft.DevProfile /root/testdata/sf0.1 q_dbscan"
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = Sessions.build()
    @volatile var jobs = 0
    @volatile var jobMs = 0L
    // boxed Long values: a primitive-Long map auto-unboxes a missing
    // key's null to 0L, so the null check silently passed and a job-end
    // without a recorded start added ~epoch-millis to jobMs
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; starts.put(j.jobId, j.time)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId)
        if (s != null) jobMs += (j.time - s.longValue)
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- names; rep <- 1 to 2) {
      // the listener bus is async: drain it before resetting the counters
      // so a previous rep's late job-end events cannot leak into this one
      org.apache.spark.sql.graft.GraftSqlShim.drainListenerBus(spark)
      jobs = 0; jobMs = 0L
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // …and again before READING them, so every job of this rep landed
      org.apache.spark.sql.graft.GraftSqlShim.drainListenerBus(spark)
      spark.catalog.clearCache()
      println(f"DEV_PROFILE $name rep=$rep wall=$wall%.2f jobs=$jobs " +
        f"job_ms=$jobMs gap_ms=${(wall * 1000 - jobMs).toLong}")
    }
    spark.stop()
  }
}
