package graft

/** Measures the dedup pipeline family under both forced
  * `spark.graft.dedup.persist` modes — the evidence behind the `auto`
  * threshold in LlmOps.maybePersist (SCALE.md "Persist points"). Run at
  * two scale factors to bracket the flip point:
  *
  *   sbt "runMain graft.PersistStudy /root/testdata/sf0.01"
  *   sbt "runMain graft.PersistStudy /root/testdata/sf0.1"
  */
object PersistStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fam = Seq("q_dedup_minhash", "q_dedup_minhash_verified",
      "q_dedup_apply", "q_pipeline_prep")
    val spark = Sessions.build()
    spark.range(1000000).selectExpr("sum(id)").collect() // session warmup
    for (mode <- Seq("false", "true")) {
      spark.conf.set("spark.graft.dedup.persist", mode)
      val times = fam.map { name =>
        val reps = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache() // cold plans per rep, like Bench
          t
        }
        name -> reps.sorted.apply(1) // median
      }
      println(f"PERSIST_STUDY mode=$mode sf=$sfDir " +
        f"total=${times.map(_._2).sum}%.2f " +
        times.map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
    }
    spark.stop()
  }
}
