package graft

/** Targeted timing for a few catalog queries (median-of-3, cold plans) —
  * the dev-loop A/B tool behind plan tweaks, without a full Bench run:
  *
  *   sbt "runMain graft.TimeQuery /root/testdata/sf0.1 q_lm_score"
  *
  * Args of the form `conf:key=value` set runtime SQLConf entries before
  * any query runs — the A/B switchboard behind the SCALE.md fixpoint
  * studies (AQE on/off, shuffle-partition counts) without code edits.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val (confs, names) = args.drop(1).toSeq.partition(_.startsWith("conf:"))
    val spark = Sessions.build()
    confs.map(_.stripPrefix("conf:").split("=", 2)).foreach {
      case Array(k, v) => spark.conf.set(k, v)
      case other => sys.error(s"bad conf arg: ${other.mkString("=")}")
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // session warmup
    for (name <- names) {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"TIME_QUERY $name median=${reps.sorted.apply(1)}%.2f " +
        f"all=${reps.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
