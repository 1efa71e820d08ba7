package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.GraftSqlShim

/** Lineage truncation for iterative operators.
  *
  * Every loop in this package (ConnectedComponents, PageRank, BFS, SSSP,
  * label propagation, k-means, HyperANF, …) must cut lineage per round so
  * each iteration costs one pass. Plain `Dataset.localCheckpoint` is NOT
  * enough: it carries the round plan's estimated `Statistics` forward, and
  * a self-joining round plan squares that estimate every iteration until
  * the driver hangs multiplying million-digit BigInts inside the stats
  * visitor (see [[GraftSqlShim.localCheckpointMeasured]] for the full
  * mechanism; bit us live on q_dbscan at sf0.01 — 20+ min in planning for
  * a sub-second job). `.ckpt()` checkpoints eagerly and replaces the
  * carried estimate with the just-materialized blocks' real size.
  */
object Ckpt {
  implicit class DfCkpt(private val df: DataFrame) extends AnyVal {
    /** Drop-in replacement for `localCheckpoint()` in iterative loops. */
    def ckpt(): DataFrame = GraftSqlShim.localCheckpointMeasured(df)
  }

  /** Narrow row count for fixpoint convergence tests: one job over the
    * plan's own partitions, NO exchange. `Dataset.count()` plans a
    * two-stage partial/final aggregate — under AQE that is two scheduled
    * jobs plus a shuffle, measured at ~170 ms even on a 4,096-row
    * checkpointed frame (round-10 barrier micro-benchmark, SCALE.md), which multiplied by every
    * propagation round dominated the iterative-graph queries. The
    * per-partition counting that `RDD.count` does driver-side is exactly
    * the map-side half of that aggregate, at one job and zero exchanges
    * (~40 ms). Use ONLY for counts over just-checkpointed frames (the
    * filter is a narrow scan of materialized blocks — no recompute). */
  def fastCount(df: DataFrame): Long =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd.count()

  /** Run `body` (a fixpoint loop) with AQE disabled, restoring the
    * session's setting afterwards.
    *
    * WHY: under AQE every exchange — including each of the ~5 broadcast
    * exchanges a propagation round builds from its checkpointed label
    * frame — materializes as its own scheduled JOB, so a round whose data
    * fits in one task still pays ~9 job-submission round-trips
    * (DevProfile: q_dbscan 59 jobs / q_scc_user 153 jobs, ~45% of wall
    * BETWEEN jobs). Inside a loop over [[DfCkpt.ckpt]]'d frames AQE buys
    * nothing: every input is a LogicalRDD with MEASURED stats, so the
    * static planner already makes the same broadcast-vs-shuffle calls
    * AQE would make at runtime — without the per-stage barriers. Scoped
    * to the loop only: upstream plan construction (scans, first
    * aggregations) keeps AQE's runtime re-planning.
    *
    * SINGLE-THREADED-SESSION ASSUMPTION: the setting is session-global
    * for the duration of `body` — a query built or executed CONCURRENTLY
    * on the same SparkSession would silently plan without AQE, and two
    * overlapping noAqe scopes can restore the wrong value. Every caller
    * in this repo (catalog builders under Verify/Bench/PlanAudit, specs
    * under SparkFixture) drives the session from one thread at a time;
    * do not call this from parallel test runners or multi-threaded
    * drivers sharing a session. */
  def noAqe[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
