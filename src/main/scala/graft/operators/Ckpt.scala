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
}
