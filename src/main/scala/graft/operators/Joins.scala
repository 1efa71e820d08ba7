package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark's optimizer has no native operator for: as-of and
  * point-in-interval (range) joins. Both are built from equi-join +
  * window/bin primitives so they stay shuffle-based hash joins at scale —
  * never the O(n·m) BroadcastNestedLoopJoin a naive non-equi condition
  * falls back to.
  */
object Joins {

  /** As-of join: for each left row, the single right row with the greatest
    * `rightOrd <= leftOrd` among equal keys (ties broken by `tieBreak`
    * descending). Classic market-data/event-enrichment semantics.
    *
    * Plan shape: one equi-join shuffle on the key + one window sort per
    * left-row partition — no nested-loop fallback.
    *
    * @param leftId unique left row id (window partition key)
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftOrd: Column, rightOrd: Column,
           leftId: Column, tieBreak: Column): DataFrame = {
    // left-outer: a left row with no qualifying right row survives with
    // null enrichment (nulls sort last so any real match wins rank 1)
    val joined = left.join(right,
      leftKey === rightKey && rightOrd <= leftOrd, "left_outer")
    val w = Window.partitionBy(leftId)
      .orderBy(rightOrd.desc_nulls_last, tieBreak.desc_nulls_last)
    joined.withColumn("__asof_rn", row_number().over(w))
      .where(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }

  /** Binned point-in-interval join: match point rows to interval rows with
    * `lo <= pt <= hi` (plus equi `keys`), implemented by exploding each
    * interval into the fixed-width bins it covers and equi-joining on
    * (keys, bin). Each (interval, point) pair appears exactly once because
    * a point lives in exactly one bin.
    *
    * Scale notes: the naive formulation is a nested-loop join (O(n·m));
    * this is a hash join with fan-out `≈ intervalWidth / binWidth + 1`,
    * so choose `binWidth` on the order of the typical interval length.
    * All ordinal columns must be integral (e.g. `unix_micros(ts)`).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pt: String,
                      lo: String, hi: String, binWidth: Long): DataFrame = {
    val binned = intervals.withColumn("__bin",
      explode(sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    val pts = points.withColumn("__bin", floor(col(pt) / binWidth))
    pts.join(binned, keys :+ "__bin")
      .where(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop("__bin")
  }

  /** Binned interval-OVERLAP join: match left intervals `[ls, le)` to
    * right intervals `[rs, re)` with `max(ls, rs) < min(le, re)` (plus
    * equi `keys`). Each side explodes into the fixed-width bins it
    * touches and the pair joins on (keys, bin); a pair overlapping
    * several bins is deduplicated by keeping only the bin holding the
    * overlap's START (`max(ls, rs) div binWidth`), so every qualifying
    * pair appears exactly once — no distinct pass needed.
    *
    * Scale notes: a hash join with per-side fan-out
    * `≈ intervalWidth / binWidth + 1` instead of the nested-loop the
    * non-equi condition would plan; choose `binWidth` on the order of
    * the typical interval length. Ordinals must be integral. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      ls: String, le: String, rs: String, re: String,
                      binWidth: Long): DataFrame = {
    // [s, e) touches bins s div W .. (e−1) div W (e is exclusive)
    val lb = left.withColumn("__bin",
      explode(sequence(floor(col(ls) / binWidth),
        floor((col(le) - 1) / binWidth))))
    val rb = right.withColumn("__bin",
      explode(sequence(floor(col(rs) / binWidth),
        floor((col(re) - 1) / binWidth))))
    lb.join(rb, keys :+ "__bin")
      .where(greatest(col(ls), col(rs)) < least(col(le), col(re)))
      .where(col("__bin") === floor(greatest(col(ls), col(rs)) / binWidth))
      .drop("__bin")
  }
}
