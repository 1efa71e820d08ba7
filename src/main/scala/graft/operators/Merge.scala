package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE/upsert over immutable storage: the ETL pattern of rewriting a
  * table as (updates ∪ untouched-target-rows), expressed as one full-outer
  * join — updated rows replace matches, new keys are inserted, unmatched
  * target rows pass through.
  *
  * Scale notes: one shuffle on the key for both sides (or broadcast when
  * the update set is small — the common case); no driver-side row handling.
  */
object Merge {

  /** Upsert `updates` into `target` (same schema) by unique `key`, with
    * full-ROW replacement semantics: a matched update row replaces the
    * target row entirely — including columns the update sets to NULL.
    * (A per-column `coalesce(u.c, t.c)` would silently resurrect old
    * values on legitimate NULL updates.) Update keys must be unique. */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    updates.unionByName(
      target.join(updates.select(key), Seq(key), "left_anti"))

  /** CDC GENERATION — the inverse of [[applyChanges]]: diff two snapshots
    * of a keyed table into an I/U/D change feed. One full-outer join on
    * the key; a row is 'I' when only the new snapshot has the key, 'D'
    * when only the old one does, 'U' when both do and any non-key column
    * differs under null-safe comparison; unchanged rows emit nothing.
    * I/U rows carry the NEW values, D rows the old ones. Round-trip law
    * (MergeSpec): applyChanges(old, diff(old, new), key) == new. */
  def diff(old: DataFrame, neu: DataFrame, key: String): DataFrame = {
    require(old.columns.sorted.sameElements(neu.columns.sorted),
      s"schema mismatch: ${old.columns.mkString(",")} vs ${neu.columns.mkString(",")}")
    val cols = old.columns.filterNot(_ == key).toSeq
    // explicit presence markers: classifying on `__o_<key> IS NULL` would
    // misread a row whose key VALUE is null (the join is null-safe, so a
    // null key matches across snapshots) as an insert even when unchanged
    val o = old.select(old.columns.toSeq.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__o_present", lit(true))
    val n = neu.select(neu.columns.toSeq.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__n_present", lit(true))
    val changed = cols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, col(s"__o_$key") <=> col(s"__n_$key"), "full_outer")
      .withColumn("op",
        when(col("__o_present").isNull, "I")
          .when(col("__n_present").isNull, "D")
          .when(changed, "U"))
      .where(col("op").isNotNull)
      .select(col("op") +:
        coalesce(col(s"__n_$key"), col(s"__o_$key")).as(key) +:
        cols.map(c =>
          when(col("op") === "D", col(s"__o_$c"))
            .otherwise(col(s"__n_$c")).as(c)): _*)
  }

  /** CDC apply: fold a change feed into `target`. `changes` carries the
    * target schema plus `opCol` ('I'nsert / 'U'pdate / 'D'elete) and
    * `seqCol` (change order). Per key, only the LATEST change (max seq,
    * ties broken by op descending — deterministic) is applied: I/U
    * replace the row (upsert semantics), D removes it. Shapes: one
    * window over the (small) change feed + the upsert's anti-join —
    * the target is never shuffled more than once.
    */
  def applyChanges(target: DataFrame, changes: DataFrame, key: String,
                   opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val survivors = latest.where(col(opCol) =!= "D").drop(opCol, seqCol)
    // every keyed change (incl. deletes) masks the target row; survivors
    // re-insert the replaced version
    survivors.unionByName(
      target.join(latest.select(key), Seq(key), "left_anti"))
  }
}
