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
}
