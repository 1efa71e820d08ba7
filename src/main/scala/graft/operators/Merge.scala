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

  /** Upsert `updates` into `target` (same schema) by unique `key`. */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = target.columns.toSeq
    target.alias("t")
      .join(updates.alias("u"), col(s"t.$key") === col(s"u.$key"), "full_outer")
      .select(cols.map(c => coalesce(col(s"u.$c"), col(s"t.$c")).as(c)): _*)
  }
}
