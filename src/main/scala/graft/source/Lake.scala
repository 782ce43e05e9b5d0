package graft.source

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lake-maintenance operators: the mutation/evolution half of a parquet
  * lake that the reference sidesteps by rewriting whole cache files per
  * symbol (reference: src/data/storage.py:60-96 — its "update" is a full
  * overwrite). At 100 TB a full rewrite is not an option; these are the
  * standard incremental shapes, each a single shuffle on the merge key:
  *
  *  - [[upsert]]       — newest-wins merge (SCD type 1): base ∪ updates,
  *                       keep the max-version row per key.
  *  - [[snapshotDiff]] — change-data-capture between two snapshots:
  *                       added / removed / changed rows only.
  *  - [[scd2]]         — change history (SCD type 2): collapse an event
  *                       stream into validity intervals per key.
  *
  * Scale notes: all three shuffle exactly once, on the key columns. With
  * the base table bucketed on the key ([[Storage.writeBucketed]]) the
  * upsert window and the diff join reuse the bucketing and shuffle only
  * the (small) delta side. Output of snapshotDiff/scd2 is the change set,
  * not the table — O(delta), not O(history).
  */
object Lake {

  /** Newest-wins upsert (MERGE ... WHEN MATCHED THEN UPDATE): union base
    * and updates, keep the single highest-`versionCol` row per key.
    * Handles any number of update batches per key in one pass; ties on
    * version are broken by `tieBreak` descending, so the result is
    * deterministic whenever (version, tieBreak) is unique per key. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(versionCol).desc +: tieBreak.map(col(_).desc)): _*)
    base.unionByName(updates)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** CDC diff between two snapshots of the same keyed table. Returns only
    * the rows whose state changed, with `change` ∈
    * {added, removed, changed} and the compared columns prefixed
    * `old_` / `new_`. Presence is tracked with marker columns (never by
    * value nullability — a legitimately-NULL value column must not read
    * as "row absent"); the change test is null-safe (`<=>`). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    def side(df: DataFrame, prefix: String, marker: String): DataFrame =
      df.select(keys.map(col) ++ compareCols.map(c => col(c).as(s"$prefix$c"))
        :+ lit(true).as(marker): _*)
    val o = side(oldSnap, "old_", "_in_old")
    val n = side(newSnap, "new_", "_in_new")
    val joined = o.join(n, keys, "full_outer")
    val differs = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .otherwise("changed"))
      // present-in-both-and-identical rows are the 100-TB bulk: drop them
      .filter(col("_in_old").isNull || col("_in_new").isNull || differs)
      .drop("_in_old", "_in_new")
  }

  /** SCD type 2: collapse a keyed event stream into validity intervals of
    * the tracked attribute. Keeps only the rows where `attrCol` differs
    * from its predecessor (null-safe) in (tsCol, tieBreak) order, then
    * derives `valid_from` = the change row's timestamp, `valid_to` = the
    * next change's timestamp (NULL = current) and a per-key `version`
    * counter. Two window passes over ONE hash exchange on the keys (same
    * partitioning, Catalyst fuses them). */
  def scd2(events: DataFrame, keys: Seq[String], tsCol: String,
      attrCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = col(tsCol) +: tieBreak.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    events
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .withColumn("_first", row_number().over(w) === 1)
      .filter(col("_first") || !(col("_prev") <=> col(attrCol)))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .drop("_prev", "_first")
  }
}
