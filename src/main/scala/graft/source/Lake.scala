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

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(rows / targetRowsPerFile)` evenly-sized files. The streaming
    * sink and per-batch upserts leave thousands of KB-sized files per
    * partition; at 100 TB the scan's task-scheduling and footer-reading
    * overhead comes to dominate, so periodic compaction is part of the
    * lake's steady state. Targets a flat directory; for a day-partitioned
    * layout ([[Storage.savePartitionedByDay]]) compact each `day=...`
    * subdirectory — which is also what bounds the rewrite to recent
    * partitions instead of the archive. See [[replace]] for the swap's
    * visibility contract. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetRowsPerFile: Long): Unit = {
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    replace(df.repartition(nFiles), path)
  }

  /** Point-in-time lookup against an [[scd2]] history: for every probe row,
    * find the attribute state valid at its timestamp — WITHOUT a range
    * join. History change rows and probes are unioned and sorted once per
    * key; a running `last(ignoreNulls)` carries the latest change at or
    * before each probe (change rows sort before probes at equal
    * timestamps, so a state starting exactly at the probe time applies).
    * One hash exchange + one window — linear, where the equivalent
    * `valid_from <= t < valid_to` join is a range join the optimizer may
    * degrade to a per-key quadratic. `attrCols` must be non-null in
    * history (an SCD attribute legitimately-null would be skipped over by
    * the ignoreNulls fill); `tieCol` orders simultaneous changes (latest
    * wins, matching the half-open-interval semantics where a zero-width
    * interval is never observable). */
  def pointInTime(history: DataFrame, probes: DataFrame, keys: Seq[String],
      validFromCol: String, probeTsCol: String, attrCols: Seq[String],
      tieCol: String = "version"): DataFrame = {
    val h = history.select(keys.map(col) ++
      Seq(col(validFromCol).as("_t"), lit(false).as("_probe"),
        col(tieCol).as("_tie")) ++ attrCols.map(col): _*)
    val p = probes.select(keys.map(col) ++
      Seq(col(probeTsCol).as("_t"), lit(true).as("_probe"),
        lit(null).cast(history.schema(tieCol).dataType).as("_tie")) ++
      attrCols.map(c => lit(null).cast(history.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_probe"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.unionByName(p)
      .select(keys.map(col) ++ Seq(col("_t"), col("_probe")) ++
        attrCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("_probe"))
      .drop("_probe")
      .withColumnRenamed("_t", probeTsCol)
  }

  /** Apply a [[snapshotDiff]] change set to the old snapshot, reconstructing
    * the new one: drop the keys the diff removes or rewrites, append the
    * added/changed rows with their `new_` values. `patch` is manifest-sized
    * (O(delta)), so both sides of the anti join stay cheap and the union is
    * narrow — this is how a 100 TB replica applies an upstream CDC feed
    * without receiving the full table. PropSpec asserts the round trip
    * `applyDiff(old, snapshotDiff(old, new)) == new` over random snapshots. */
  def applyDiff(oldSnap: DataFrame, patch: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val touched = patch.select(keys.map(col): _*)
    val incoming = patch.filter(col("change").isin("added", "changed"))
      .select(keys.map(col) ++
        compareCols.map(c => col(s"new_$c").as(c)): _*)
    oldSnap.select((keys ++ compareCols).map(col): _*)
      .join(touched, keys, "left_anti")
      .unionByName(incoming)
  }

  /** Replace the parquet table at `path` with `df` via a staging-dir swap:
    * the new contents are fully written next to the table, then two renames
    * exchange them. Each rename is atomic, so a reader never lists a
    * HALF-WRITTEN directory — but it can race the instant between the two
    * renames and find the path briefly absent (the same contract as the
    * reference's tmp-file cache rewrite, storage.py:60-96; lake formats
    * close this gap with a catalog/manifest pointer swap, which needs a
    * transaction log this plain-parquet layout deliberately doesn't have).
    * `df` MAY read from `path` itself: the read happens while the old
    * directory is intact, the swap only after the staging write action
    * completes. */
  def replace(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val dest = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(path + "__staging")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    df.write.mode("overwrite").parquet(staging.toString)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(dest))
      require(fs.rename(dest, old), s"replace: could not stage out $path")
    require(fs.rename(staging, dest), s"replace: could not swap in $path")
    fs.delete(old, true)
  }

  /** Compaction PLAN over a small-file manifest — which input files merge
    * into which output file, decided without touching the data. Files are
    * packed in `orderKey` order by exact integer running sum:
    * bin = (cum − 1) div targetRows, so every file lands in exactly one
    * bin and every bin but the last closes within one input file of the
    * target. Order-preserving greedy (vs first-fit-decreasing, which is
    * inherently sequential and unreplayable) keeps time-adjacent files in
    * the same output — the property that preserves temporal clustering
    * and partition-pruning value through the rewrite. The running sum is
    * the bucket-offset construction ([[graft.analytics.Ranking
    * .withGlobalRunningSum]]) — O(manifest) work, no single-partition
    * window, no driver-side loop: planning stays distributed even for a
    * 10⁷-file lake.
    *
    * @param orderKey numeric, non-null, the packing order (e.g. epoch of
    *                 the file's hour partition)
    * @return one row per planned OUTPUT file: bin, input-file count,
    *         total rows, and the covered key span */
  def compactionPlan(manifest: DataFrame, file: Column, orderKey: Column,
      rows: Column, targetRows: Long): DataFrame = {
    require(targetRows > 0, s"compactionPlan: targetRows must be > 0")
    val m = manifest.select(file.as("file"), orderKey.as("k"),
      rows.cast("long").as("n_rows"))
    graft.analytics.Ranking.withGlobalRunningSum(
        m, col("k").cast("double"), Seq(col("k")), col("n_rows"))
      .withColumn("bin", expr(s"(cum - 1L) div ${targetRows}L"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("total_rows"),
        min(col("k")).as("first_key"), max(col("k")).as("last_key"))
  }

  /** Zone-map manifest: per-file row count + min/max of the given columns
    * (one narrow aggregate keyed by `input_file_name`). This is the
    * data-skipping index Delta/Iceberg keep in their transaction logs —
    * over plain parquet it lets a planner drop whole FILES before listing
    * or opening them (one level above parquet's own row-group stats, which
    * still require reading every footer). O(files) rows on the driver side
    * only if collected; kept distributed here. */
  def skippingManifest(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** Bit-interleave two `bits`-wide non-negative long cells into their
    * Morton (Z-curve) code: bit i of `cx` lands at position 2i, bit i of
    * `cy` at 2i+1. Pure long arithmetic (shift/mask/add) — codegen'd,
    * exactly replayable in any engine with integer bit ops. */
  def zInterleave(cx: Column, cy: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(cx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(cy, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Z-order clustering quality, materialized: rank-normalize two
    * dimensions (percentile cells, so value skew cannot starve the grid —
    * the same move Delta's OPTIMIZE ZORDER makes by range-partition id),
    * interleave the cells into a Morton code, cut the z-ordered sequence
    * into `tiles` equal files, and emit each tile's zone-map row
    * (count + min/max of BOTH dims). Z-locality makes both spans tight
    * simultaneously — the property that lets a manifest
    * ([[skippingManifest]]) skip files for predicates on EITHER column,
    * where a single-column sort gives tight spans on one dim and
    * full-range spans on the other.
    *
    * Scale shape: three [[graft.analytics.Ranking.withGlobalRowNumber]]
    * passes (bucket-offset numbering — no single-partition window), one
    * narrow interleave expression, one O(tiles) aggregate. All-integer
    * output: rank cells and Morton codes are exact longs on any engine, so
    * the oracle parity carries no float surface. `id` must be a row-unique
    * long (the rank tiebreak — numbering is deterministic only under a
    * total order). Cell arithmetic uses integer division (never a double
    * floor: (rn−1)·2^bits can pass 2^53 at fact-table scale). */
  def zorderTiles(df: DataFrame, x: Column, y: Column, id: Column,
      tiles: Int = 32, bits: Int = 16): DataFrame = {
    import graft.analytics.Ranking
    val base = df.select(x.as("x"), y.as("y"), id.as("id"))
    val (rx, n) = Ranking.withGlobalRowNumber(
      base, col("x"), Seq(col("x"), col("id")), "rx")
    val (ry, _) = Ranking.withGlobalRowNumber(
      rx, col("y"), Seq(col("y"), col("id")), "ry")
    val scale = 1L << bits
    val cells = ry
      .withColumn("cx", expr(s"(rx - 1L) * $scale div ${n}L"))
      .withColumn("cy", expr(s"(ry - 1L) * $scale div ${n}L"))
      .withColumn("zval", zInterleave(col("cx"), col("cy"), bits))
    val (zr, _) = Ranking.withGlobalRowNumber(
      cells, col("zval"), Seq(col("zval"), col("id")), "zr")
    zr.withColumn("tile", expr(s"(zr - 1L) * $tiles div ${n}L"))
      .groupBy("tile")
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  /** Manifest-driven pruned read: keep only the files whose [min, max]
    * range can contain `value`, and scan just those. Equality-predicate
    * flavor of zone-map skipping; the collect is O(surviving files) of
    * path strings — manifest-sized, never data-sized. */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, path: String,
      column: String, value: Column): DataFrame = {
    val manifest = skippingManifest(spark.read.parquet(path), Seq(column))
    val files = manifest
      .filter(col(s"min_$column") <= value && value <= col(s"max_$column"))
      .select("file").collect().map(_.getString(0))
    if (files.isEmpty) spark.read.parquet(path).filter(col(column) === value).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*).filter(col(column) === value)
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
