package graft.source

import org.apache.spark.sql.Dataset

/** Materialization-barrier policy for iterative plans.
  *
  * Every iterative operator in the engine (PageRank/PPR/HITS rounds,
  * connected components, k-means training, BPE merge rounds, the LSH
  * shingle tables, the global row-number construction) needs a hard
  * materialization point per round: it truncates the exponentially-deep
  * lineage and pins the round's result so later stages replay a scan, not
  * the whole history. `localCheckpoint()` is the right call in local mode —
  * zero filesystem traffic, blocks live in the executor block managers —
  * but it is NOT fault-tolerant on a real cluster: once lineage is
  * truncated, losing any executor that holds a pinned block fails the job,
  * because there is nothing left to recompute from. On a 1000-executor run
  * over 100 TB, executor loss is routine, so the scale-safe variant is a
  * RELIABLE checkpoint into the SparkContext checkpoint directory
  * (HDFS/object store), which survives any executor death.
  *
  * [[pin]] picks per the session conf `spark.graft.checkpoint`:
  *   - `auto` (default): reliable `Dataset.checkpoint()` when
  *     `SparkContext.setCheckpointDir` has been called (the operator knows
  *     it is on a cluster that configured durable storage), else
  *     `localCheckpoint()`. A local run needs no setup and keeps the fast
  *     path; a cluster run opts in with one `setCheckpointDir` call.
  *   - `local` / `reliable`: force one side (reliable without a configured
  *     dir fails loud rather than silently degrading to non-fault-tolerant
  *     blocks).
  *
  * Both sides are eager (materialize now) and both return a plan that
  * scans the pinned blocks, so the choice is invisible to results —
  * CheckpointSpec proves hash-identical output across the two policies for
  * a representative of each iterative family.
  */
object Checkpoint {
  val ModeConf = "spark.graft.checkpoint"

  /** Reliable `Dataset.checkpoint()` recomputes the plan a SECOND time to
    * write the checkpoint files unless the result is already cached —
    * persist first, checkpoint (reads the cached blocks), then drop the
    * cache (the returned plan scans the durable files, not the cache).
    * Without this every reliable pin costs ~2× the round's compute, on
    * exactly the iterative operators (BPE: hundreds of rounds) that pin
    * the most. The files themselves are GC'd by ContextCleaner because
    * GraftSession sets spark.cleaner.referenceTracking.cleanCheckpoints. */
  private def reliable[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pinned = ds.checkpoint()
    ds.unpersist(blocking = false)
    pinned
  }

  def pin[T](ds: Dataset[T]): Dataset[T] = {
    val session = ds.sparkSession
    val mode = session.conf.get(ModeConf, "auto")
    val dirSet = session.sparkContext.getCheckpointDir.isDefined
    mode match {
      case "local" => ds.localCheckpoint()
      case "reliable" =>
        if (!dirSet) throw new IllegalStateException(
          s"$ModeConf=reliable but no checkpoint directory is configured; " +
            "call SparkContext.setCheckpointDir(<durable path>) first " +
            "(a reliable checkpoint must outlive executor loss, so it " +
            "cannot silently fall back to local blocks)")
        reliable(ds)
      case "auto" => if (dirSet) reliable(ds) else ds.localCheckpoint()
      case other => throw new IllegalArgumentException(
        s"$ModeConf must be auto|local|reliable, got '$other'")
    }
  }

  /** `.pinned()` postfix form, so call sites read like the
    * `.localCheckpoint()` they replace. */
  implicit class PinOps[T](private val ds: Dataset[T]) extends AnyVal {
    def pinned(): Dataset[T] = pin(ds)
  }
}
