package graft.media

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star): treat media as opaque `binary`
  * payloads with typed metadata, decode/feature-extract via a batched
  * per-partition pass over a typed Dataset — the Scala analogue of a Pandas
  * `mapInPandas` batch UDF: one decoder instantiation per partition, not per
  * row, and the exchange-free narrow plan keeps the scan streaming.
  *
  * The container has no image/audio codecs, so the decode step is STUBBED
  * behind [[MediaDecoder]] with a deterministic fake ([[FakeDecoder]]); the
  * Spark-side plumbing — schema, binary payload handling, partition-batched
  * UDF shape — is real and tested. Swap in a real JPEG/PNG/PCM decoder per
  * `kind` to productionize.
  */
object Multimodal {

  case class MediaRecord(event_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(event_id: Long, kind: String, byte_len: Int,
    checksum: Long, width: Int, height: Int, frames: Int)

  trait MediaDecoder extends Serializable {
    /** payload → (width, height, frames). */
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int)
  }

  /** Deterministic stand-in: dimensions derived from payload bytes.
    * A real implementation would dispatch on `kind` to javax.imageio /
    * an audio frame parser — unavailable in this offline container. */
  object FakeDecoder extends MediaDecoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val h = payload.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
      val w = (math.abs(h) % 64 + 1).toInt * 16
      val ht = (math.abs(h >> 8) % 64 + 1).toInt * 16
      val fr = if (kind == "view") (math.abs(h >> 16) % 30 + 1).toInt else 1
      (w, ht, fr)
    }
  }

  /** events → typed media records (props stands in for the media payload). */
  def mediaRecords(events: DataFrame): Dataset[MediaRecord] = {
    import events.sparkSession.implicits._
    events.select(col("event_id"), col("event_type").as("kind"),
      col("props").cast("binary").as("payload")).as[MediaRecord]
  }

  /** Frame sampling over an opaque payload: chop the payload into
    * fixed-width frames and keep every `stride`-th one, emitting a checksum
    * per sampled frame — the Spark-side plumbing of video frame-sampling
    * (schema, explode shape, per-frame work), with the codec stubbed as a
    * deterministic md5 so the operator is fully oracle-checkable. The short
    * `props` string stands in for the payload, tiled `repeatN` times to give
    * each event a multi-frame body. Narrow: sequence + explode over the
    * row's own payload, no shuffle. */
  def frameSample(events: DataFrame, repeatN: Int = 64, frameChars: Int = 16,
      stride: Int = 4): DataFrame = {
    // The tiled payload is periodic with period len(props), so frame f's
    // content is substring(tiled, (f·w mod len) + 1, w) over a MINIMAL tile
    // (just enough repeats to cover offset + one frame). The full
    // repeatN-tiled payload is never materialized — carrying it through the
    // explode would memcpy ~repeatN× the source bytes per emitted frame
    // row, the per-row blowup a real decode pipeline also avoids by
    // seeking into the container instead of buffering the whole clip.
    events
      .select(col("event_id"), col("props"), length(col("props")).as("_len"))
      .withColumn("_n_frames", floor(col("_len").cast("long") * repeatN / frameChars))
      .select(col("event_id"), col("props"), col("_len"), col("_n_frames"),
        explode(when(col("_n_frames") >= 1,
            sequence(lit(0L), col("_n_frames") - 1, lit(stride.toLong)))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))).as("frame_idx"))
      .select(col("event_id"), col("frame_idx"), col("_n_frames").as("n_frames"),
        md5(expr(s"substring(repeat(props, CAST(ceil(($frameChars + _len - 1) / _len) AS INT)), " +
          s"CAST(frame_idx * $frameChars % _len AS INT) + 1, $frameChars)"))
          .as("frame_md5"))
  }

  /** Perceptual-hash (aHash) near-dup clustering over the opaque media
    * payload: tile the payload 8×, slice it into 64 cells, sum each
    * cell's byte values, and set bit i when cell i exceeds the payload
    * mean — the average-hash construction real image dedup runs on
    * decoded luma grids (the decode is the stubbed step here; the grid →
    * bits → cluster plumbing is the real operator). Payloads that differ
    * in a few bytes keep most cell means, hence most bits — unlike
    * [[extractFeatures]]' exact checksum, which any single-byte change
    * escapes.
    *
    * All arithmetic is EXACT integers: bit i is the comparison
    * 64·cell_i > total (no float mean), and the hash is carried as four
    * 16-bit chunks. Scale shape: ONE narrow O(len) per-row pass
    * ([[graft.expr.AHashChunk]] — the 8×-tiling makes all 64 cell sums a
    * period-8 repeat of 8 slice sums, so every 16-bit chunk equals the
    * 8-bit pattern · 257; see its scaladoc for the bit-exact derivation),
    * then one groupBy on the hash for cluster labels. The previous plan
    * exploded 8 shuffle rows per payload byte through a (event, cell)
    * aggregate + per-event window — 8× the corpus byte volume through the
    * shuffle at 100 TB; this one shuffles only the 100-byte hash rows.
    * Clusters key on the FULL 64-bit hash (exact-quantized near-dup); the
    * chunk columns are emitted so a banded hamming join can consume them
    * downstream. Rows with empty payloads are dropped (nothing to hash).
    */
  def phashClusters(events: DataFrame): DataFrame = {
    val hashes = events
      .filter(col("props").isNotNull && length(col("props")) > 0)
      .select(col("event_id"),
        graft.expr.AHashChunk.ahashChunk(col("props")).as("h0"))
      .select(col("event_id"), col("h0"), col("h0").as("h1"),
        col("h0").as("h2"), col("h0").as("h3"))
    val clusters = hashes.groupBy("h0", "h1", "h2", "h3")
      .agg(min(col("event_id")).as("phash_cluster"),
        count(lit(1)).as("cluster_size"))
    hashes.join(clusters, Seq("h0", "h1", "h2", "h3"))
      .select(col("event_id"), col("h0"), col("h1"), col("h2"), col("h3"),
        col("phash_cluster"), col("cluster_size"),
        (col("event_id") === col("phash_cluster")).cast("int").as("keep"))
  }

  /** Near-duplicate CLUSTER pairs by banded Hamming join over the aHash
    * pattern table — the downstream join [[phashClusters]]' chunks exist
    * for, run at the right granularity for 100 TB: dedupe exact-hash
    * clusters first (the groupBy phashClusters already does), then band
    * the DISTINCT patterns (≤ 2⁸ rows here — hash-table-sized, never
    * corpus-sized) and verify candidates with one xor+bit_count.
    * Pigeonhole: the 8-bit pattern splits into three bands (3+3+2 bits);
    * any pair within Hamming distance 2 flips bits in at most 2 bands, so
    * it agrees on ≥ 1 band and candidates come from a band equi-join,
    * never all-pairs. Emits each qualifying cluster pair with both 8-bit
    * and full-64-bit distances (the 64-bit hash is the pattern repeated
    * 8× — see [[graft.expr.AHashChunk]] — so hd64 = 8·hd8 exactly). */
  def phashNeighbors(events: DataFrame, maxDist: Int = 2): DataFrame = {
    val clusters = phashClusters(events)
      .filter(col("keep") === 1)
      .select(expr("h0 div 257").as("p"), // h0 = P*257 exactly
        col("phash_cluster"), col("cluster_size"))
    val banded = clusters.select(col("p"), col("phash_cluster"),
      col("cluster_size"),
      explode(array(
        struct(lit(0).as("bi"), (col("p") % 8).as("nib")),
        struct(lit(1).as("bi"), expr("(p div 8) % 8").as("nib")),
        struct(lit(2).as("bi"), expr("p div 64").as("nib"))))
        .as("b"))
      .select(col("p"), col("phash_cluster"), col("cluster_size"),
        col("b.bi"), col("b.nib"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.bi") === col("b.bi") && col("a.nib") === col("b.nib") &&
          col("a.phash_cluster") < col("b.phash_cluster"))
      .select(col("a.p").as("pa"), col("b.p").as("pb"),
        col("a.phash_cluster").as("cluster_a"),
        col("b.phash_cluster").as("cluster_b"),
        col("a.cluster_size").as("size_a"),
        col("b.cluster_size").as("size_b"))
      // Load-bearing: a pair within the distance budget can agree on MORE
      // than one band (e.g. HD=1 flips a single band and matches the other
      // two), so the band join emits that pair once per agreeing band.
      // distinct() collapses those multi-band hits to one candidate row —
      // required for correct output cardinality, not just hygiene.
      .distinct()
    cand
      .select(col("cluster_a"), col("cluster_b"), col("size_a"),
        col("size_b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long").as("hd8"))
      .filter(col("hd8") <= maxDist && col("hd8") > 0)
      .select(col("cluster_a"), col("cluster_b"), col("size_a"),
        col("size_b"), col("hd8"), (col("hd8") * 8L).as("hd64"))
  }

  case class MediaResize(event_id: Long, kind: String, width: Int,
    height: Int, new_width: Int, new_height: Int, scale: Double)

  /** Resize planning: decode each payload's dimensions, then compute the
    * aspect-preserving target box under `maxDim` (single scale factor,
    * never upscale, floor to integer pixels, min 1) — the sizing pass an
    * image-training pipeline runs before the actual resample. The pixel
    * resample itself is the stubbed step (no codecs in this container); the
    * Spark shape — typed records, partition-batched decoder init, narrow
    * map, no shuffle — is the real plumbing, and the dimension arithmetic
    * is plain IEEE ops, so the whole plan is oracle-checked. */
  def resizePlan(events: DataFrame, maxDim: Int = 256,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaResize] = {
    import events.sparkSession.implicits._
    mediaRecords(events).mapPartitions { it =>
      it.map { r =>
        val (w, h, _) = decoder.decode(r.kind, r.payload)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val nw = math.max(1, math.floor(w * scale).toInt)
        val nh = math.max(1, math.floor(h * scale).toInt)
        MediaResize(r.event_id, r.kind, w, h, nw, nh, scale)
      }
    }
  }

  /** Partition-batched decode + feature extraction. */
  def extractFeatures(events: DataFrame,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import events.sparkSession.implicits._
    mediaRecords(events).mapPartitions { it =>
      // per-partition init point (real decoders allocate here, once)
      it.map { r =>
        val (w, h, f) = decoder.decode(r.kind, r.payload)
        val checksum = r.payload.foldLeft(0L)((acc, b) => acc + (b & 0xff))
        MediaFeatures(r.event_id, r.kind, r.payload.length, checksum, w, h, f)
      }
    }
  }
}
