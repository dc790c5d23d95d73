package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches. The Spark side —
  * schema, partitioning, batch iteration, typed output — is real; the codec
  * itself is a clearly-marked deterministic STUB (media libraries are not
  * available in this environment; swap `decodeStub` for a real decoder and
  * nothing else changes). (Beyond the reference surface; required by the
  * build brief.)
  */
object Multimodal {

  case class MediaRow(id: Long, media: Array[Byte])
  case class DecodedMeta(id: Long, width: Int, height: Int, n_frames: Int,
                         n_bytes: Int)

  /** STUB decoder — deterministic fake that derives "decoded" metadata from
    * the byte stream alone. A real implementation would parse the container
    * header here (e.g. PNG IHDR / MP4 moov). */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (n % 640 + 16, (n * 7) % 480 + 16, n % 30 + 1)
  }

  /** Attach a binary media column derived from a string column (test stand-in
    * for real blobs; real pipelines read binary directly from parquet). */
  def withFakeMedia(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      col(srcCol).cast("binary").as("media"))

  /** Decode / feature-extract over partitions: batch-shaped iteration (the
    * Scala analogue of a batched pandas UDF) — each partition's rows stream
    * through the decoder without collecting to the driver. */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, f) = decodeStub(r.media)
        DecodedMeta(r.id, w, h, f, r.media.length)
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size block of the payload as one
    * "frame" (stub for video frame extraction); output is exploded rows of
    * (id, frame_idx, frame_bytes) — the shape a real extractor would emit. */
  def sampleFrames(df: DataFrame, stride: Int = 4, frameSize: Int = 16): DataFrame =
    df.select(col("id"),
        posexplode(
          filter(
            transform(sequence(lit(0), greatest((length(col("media")) / frameSize).cast("int") - 1, lit(0))),
              i => when(i % stride === 0,
                substring(col("media"), (i * frameSize + 1).cast("int"),
                  lit(frameSize)))),
            b => b.isNotNull)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")

  /** "Resize" stub: truncate/pad payload to a fixed budget (stand-in for an
    * image resize that bounds per-row cost downstream). */
  def resizeTo(df: DataFrame, budget: Int): DataFrame =
    df.withColumn("media", substring(col("media"), 1, budget))

  /** STUB feature extractor: a deterministic unit-norm embedding from hashed
    * byte features (feature-hashing of byte bigrams into `dims` buckets with
    * ±1 signs). The interface a real vision/audio encoder would fill — the
    * output column is the same `array<float>` the Similarity operators
    * (annTopK / annIvfTopK / cosineLshPairs) consume, so the
    * media → embedding → dedup/search pipeline composes end-to-end. */
  def embedStub(bytes: Array[Byte], dims: Int = 64): Array[Float] = {
    val v = new Array[Float](dims)
    var i = 0
    while (i < bytes.length - 1) {
      val h = bytes(i) * 31 + bytes(i + 1) // byte-bigram feature hash
      v(math.floorMod(h, dims)) += (if (((h >> 7) & 1) == 1) 1f else -1f)
      i += 1
    }
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0.0) { v(0) = 1f; v } else v.map(x => (x / n).toFloat)
  }

  case class EmbeddedRow(id: Long, embedding: Array[Float])

  /** Per-partition feature extraction: (id, media) → (id, embedding). */
  def embed(media: Dataset[MediaRow], dims: Int = 64): Dataset[EmbeddedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => EmbeddedRow(r.id, embedStub(r.media, dims))))
  }
}
