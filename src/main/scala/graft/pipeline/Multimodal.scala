package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) as opaque `binary` columns with typed metadata,
  * processed in bounded batches inside narrow `mapPartitions` kernels —
  * the Scala analogue of a pandas-UDF/`mapInPandas` stage.
  *
  * The actual decoders are STUBBED (this container ships no image/audio
  * libraries): `decodeStub` derives a deterministic fake signal from the
  * bytes. Everything around the stub — schema, batching, partition
  * behavior, feature shapes — is real and tested, so swapping in a real
  * decoder is a one-function change.
  */
object Multimodal {

  final case class MediaFeatures(
      key: Long,
      media_bytes: Long, // payload size
      n_frames: Long, // frame-sample count at the configured stride
      width: Int, // stub "decoded" dimensions
      height: Int,
      embedding: Array[Float] // stub feature vector (dim fixed)
  )

  final val FrameStride = 4096
  final val EmbeddingDim = 16

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** STUB decoder: a real implementation would hand `bytes` to an image/
    * audio codec; this derives deterministic pseudo-content so the
    * pipeline shape (dims, frame count, embedding) is exercised end to
    * end with stable outputs.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 0xBEEFL
    var i = 0
    while (i < bytes.length) { h = mix(h ^ (bytes(i) & 0xFFL)); i += math.max(1, bytes.length / 64) }
    val width = 64 + (Math.floorMod(h, 193L)).toInt
    val height = 64 + (Math.floorMod(mix(h), 131L)).toInt
    val emb = new Array[Float](EmbeddingDim)
    var d = 0
    var z = h
    while (d < EmbeddingDim) { z = mix(z); emb(d) = (z >> 40).toFloat / (1 << 23); d += 1 }
    (width, height, emb)
  }

  /** Frame sampling stub: one "frame" every FrameStride bytes. */
  def frameCount(nBytes: Long): Long = nBytes / FrameStride + 1

  /** Narrow feature-extraction stage over (key, media) rows. Batches are
    * the partition iterators themselves — constant memory per task, no
    * shuffle; at 100 TB this is a pure map over the scan.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { case (key, bytes) =>
        val (w, h, emb) = decodeStub(bytes)
        MediaFeatures(key, bytes.length.toLong, frameCount(bytes.length.toLong), w, h, emb)
      }
    }
  }
}
