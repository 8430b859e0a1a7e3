package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) as opaque `binary` columns with typed metadata,
  * processed in bounded batches inside narrow `mapPartitions` kernels —
  * the Scala analogue of a pandas-UDF/`mapInPandas` stage.
  *
  * Self-contained formats are decoded for REAL: BMP headers (magic, pixel
  * dimensions, bit depth from the actual bytes) and WAV PCM (channels,
  * sample rate, sample count -> duration). The embedding stage is a REAL
  * content featurizer over the parsed payloads (`contentEmbedding`: BMP
  * block-mean intensities, WAV per-window energies, byte histogram
  * otherwise — exact integer sums, oracle-checked numerically by q47).
  * It is also the declared seam where a LEARNED image/audio encoder would
  * plug in — no ML runtime ships in this container, so the learned model
  * itself is the one absent piece; everything around it (schema,
  * partitioning, batch shape, parse, feature math) is real and tested.
  */
object Multimodal {

  final case class MediaFeatures(
      key: Long,
      media_kind: String, // "bmp" | "wav" | "unknown" (magic-sniffed)
      media_bytes: Long, // payload size
      n_frames: Long, // frame-sample count at the configured stride
      width: Option[Int], // real parsed dims (BMP), None otherwise
      height: Option[Int],
      duration_us: Option[Long], // real parsed duration (WAV), None otherwise
      embedding: Array[Float] // content features (contentEmbedding, dim fixed)
  )

  final val FrameStride = 4096
  final val EmbeddingDim = 16

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  @inline private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) | ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Parsed BMP header (BITMAPINFOHEADER layout). */
  final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int)

  /** Real BMP parse: 'BM' magic, 54-byte header, little-endian dims at
    * offsets 18/22, bit depth at 28. Returns None unless the payload is a
    * structurally valid BMP (header complete, positive dims, declared
    * pixel-array size fits the payload).
    */
  def decodeBmp(bytes: Array[Byte]): Option[BmpInfo] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    if (width <= 0 || height <= 0 || (bpp != 24 && bpp != 32 && bpp != 8)) return None
    val rowSize = ((width.toLong * bpp + 31) / 32) * 4
    val dataOffset = le32(bytes, 10)
    if (dataOffset < 54 || dataOffset.toLong + rowSize * height > bytes.length) return None
    Some(BmpInfo(width, height, bpp))
  }

  /** Parsed WAV fmt+data summary. */
  final case class WavInfo(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nSamples: Long // per channel
  ) {
    def durationUs: Long = nSamples * 1000000L / sampleRate
  }

  /** Real WAV PCM parse: RIFF/WAVE magic, then chunk walk to 'fmt ' and
    * 'data'. Returns None unless both chunks are present and consistent.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var off = 12L
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var dataLen = -1L
    var ok = true
    while (ok && off + 8 <= bytes.length) {
      val o = off.toInt
      val id = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(bytes, o + 4).toLong & 0xFFFFFFFFL
      // A declared size that overruns the payload means the header is
      // inconsistent — stop the walk rather than loop or index past the end.
      // Exception: a *final* 'data' chunk that overruns is the classic
      // truncated-download shape; clamp it to the bytes actually present
      // (salvaging the media) instead of rejecting. Mid-stream overruns of
      // any other chunk still reject — there is no safe way to resume the
      // walk past them.
      // First 'data' chunk wins in both cases — findWavData returns the
      // first chunk's payload offset, so a later (possibly corrupt) 'data'
      // chunk must never clobber an already-parsed length.
      if (size > bytes.length - off - 8) {
        if (id == "data" && dataLen < 0) dataLen = bytes.length - off - 8
        ok = false
      } else {
        if (id == "fmt " && off + 8 + 16 <= bytes.length) {
          channels = le16(bytes, o + 10)
          sampleRate = le32(bytes, o + 12)
          bits = le16(bytes, o + 22)
        } else if (id == "data" && dataLen < 0) {
          dataLen = size
        }
        off += 8L + size + (size & 1L) // chunks are word-aligned
      }
    }
    if (channels <= 0 || sampleRate <= 0 || bits < 8 || bits % 8 != 0 || dataLen < 0) None
    else Some(WavInfo(channels, sampleRate, bits, dataLen / (channels.toLong * (bits / 8))))
  }

  /** Shared safe chunk walk: byte offset of the 'data' chunk payload, or -1.
    * Same overrun guard as [[decodeWav]] — never loops or indexes past end.
    */
  private def findWavData(bytes: Array[Byte]): Int = {
    var off = 12L
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val id = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(bytes, o + 4).toLong & 0xFFFFFFFFL
      // mirror decodeWav: a truncated final 'data' chunk still has a valid
      // payload start (its length is clamped by decodeWav's WavInfo)
      if (id == "data") return o + 8
      if (size > bytes.length - off - 8) return -1
      off += 8L + size + (size & 1L)
    }
    -1
  }

  /** Deterministic synthetic BMP (24-bit, valid header + padded pixel
    * rows) — the builder half of the parse round-trip used by tests and
    * the q27 oracle.
    */
  def synthBmp(width: Int, height: Int, seed: Long = 0L): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = ((width * 24 + 31) / 32) * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    def w32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def w16(off: Int, v: Int): Unit = { out(off) = v.toByte; out(off + 1) = (v >> 8).toByte }
    w32(2, out.length) // file size
    w32(10, 54) // pixel array offset
    w32(14, 40) // BITMAPINFOHEADER size
    w32(18, width)
    w32(22, height)
    w16(26, 1) // planes
    w16(28, 24) // bpp
    w32(34, dataSize)
    var z = seed
    var i = 54
    while (i < out.length) { z = mix(z); out(i) = (z & 0xFF).toByte; i += 1 }
    out
  }

  /** Deterministic synthetic 16-bit PCM WAV — builder half for tests/q27. */
  def synthWav(channels: Int, sampleRate: Int, nSamples: Long, seed: Long = 0L): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nSamples >= 0)
    val dataSize = (nSamples * channels * 2).toInt
    val out = new Array[Byte](44 + dataSize)
    def put(off: Int, s: String): Unit = { var i = 0; while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 } }
    def w32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def w16(off: Int, v: Int): Unit = { out(off) = v.toByte; out(off + 1) = (v >> 8).toByte }
    put(0, "RIFF"); w32(4, 36 + dataSize); put(8, "WAVE")
    put(12, "fmt "); w32(16, 16); w16(20, 1 /* PCM */); w16(22, channels)
    w32(24, sampleRate); w32(28, sampleRate * channels * 2); w16(32, channels * 2); w16(34, 16)
    put(36, "data"); w32(40, dataSize)
    var z = seed
    var i = 44
    while (i < out.length) { z = mix(z); out(i) = (z & 0xFF).toByte; i += 1 }
    out
  }

  /** REAL nearest-neighbor resize of a 24-bit BMP payload: parses the
    * header, samples the (bottom-up, row-padded) pixel array, and emits a
    * valid BMP of the new dimensions. Returns None for non-BMP/invalid
    * payloads. This is the resize stage of the media pipeline operating
    * on actual bytes, not a stub.
    */
  def resizeBmp(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
    decodeBmp(bytes).flatMap { info =>
      if (info.bitsPerPixel != 24 || newW <= 0 || newH <= 0) None
      else {
        val srcRow = (((info.width.toLong * 24 + 31) / 32) * 4).toInt // Long math: see contentEmbedding
        val dataOffset = le32(bytes, 10)
        val out = synthBmp(newW, newH) // valid header; pixels overwritten below
        val dstRow = ((newW * 24 + 31) / 32) * 4
        var y = 0
        while (y < newH) {
          val sy = (y.toLong * info.height / newH).toInt
          var x = 0
          while (x < newW) {
            val sx = (x.toLong * info.width / newW).toInt
            val src = dataOffset + sy * srcRow + sx * 3
            val dst = 54 + y * dstRow + x * 3
            out(dst) = bytes(src)
            out(dst + 1) = bytes(src + 1)
            out(dst + 2) = bytes(src + 2)
            x += 1
          }
          // zero the row padding for determinism
          var p = 54 + y * dstRow + newW * 3
          while (p < 54 + (y + 1) * dstRow) { out(p) = 0; p += 1 }
          y += 1
        }
        Some(out)
      }
    }
  }

  /** Frame sampling over a WAV payload: keep every `stride`-th sample
    * (per channel), emitting a valid shorter WAV at the same rate /
    * channel count. None for non-WAV payloads.
    */
  def sampleWav(bytes: Array[Byte], stride: Int): Option[Array[Byte]] = {
    decodeWav(bytes).flatMap { info =>
      // decodeWav success implies a consistent 'data' chunk, so the guarded
      // walk re-finds it; the srcData<0 branch is belt-and-braces only.
      val srcData = findWavData(bytes)
      if (info.bitsPerSample != 16 || stride <= 0 || srcData < 0) None
      else {
        val kept = (info.nSamples + stride - 1) / stride
        val out = synthWav(info.channels, info.sampleRate, kept)
        val frame = info.channels * 2
        var s = 0L
        var w = 0
        while (s < info.nSamples) {
          val src = srcData + (s * frame).toInt
          val dst = 44 + w * frame
          var b = 0
          while (b < frame) { out(dst + b) = bytes(src + b); b += 1 }
          s += stride
          w += 1
        }
        Some(out)
      }
    }
  }

  /** REAL content featurizer over the parsed payload (EmbeddingDim = 16):
    *  - 24-bit BMP: 4x4 grid of block-mean pixel intensities — pixels are
    *    read from the actual (stored-row-order, padded) pixel array; block
    *    of stored row r / column x is (r*4/h, x*4/w); value = mean of the
    *    block's channel bytes / 255;
    *  - 16-bit WAV PCM: 16 equal time windows over the interleaved sample
    *    stream; value = mean |sample| of the window / 32768 (per-window
    *    energy);
    *  - anything else: high-nibble byte histogram, normalized.
    * All sums are exact integer arithmetic with ONE final division, so the
    * float32 outputs are bit-reproducible in SQL — q47 pins them against a
    * DuckDB recomputation. This function is also the declared seam for a
    * learned encoder: swap the body for a model call and the surrounding
    * pipeline (schema, batching, near-dup tiers) is unchanged.
    */
  def contentEmbedding(bytes: Array[Byte]): Array[Float] = {
    val emb = new Array[Float](EmbeddingDim)
    val bmp = decodeBmp(bytes)
    bmp match {
      case Some(info) if info.bitsPerPixel == 24 =>
        // Long math like decodeBmp's bound check: width*24 wraps Int for
        // very wide images; the true rowSize fits Int because decodeBmp
        // proved rowSize*height <= bytes.length
        val rowSize = (((info.width.toLong * 24 + 31) / 32) * 4).toInt
        val off = le32(bytes, 10)
        val sums = new Array[Long](EmbeddingDim)
        val cnts = new Array[Long](EmbeddingDim)
        var r = 0
        while (r < info.height) {
          val byBase = (r * 4 / info.height) * 4
          var x = 0
          while (x < info.width) {
            val d = byBase + x * 4 / info.width
            val p = off + r * rowSize + x * 3
            sums(d) += (bytes(p) & 0xFF) + (bytes(p + 1) & 0xFF) + (bytes(p + 2) & 0xFF)
            cnts(d) += 3
            x += 1
          }
          r += 1
        }
        var d = 0
        while (d < EmbeddingDim) {
          if (cnts(d) > 0) emb(d) = (sums(d).toDouble / (cnts(d).toDouble * 255.0)).toFloat
          d += 1
        }
      case _ =>
        decodeWav(bytes) match {
          case Some(w) if w.bitsPerSample == 16 && w.nSamples > 0 =>
            val data = findWavData(bytes)
            val nVals = w.nSamples * w.channels // int16 values present (clamped)
            val sums = new Array[Long](EmbeddingDim)
            val cnts = new Array[Long](EmbeddingDim)
            var i = 0L
            while (i < nVals) {
              val p = data + (i * 2).toInt
              val v = ((bytes(p) & 0xFF) | (bytes(p + 1) << 8)).toShort.toInt
              val d = (i * EmbeddingDim / nVals).toInt
              sums(d) += math.abs(v)
              cnts(d) += 1
              i += 1
            }
            var d = 0
            while (d < EmbeddingDim) {
              if (cnts(d) > 0) emb(d) = (sums(d).toDouble / (cnts(d).toDouble * 32768.0)).toFloat
              d += 1
            }
          case _ =>
            if (bytes.length > 0) {
              val counts = new Array[Long](EmbeddingDim)
              var i = 0
              while (i < bytes.length) { counts((bytes(i) & 0xFF) >>> 4) += 1; i += 1 }
              var d = 0
              while (d < EmbeddingDim) {
                emb(d) = (counts(d).toDouble / bytes.length.toDouble).toFloat
                d += 1
              }
            }
        }
    }
    emb
  }

  /** Frame sampling: one "frame" every FrameStride bytes. */
  def frameCount(nBytes: Long): Long = nBytes / FrameStride + 1

  /** Narrow feature-extraction stage over (key, media) rows: magic-sniff,
    * parse BMP/WAV for real, stub-embed. Batches are the partition
    * iterators themselves — constant memory per task, no shuffle; at
    * 100 TB this is a pure map over the scan.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { case (key, bytes) =>
        val emb = contentEmbedding(bytes)
        val nFrames = frameCount(bytes.length.toLong)
        decodeBmp(bytes) match {
          case Some(bmp) =>
            MediaFeatures(key, "bmp", bytes.length.toLong, nFrames,
              Some(bmp.width), Some(bmp.height), None, emb)
          case None => decodeWav(bytes) match {
            case Some(wav) =>
              MediaFeatures(key, "wav", bytes.length.toLong, nFrames,
                None, None, Some(wav.durationUs), emb)
            case None =>
              MediaFeatures(key, "unknown", bytes.length.toLong, nFrames,
                None, None, None, emb)
          }
        }
      }
    }
  }
}
