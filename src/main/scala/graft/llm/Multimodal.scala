package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a per-partition
  * decode/feature-extract stage (the Scala analog of a batched
  * `mapInPandas` decode UDF: one iterator pass per partition, bounded
  * memory, no driver round-trip).
  *
  * Decode status by modality: IMAGES decode for REAL via the JDK's
  * ImageIO (PNG/JPEG/GIF/BMP) and AUDIO via javax.sound.sampled
  * (WAV/AIFF/AU) — no external codec needed; VIDEO (and any payload
  * the JDK can't parse) falls back to the clearly-marked deterministic
  * stub, since the JDK has no container/codec support. The Spark-side
  * plumbing is identical either way and is also exercised as an
  * oracle-checked query (q42_multimodal_meta) over text payloads
  * re-encoded as binary.
  *
  * Scale notes: media blobs dominate row size, so the feature extractor
  * projects blobs away as soon as features are computed (column pruning
  * does the rest); decode parallelism is partition-count × cores with
  * no shuffle — repartition upstream by media_id if blob-size skew
  * starves executors.
  */
object Multimodal {

  /** One media object: opaque payload + the metadata a catalog carries. */
  final case class MediaRow(
      media_id: Long,
      mime: String,
      content: Array[Byte])

  /** Decoded features: pseudo-dimensions + a fixed-width feature vector. */
  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      byte_len: Long,
      width: Int,
      height: Int,
      feature: Array[Float])

  val FeatureDim = 8

  /** STUB decoder ===========================================================
    * Stands in for an image/audio decode (JPEG/PNG/WAV...). Deterministic
    * fake: "dimensions" and the feature vector are derived from the raw
    * bytes with a rolling hash, so tests are reproducible and the
    * downstream plumbing (schema, batching, pruning) is exercised for
    * real. Replace the body with an actual codec call in production.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 1125899906842597L // rolling polynomial hash over the payload
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val width = 16 + (math.abs(h % 1024)).toInt
    val height = 16 + (math.abs((h >> 10) % 1024)).toInt
    val feature = Array.tabulate(FeatureDim) { d =>
      // spread hash bits into [-1, 1) floats per feature dimension
      (((h >> (d * 7)) & 0xffff).toFloat / 32768f) - 1f
    }
    (width, height, feature)
  }

  /** REAL image decode via the JDK's ImageIO — PNG/JPEG/GIF/BMP need
    * no external codec. Dimensions come from the image HEADER (read
    * before any pixel decode); the feature vector is an 8-bin luminance
    * histogram over a ≤64×64 probe grid, decoded with ImageReadParam
    * source SUBSAMPLING so the materialized raster is bounded (~64×64)
    * no matter how large the source — a multi-gigapixel blob never
    * allocates its full raster on an executor. (The subsampling offsets
    * select exactly the pixels a stride-stepped probe of the full
    * raster would, so histogram values are unchanged.) Returns None for
    * payloads ImageIO can't decode — callers fall back to
    * [[decodeStub]].
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    scala.util.Try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            val stepX = math.max(1, w / 64)
            val stepY = math.max(1, h / 64)
            val param = reader.getDefaultReadParam
            param.setSourceSubsampling(stepX, stepY, 0, 0)
            val img = reader.read(0, param)
            val bins = new Array[Float](FeatureDim)
            var n = 0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                  (rgb & 0xFF) * 114) / 1000
                bins(lum * FeatureDim / 256) += 1f
                n += 1
                x += 1
              }
              y += 1
            }
            var i = 0
            while (i < FeatureDim) { if (n > 0) bins(i) /= n; i += 1 }
            Some((w, h, bins))
          } finally reader.dispose()
        }
      } finally iis.close()
    }.toOption.flatten

  /** REAL audio decode via the JDK's javax.sound.sampled — WAV/AIFF/AU
    * need no external codec. "Width" carries the sample rate (Hz) and
    * "height" the channel count; the feature is an 8-bin absolute-
    * amplitude histogram over a bounded prefix of 16-bit PCM frames.
    * Returns None for formats the JDK can't parse — callers fall back
    * to [[decodeStub]].
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    scala.util.Try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        // only signed 16-bit PCM is sample-decoded; other encodings
        // (8-bit, float, u-law...) fall back to the stub rather than
        // histogramming misframed bytes. AIFF/AU are big-endian, WAV
        // little-endian — honor the header instead of assuming.
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val big = fmt.isBigEndian
          val bins = new Array[Float](FeatureDim)
          val buf = new Array[Byte](4096)
          var n = 0
          var read = in.read(buf)
          var budget = 1 << 20 // bounded prefix: huge files cost O(1)
          while (read > 0 && budget > 0) {
            var i = 0
            while (i + 1 < read) {
              val s =
                if (big) ((buf(i) << 8) | (buf(i + 1) & 0xFF)).toShort
                else ((buf(i + 1) << 8) | (buf(i) & 0xFF)).toShort
              bins(math.min(FeatureDim - 1,
                math.abs(s.toInt) * FeatureDim / 32768)) += 1f
              n += 1
              i += 2
            }
            budget -= read
            read = in.read(buf)
          }
          var i = 0
          while (i < FeatureDim) { if (n > 0) bins(i) /= n; i += 1 }
          Some((fmt.getSampleRate.toInt, fmt.getChannels, bins))
        }
      } finally in.close()
    }.toOption.flatten

  /** Decode dispatch: REAL decoders for the modalities the JDK ships
    * codecs for (images via ImageIO, audio via javax.sound), the
    * clearly-marked stub for everything else (video stays stubbed —
    * no container/codec support in the JDK).
    */
  def decode(mime: String, bytes: Array[Byte]): (Int, Int, Array[Float]) =
    (if (mime.startsWith("image/")) decodeImage(bytes)
     else if (mime.startsWith("audio/")) decodeAudio(bytes)
     else None).getOrElse(decodeStub(bytes))

  /** Batched decode/feature-extract: one streaming pass per partition
    * (the mapInPandas shape), blobs dropped from the output row.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, feat) = decode(r.mime, r.content)
        MediaFeatures(r.media_id, r.mime, r.content.length.toLong, w, h, feat)
      }
    }
  }

  /** STUB resize: deterministic fake of an image resize — real
    * implementation would decode, scale, re-encode; the fake re-hashes
    * the payload with the target dims so outputs are reproducible and
    * dimension plumbing is testable. Batch shape identical to
    * [[extractFeatures]].
    */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, _, feat) = decodeStub(r.content ++ s"@${width}x$height".getBytes)
        MediaFeatures(r.media_id, r.mime, r.content.length.toLong,
          width, height, feat)
      }
    }
  }

  /** STUB frame sampling: emits `n` evenly spaced "frames" per media
    * row (one row per frame — the explode shape a video pipeline
    * produces), each with features derived from the payload slice the
    * frame would decode from.
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.content.length
      (0 until n).map { i =>
        val from = if (n == 1) 0 else (i.toLong * len / n).toInt
        val slice = r.content.slice(from, math.min(from + 256, len))
        val (w, h, feat) = decodeStub(slice)
        MediaFeatures(r.media_id * 1000 + i, r.mime, slice.length.toLong,
          w, h, feat)
      }
    }
  }

  /** Wrap a text corpus as a binary media table — the test stand-in for
    * reading real media files ([[readMediaDir]] in production).
    */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("mime"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
  }

  private val MimeByExt = Seq(
    "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg", "png" -> "image/png",
    "gif" -> "image/gif", "wav" -> "audio/wav", "mp3" -> "audio/mpeg",
    "flac" -> "audio/flac", "mp4" -> "video/mp4", "mkv" -> "video/x-matroska")

  /** The production ingest path: a directory tree of media files read
    * through Spark's built-in `binaryFile` source into the same
    * [[MediaRow]] plumbing every decode/feature stage consumes — this
    * closes the gap between the text-fixture stand-in and the real
    * file-backed shape. `media_id` is the 60-bit md5 of the file path
    * (stable across runs and engines); mime comes from the extension.
    * binaryFile streams each blob as one row, so partition count =
    * file count and blob memory stays bounded per task; pass a `glob`
    * to prune at listing time.
    */
  def readMediaDir(
      spark: SparkSession, dir: String, glob: String = "*"): Dataset[MediaRow] = {
    import spark.implicits._
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val mime = MimeByExt.foldRight(lit("application/octet-stream")) {
      case ((e, m), acc) => when(ext === e, m).otherwise(acc)
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        conv(substring(md5(col("path")), 1, 15), 16, 10).cast("long")
          .as("media_id"),
        mime.as("mime"),
        col("content"))
      .as[MediaRow]
  }
}
