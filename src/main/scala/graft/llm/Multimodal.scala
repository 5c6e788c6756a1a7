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
  /** ImageIO stream over an in-memory payload, pinned to the MEMORY
    * cache: `ImageIO.createImageInputStream`/`ImageIO.read(InputStream)`
    * default to a FILE-backed cache (`useCache=true`), which creates
    * and deletes a temp file on executor disk PER DECODE — pure churn
    * when the source bytes are already on the heap (r12 self-review).
    */
  private def memStream(bytes: Array[Byte]) =
    new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))

  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    scala.util.Try {
      val iis = memStream(bytes)
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

  /** Container-level video metadata — everything a 100 TB curation
    * pipeline filters on (dims, duration, frame count, codec) WITHOUT
    * decoding a single frame. FRAME decode stays honestly out of scope
    * (the JDK ships no video codec); header parsing is pure JVM.
    */
  final case class VideoMeta(
      width: Int,
      height: Int,
      n_frames: Long,
      duration_ms: Long,
      codec: String)

  /** Real video CONTAINER parse (r7; replaces fake stub dims for the
    * video mimes): RIFF-AVI (`avih` main header + the `vids` stream's
    * `strh`) and ISO-BMFF MP4 (`mvhd` timescale/duration, `tkhd`
    * 16.16-fixed dims, `stsd` sample-entry fourcc, `stts` frame
    * count). Proper chunk/box walks with bounds checks — not a byte
    * scan — so nested sizes are honored and truncated payloads return
    * None (callers fall back to [[decodeStub]]).
    */
  def videoMeta(bytes: Array[Byte]): Option[VideoMeta] =
    scala.util.Try {
      if (bytes.length >= 12 &&
          tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ") parseAvi(bytes)
      else if (bytes.length >= 8 && tag(bytes, 4) == "ftyp") parseMp4(bytes)
      else None
    }.toOption.flatten

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def be32(b: Array[Byte], off: Int): Long =
    (b(off + 3) & 0xffL) | ((b(off + 2) & 0xffL) << 8) |
      ((b(off + 1) & 0xffL) << 16) | ((b(off) & 0xffL) << 24)

  private def parseAvi(b: Array[Byte]): Option[VideoMeta] = {
    var avih: Option[Int] = None    // offset of avih payload
    var vidsStrh: Option[Int] = None // offset of the video stream header
    // RIFF chunk walk: [fourcc][size LE][payload, word-aligned]; LIST
    // chunks carry a subtype then child chunks
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val cc = tag(b, off)
        val size = le32(b, off + 4).toInt
        val payload = off + 8
        if (size < 0 || payload + size > to) return // truncated/corrupt
        if (cc == "LIST" && size >= 4) walk(payload + 4, payload + size)
        else if (cc == "avih") avih = avih.orElse(Some(payload))
        else if (cc == "strh" && size >= 8 && tag(b, payload) == "vids")
          vidsStrh = vidsStrh.orElse(Some(payload))
        off = payload + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, b.length)
    avih.map { a =>
      val usPerFrame = le32(b, a)          // dwMicroSecPerFrame
      val frames = le32(b, a + 16)         // dwTotalFrames
      val w = le32(b, a + 32).toInt        // dwWidth
      val h = le32(b, a + 36).toInt        // dwHeight
      val codec = vidsStrh.map(s => tag(b, s + 4).trim).getOrElse("")
      VideoMeta(w, h, frames, usPerFrame * frames / 1000, codec)
    }
  }

  private def parseMp4(b: Array[Byte]): Option[VideoMeta] = {
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var timescale = 0L; var duration = 0L
    var w = 0; var h = 0; var frames = 0L; var codec = ""
    // ISO-BMFF box walk: [size BE][type][payload]; size 0/1 (to-end /
    // 64-bit) don't occur in the headers this parses — treated corrupt
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val size = be32(b, off).toInt
        val bt = tag(b, off + 4)
        val payload = off + 8
        if (size < 8 || off + size > to) return
        if (containers(bt)) walk(payload, off + size)
        else if (bt == "mvhd" && size >= 8 + 20) {
          val v = b(payload) & 0xff
          if (v == 0) { // 32-bit times: ver/flags, ctime, mtime, scale, dur
            timescale = be32(b, payload + 12)
            duration = be32(b, payload + 16)
          } else {      // v1: 64-bit ctime/mtime/duration
            timescale = be32(b, payload + 20)
            duration = (be32(b, payload + 24) << 32) | be32(b, payload + 28)
          }
        } else if (bt == "tkhd" && size >= 8 + 84 && (b(payload) & 0xff) == 0) {
          // v0 layout: dims are the last 8 bytes, 16.16 fixed point
          val base = payload + 76
          val tw = (be32(b, base) >> 16).toInt
          val th = (be32(b, base + 4) >> 16).toInt
          if (tw > 0 && th > 0 && w == 0) { w = tw; h = th }
        } else if (bt == "stsd" && size >= 8 + 16) {
          if (codec.isEmpty && be32(b, payload + 4) >= 1)
            codec = tag(b, payload + 12) // first sample entry's fourcc
        } else if (bt == "stts" && size >= 8 + 8) {
          val n = be32(b, payload + 4).toInt // entry count
          var i = 0
          var f = 0L
          while (i < n && payload + 8 + i * 8 + 8 <= off + size) {
            f += be32(b, payload + 8 + i * 8) // sample_count per run
            i += 1
          }
          if (frames == 0L) frames = f
        }
        off += size
      }
    }
    walk(0, b.length)
    if (timescale <= 0) None
    else Some(VideoMeta(w, h, frames, duration * 1000 / timescale, codec))
  }

  /** Deterministic MJPEG-AVI container bytes (header-complete, empty
    * movi payload) — the generator half of the [[videoMeta]] round
    * trip, used by LlmLayerSpec and the q114 oracle fixture. Writes the
    * real RIFF/hdrl/avih/strl/strh/strf/movi layout any AVI tool
    * recognizes.
    */
  def syntheticAvi(
      width: Int, height: Int, fps: Int, frames: Int,
      codec: String = "MJPG"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    // strf = BITMAPINFOHEADER(40); strh(56); avih(56)
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    cc("RIFF"); w32(riffSize); cc("AVI ")
    cc("LIST"); w32(hdrlSize); cc("hdrl")
    cc("avih"); w32(56)
    w32(1000000L / fps); w32(0); w32(0); w32(0x10) // usPerFrame..flags
    w32(frames); w32(0); w32(1); w32(0)            // totalFrames..bufSize
    w32(width); w32(height); w32(0); w32(0); w32(0); w32(0) // dims + reserved
    cc("LIST"); w32(strlSize); cc("strl")
    cc("strh"); w32(56)
    cc("vids"); cc(codec); w32(0)
    out.write(0); out.write(0); out.write(0); out.write(0) // priority+language
    w32(0); w32(1); w32(fps); w32(0); w32(frames)  // initial, scale, rate...
    w32(0); w32(-1); w32(0); w32(0); w32(0)        // bufSize, quality, sample, rcFrame
    cc("strf"); w32(40)
    w32(40); w32(width); w32(height)
    out.write(1); out.write(0); out.write(24); out.write(0) // planes, bpp
    cc(codec); w32(width.toLong * height * 3); w32(0); w32(0); w32(0); w32(0)
    cc("LIST"); w32(moviSize); cc("movi")
    out.toByteArray
  }

  /** Deterministic UNCOMPRESSED AVI (BI_RGB 24bpp DIB frames): the
    * same RIFF/hdrl layout as [[syntheticAvi]] but with a real `movi`
    * payload — one `00db` chunk per frame holding bottom-up,
    * 4-byte-row-aligned BGR pixels (each frame a solid color from
    * `colors`). This is the generator half of the [[videoFramesRgb]]
    * round trip: the one video format whose FRAME decode is pure byte
    * layout, no codec.
    */
  def syntheticAviRgb(
      width: Int, height: Int, fps: Int,
      colors: Seq[(Int, Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    val stride = ((width * 3 + 3) / 4) * 4 // BMP rows pad to 4 bytes
    val frameBytes = stride * height
    val frames = colors.length
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + frames * (8 + frameBytes) // stride is 4-aligned
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    cc("RIFF"); w32(riffSize); cc("AVI ")
    cc("LIST"); w32(hdrlSize); cc("hdrl")
    cc("avih"); w32(56)
    w32(1000000L / fps); w32(0); w32(0); w32(0x10)
    w32(frames); w32(0); w32(1); w32(frameBytes)
    w32(width); w32(height); w32(0); w32(0); w32(0); w32(0)
    cc("LIST"); w32(strlSize); cc("strl")
    cc("strh"); w32(56)
    cc("vids"); cc("DIB "); w32(0)
    out.write(0); out.write(0); out.write(0); out.write(0)
    w32(0); w32(1); w32(fps); w32(0); w32(frames)
    w32(frameBytes); w32(-1); w32(0); w32(0); w32(0)
    cc("strf"); w32(40)
    w32(40); w32(width); w32(height)
    out.write(1); out.write(0); out.write(24); out.write(0)
    w32(0) /* biCompression = BI_RGB */
    w32(frameBytes); w32(0); w32(0); w32(0); w32(0)
    cc("LIST"); w32(moviSize); cc("movi")
    colors.foreach { case (r, g, bl) =>
      cc("00db"); w32(frameBytes)
      val row = new Array[Byte](stride)
      var x = 0
      while (x < width) { // pixels are B,G,R; pad bytes stay zero
        row(x * 3) = bl.toByte; row(x * 3 + 1) = g.toByte
        row(x * 3 + 2) = r.toByte
        x += 1
      }
      (0 until height).foreach(_ => out.write(row, 0, stride))
    }
    out.toByteArray
  }

  /** Deterministic MJPG AVI: the same RIFF/hdrl layout as
    * [[syntheticAviRgb]] but `strf.biCompression = "MJPG"` and one
    * `00dc` chunk per frame holding a standalone JPEG (each frame a
    * solid color from `colors`, encoded with the JDK's ImageIO JPEG
    * writer). The generator half of the MJPG [[videoFramesRgb]] leg;
    * JPEG is lossy, so round-trip tests gate on per-channel tolerance
    * bands, not exact bytes.
    */
  def syntheticAviMjpg(
      width: Int, height: Int, fps: Int,
      colors: Seq[(Int, Int, Int)]): Array[Byte] = {
    val jpegs = colors.map { case (r, g, bl) =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | bl
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def pad(n: Int): Int = n + (n & 1) // RIFF chunks are 2-byte aligned
    val frames = colors.length
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + jpegs.map(j => 8 + pad(j.length)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    cc("RIFF"); w32(riffSize); cc("AVI ")
    cc("LIST"); w32(hdrlSize); cc("hdrl")
    cc("avih"); w32(56)
    w32(1000000L / fps); w32(0); w32(0); w32(0x10)
    w32(frames); w32(0); w32(1); w32(jpegs.map(_.length).max)
    w32(width); w32(height); w32(0); w32(0); w32(0); w32(0)
    cc("LIST"); w32(strlSize); cc("strl")
    cc("strh"); w32(56)
    cc("vids"); cc("MJPG"); w32(0)
    out.write(0); out.write(0); out.write(0); out.write(0)
    w32(0); w32(1); w32(fps); w32(0); w32(frames)
    w32(jpegs.map(_.length).max); w32(-1); w32(0); w32(0); w32(0)
    cc("strf"); w32(40)
    w32(40); w32(width); w32(height)
    out.write(1); out.write(0); out.write(24); out.write(0)
    w32(MjpgFourcc)
    w32(width.toLong * height * 3); w32(0); w32(0); w32(0); w32(0)
    cc("LIST"); w32(moviSize); cc("movi")
    jpegs.foreach { j =>
      cc("00dc"); w32(j.length)
      out.write(j, 0, j.length)
      if ((j.length & 1) == 1) out.write(0) // alignment pad byte
    }
    out.toByteArray
  }

  private val MjpgFourcc = 0x47504A4DL // "MJPG" little-endian

  /** REAL frame decode for the two AVI cases the JDK can handle with
    * no external codec (r11 BI_RGB; r12 adds MJPG): walks the RIFF
    * tree, reads `strf`, and returns each `00db`/`00dc` movi chunk as
    * a top-down, tightly packed BGR pixel array paired with its
    * ORIGINAL movi chunk index (assigned before any undecodable chunk
    * is dropped, so a single truncated frame cannot shift every later
    * frame's index — r11 ADVICE).
    *
    *  - BI_RGB 24bpp: pure byte layout — bottom-up rows flipped (a
    *    negative biHeight marks a top-down DIB and is passed through
    *    unflipped), stride padding dropped; chunks shorter than one
    *    frame are skipped.
    *  - MJPG: every movi chunk is a standalone JPEG, decoded with the
    *    JDK's own ImageIO JPEG codec (the same one [[decodeImage]]
    *    uses for stills); frames whose decode fails or whose
    *    dimensions disagree with `strf` are skipped.
    *
    * Truly codec-bearing formats (H264/MP4/…) return None — that leg
    * stays a documented stub rather than a fake.
    */
  def videoFramesRgb(b: Array[Byte]): Option[(Int, Int, Seq[(Int, Array[Byte])])] =
    videoFramesRgb(b, _ => true)

  /** As [[videoFramesRgb]], but only chunks whose ORIGINAL movi index
    * passes `sample` are DECODED — indices are assigned to every chunk
    * first, so sampling never shifts them, and skipped frames never
    * pay the JPEG decode (at stride 2 that is half the MJPG work).
    */
  def videoFramesRgb(
      b: Array[Byte],
      sample: Int => Boolean): Option[(Int, Int, Seq[(Int, Array[Byte])])] =
    scala.util.Try {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ") None
      else {
        // from strf: (width, |height|, topDown, isMjpg)
        var dims: Option[(Int, Int, Boolean, Boolean)] = None
        val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        def walk(from: Int, to0: Int, inMovi: Boolean): Unit = {
          // clamp the container bound to the REAL buffer (r12 ADVICE
          // hardening): declared sizes are never trusted past the
          // bytes actually present, so a truncated upload yields its
          // INTACT frame prefix — the container is walked up to the
          // cut, and the chunk the cut lands in is dropped (never
          // zero-padded: copyOfRange is only reached under the
          // payload+size <= to <= b.length guard)
          val to = math.min(to0, b.length)
          var off = from
          while (off + 8 <= to) {
            val cc = tag(b, off)
            val size = le32(b, off + 4).toInt
            val payload = off + 8
            if (size < 0) return
            if (cc == "LIST" && size >= 4 && payload + 4 <= to)
              // recurse to the AVAILABLE bound: a truncated movi LIST
              // still surfaces every frame chunk that fits before the
              // cut (the leaf guard below drops the cut chunk itself)
              walk(payload + 4, math.min(payload + size, to),
                inMovi || tag(b, payload) == "movi")
            else if (payload + size > to) return
            else if (cc == "strf" && size >= 20) {
              val bpp = (le32(b, payload + 12) >> 16) & 0xffff
              val compression = le32(b, payload + 16)
              val rawH = le32(b, payload + 8).toInt
              if ((compression == 0L && bpp == 24L) || compression == MjpgFourcc)
                dims = dims.orElse(Some((le32(b, payload + 4).toInt,
                  math.abs(rawH), rawH < 0, compression == MjpgFourcc)))
            } else if (inMovi && (cc == "00db" || cc == "00dc"))
              frames += java.util.Arrays.copyOfRange(b, payload, payload + size)
            off = payload + size + (size & 1)
          }
        }
        walk(12, b.length, inMovi = false)
        dims.map { case (w, h, topDown, isMjpg) =>
          val indexed = frames.toSeq.zipWithIndex
            .filter { case (_, i) => sample(i) }
          val decoded =
            if (isMjpg) indexed.flatMap { case (f, i) =>
              scala.util.Try(
                javax.imageio.ImageIO.read(memStream(f))).toOption
                .filter(img => img != null &&
                  img.getWidth == w && img.getHeight == h)
                .map { img =>
                  // one bulk raster grab, not w*h getRGB calls
                  val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
                  val outPx = new Array[Byte](w * h * 3)
                  var p = 0
                  while (p < rgbs.length) {
                    val rgb = rgbs(p)
                    outPx(p * 3) = (rgb & 0xff).toByte             // B
                    outPx(p * 3 + 1) = ((rgb >> 8) & 0xff).toByte  // G
                    outPx(p * 3 + 2) = ((rgb >> 16) & 0xff).toByte // R
                    p += 1
                  }
                  (i, outPx)
                }
            } else {
              val stride = ((w * 3 + 3) / 4) * 4
              indexed
                .filter { case (f, _) => f.length >= stride * h }
                .map { case (f, i) =>
                  val outPx = new Array[Byte](w * h * 3)
                  var r = 0
                  while (r < h) {
                    val srcRow = if (topDown) r else h - 1 - r
                    System.arraycopy(f, srcRow * stride, outPx, r * w * 3, w * 3)
                    r += 1
                  }
                  (i, outPx)
                }
            }
          (w, h, decoded)
        }
      }
    }.toOption.flatten

  /** Per-frame mean-color features over every `stride`-th frame of
    * uncompressed-AVI media — the frame-sample operator a training
    * pipeline runs before expensive per-frame models. One streaming
    * pass per partition (the mapInPandas shape); media whose frames
    * cannot be decoded (compressed codecs, non-AVI) contribute no
    * rows — the metadata path ([[videoMeta]]) still covers them.
    */
  def frameSampleStats(
      media: Dataset[MediaRow], stride: Int): org.apache.spark.sql.DataFrame = {
    require(stride > 0, "frame stride must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        // stride pushed into the decode: non-sampled frames keep their
        // index slot but never pay the (JPEG) decode
        videoFramesRgb(m.content, i => i % stride == 0).toSeq
          .flatMap { case (w, h, frames) =>
          frames.map { case (i, px) =>
              var sb = 0L; var sg = 0L; var sr = 0L
              var p = 0
              while (p < px.length) {
                sb += px(p) & 0xff; sg += px(p + 1) & 0xff
                sr += px(p + 2) & 0xff
                p += 3
              }
              val n = (w * h).toDouble
              (m.media_id, i.toLong, w, h, sr / n, sg / n, sb / n)
            }
        }
      }
    }.toDF("media_id", "frame_idx", "width", "height",
      "mean_r", "mean_g", "mean_b")
  }

  /** Deterministic canonical 44-byte-header WAV, mono PCM16 LE —
    * generator half of the [[audioWindows]] round trip (pure byte
    * layout, no encoder in the loop).
    */
  def syntheticWavPcm16(
      sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def w16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    val dataBytes = samples.length * 2
    cc("RIFF"); w32(36L + dataBytes); cc("WAVE")
    cc("fmt "); w32(16); w16(1) /* PCM */; w16(1) /* mono */
    w32(sampleRate); w32(sampleRate.toLong * 2); w16(2); w16(16)
    cc("data"); w32(dataBytes)
    samples.foreach(s => w16(s & 0xffff))
    out.toByteArray
  }

  /** Windowed audio features over signed-16-bit PCM — the audio twin
    * of [[frameSampleStats]]: decode via javax.sound (WAV/AIFF/AU,
    * endianness from the header), fold interleaved channels to their
    * per-frame mean, and emit one row per `windowSamples` window
    * advancing by `strideSamples` (RMS + absolute peak — the signals
    * a curation pass thresholds for silence/clipping). Non-PCM16
    * payloads contribute no rows, like undecodable video in the frame
    * path. Per-partition streaming pass; trailing partial windows are
    * dropped (a partial window's RMS is not comparable).
    */
  def audioWindows(
      media: Dataset[MediaRow],
      windowSamples: Int,
      strideSamples: Int): org.apache.spark.sql.DataFrame = {
    require(windowSamples > 0 && strideSamples > 0,
      "window and stride must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        scala.util.Try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.content))
          try {
            val fmt = in.getFormat
            if (fmt.getEncoding !=
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
                fmt.getSampleSizeInBits != 16) Seq.empty
            else {
              val ch = fmt.getChannels
              val big = fmt.isBigEndian
              val bytes = in.readAllBytes()
              val nFrames = bytes.length / (2 * ch)
              // fold channels: per-frame mean (integer division like
              // a (L+R)/2 downmix)
              val mono = new Array[Int](nFrames)
              var f = 0
              while (f < nFrames) {
                var acc = 0L
                var c = 0
                while (c < ch) {
                  val i = (f * ch + c) * 2
                  val s =
                    if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
                    else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
                  acc += s
                  c += 1
                }
                mono(f) = (acc / ch).toInt
                f += 1
              }
              val starts = 0 to (nFrames - windowSamples) by strideSamples
              starts.zipWithIndex.map { case (s0, w) =>
                var sq = 0.0
                var peak = 0
                var i = s0
                while (i < s0 + windowSamples) {
                  val v = mono(i)
                  sq += v.toDouble * v
                  if (math.abs(v) > peak) peak = math.abs(v)
                  i += 1
                }
                (m.media_id, w.toLong, s0.toLong,
                  math.sqrt(sq / windowSamples), peak)
              }
            }
          } finally in.close()
        }.getOrElse(Seq.empty)
      }
    }.toDF("media_id", "win_idx", "start_sample", "rms", "peak")
  }

  /** Deterministic minimal MP4 (ftyp + moov{mvhd, trak{tkhd,
    * mdia{minf{stbl{stsd, stts}}}}}) — generator half of the MP4 round
    * trip. `durationTicks` is in `timescale` units.
    */
  def syntheticMp4(
      width: Int, height: Int, timescale: Int, durationTicks: Long,
      frames: Int, codec: String = "avc1"): Array[Byte] = {
    def be(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(bt: String, payload: Array[Byte]): Array[Byte] =
      be(payload.length + 8) ++ bt.getBytes("US-ASCII") ++ payload
    val unityMatrix =
      be(0x00010000L) ++ be(0) ++ be(0) ++
        be(0) ++ be(0x00010000L) ++ be(0) ++
        be(0) ++ be(0) ++ be(0x40000000L)
    val mvhd = box("mvhd",
      be(0) ++ be(0) ++ be(0) ++ be(timescale) ++ be(durationTicks) ++
        be(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++ be(0) ++ be(0) ++
        unityMatrix ++ Array.fill(24)(0.toByte) ++ be(2))
    val tkhd = box("tkhd",
      be(7) ++ be(0) ++ be(0) ++ be(1) ++ be(0) ++ be(durationTicks) ++
        be(0) ++ be(0) ++ Array.fill(8)(0.toByte) ++ unityMatrix ++
        be(width.toLong << 16) ++ be(height.toLong << 16))
    val stsdEntry = be(16) ++ codec.getBytes("US-ASCII") ++
      Array.fill(6)(0.toByte) ++ Array[Byte](0, 1)
    val stsd = box("stsd", be(0) ++ be(1) ++ stsdEntry)
    val stts = box("stts", be(0) ++ be(1) ++ be(frames) ++
      be(if (frames > 0) durationTicks / frames else 0))
    val stbl = box("stbl", stsd ++ stts)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be(0) ++ "isom".getBytes("US-ASCII") ++
        "mp41".getBytes("US-ASCII"))
    ftyp ++ moov
  }

  /** Video branch of [[decode]]: real container metadata when the
    * payload parses (dims from the header; feature = [frames,
    * duration s, fps, codec-hash, 0…]), stub otherwise.
    */
  def decodeVideo(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    videoMeta(bytes).map { m =>
      val durS = m.duration_ms.toFloat / 1000f
      val feat = new Array[Float](FeatureDim)
      feat(0) = m.n_frames.toFloat
      feat(1) = durS
      feat(2) = if (durS > 0) m.n_frames / durS else 0f
      feat(3) = (m.codec.hashCode & 0xffff).toFloat / 65536f
      (m.width, m.height, feat)
    }

  /** Decode dispatch: REAL decoders for the modalities the JDK can
    * parse (images via ImageIO, audio via javax.sound, video CONTAINER
    * headers via [[videoMeta]] — frame decode stays out of scope, no
    * JDK codec), the clearly-marked stub for everything else.
    */
  def decode(mime: String, bytes: Array[Byte]): (Int, Int, Array[Float]) =
    (if (mime.startsWith("image/")) decodeImage(bytes)
     else if (mime.startsWith("audio/")) decodeAudio(bytes)
     else if (mime.startsWith("video/")) decodeVideo(bytes)
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

  /** REAL single-image resize (r11 — replaces the stub for payloads
    * ImageIO can decode): decode, scale with a NEAREST_NEIGHBOR
    * Graphics2D draw (a pure pixel mapping — no platform-dependent
    * filtering kernels), re-encode lossless PNG. Undecodable payloads
    * return None.
    */
  def resizeImage(
      bytes: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
    scala.util.Try {
      Option(javax.imageio.ImageIO.read(memStream(bytes))).map { img =>
        val out = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(img, 0, 0, width, height, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }.toOption.flatten

  /** Batch resize: REAL decode→scale→re-encode for image payloads
    * ([[resizeImage]]), with the feature vector recomputed from the
    * RESIZED pixels; payloads no JDK codec decodes keep the
    * deterministic stub path (reproducible fake, dimension plumbing
    * still exercised). Batch shape identical to [[extractFeatures]].
    */
  def resize(media: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        resizeImage(r.content, width, height) match {
          case Some(px) =>
            val (_, _, feat) = decodeImage(px).getOrElse(decodeStub(px))
            MediaFeatures(r.media_id, r.mime, px.length.toLong,
              width, height, feat)
          case None =>
            val (_, _, feat) =
              decodeStub(r.content ++ s"@${width}x$height".getBytes)
            MediaFeatures(r.media_id, r.mime, r.content.length.toLong,
              width, height, feat)
        }
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
