package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column with typed
  * metadata; decode / feature-extract / resize / frame-sample run as
  * partition-local batch transforms (`mapPartitions` — the Scala
  * analogue of PySpark's mapInPandas batches).
  *
  * Images are decoded for REAL via `javax.imageio` (JDK built-in:
  * PNG/JPEG/GIF/BMP); WAV audio via `javax.sound.sampled`. Metadata
  * decode is header-only — the pixel raster is never materialized, so
  * at 100 TB the decode-meta pass is IO-bound, not CPU-bound. Feature
  * extraction is likewise real for both decodable modalities (block-
  * mean luma grids / windowed RMS — see `featureKernel`); only bytes
  * with no JDK codec (video containers, foreign formats) fall back to
  * a deterministic stub kernel, so the Spark-side contract — schema,
  * nullability, partitioning, batch shape, feature dimensions — is
  * uniform and a real codec can be dropped into `decodeKernel`/
  * `featureKernel` without touching the plan. */
object Multimodal {

  // ImageIO's default scratch-file cache would put one temp file per
  // executor task on local disk — pure overhead for in-memory byte[]
  // sources, and a file-descriptor hazard at 32+ concurrent tasks.
  javax.imageio.ImageIO.setUseCache(false)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("source", StringType, nullable = true)))

  /** True iff the bytes start with a magic number `javax.imageio` can
    * decode (PNG / JPEG / GIF / BMP). Cheap pre-filter so non-image
    * media (audio/video, plain text) skips ImageIO reader discovery. */
  private[graft] def looksLikeImage(content: Array[Byte]): Boolean =
    content != null && content.length >= 3 && {
      val b0 = content(0) & 0xFF; val b1 = content(1) & 0xFF; val b2 = content(2) & 0xFF
      (b0 == 0x89 && b1 == 0x50 && b2 == 0x4E) || // PNG
      (b0 == 0xFF && b1 == 0xD8 && b2 == 0xFF) || // JPEG
      (b0 == 'G' && b1 == 'I' && b2 == 'F') ||    // GIF
      (b0 == 'B' && b1 == 'M')                    // BMP
    }

  /** Header-only image metadata read: (width, height, channels) without
    * decoding the pixel raster. None if the bytes are not a decodable
    * image. */
  private[graft] def imageHeader(content: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!looksLikeImage(content)) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          val bands =
            try reader.getImageTypes(0).next().getNumBands
            catch { case _: Exception => 3 }
          Some((w, h, bands))
        } finally reader.dispose()
      }
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** Decode kernel: real `javax.imageio` header read for image bytes;
    * deterministic stub (hash-derived dims) for media the JDK has no
    * codec for (audio/video) so the pipeline contract stays uniform. */
  private def decodeKernel(content: Array[Byte]): (Int, Int, Int) =
    imageHeader(content).getOrElse {
      if (content == null || content.isEmpty) (0, 0, 0)
      else {
        var h = 1125899906842597L
        content.foreach(b => h = h * 31 + b)
        val w = 64 + math.floorMod(h, 1024).toInt
        val ht = 64 + math.floorMod(h >> 16, 1024).toInt
        (w, ht, 3)
      }
    }

  /** Feature kernel — REAL for every modality the JDK can decode:
    *
    *  - decodable images → g×g block-mean luma grid (g = ⌊√dim⌋,
    *    zero-padded to `dim` when g² < dim): the [[imageAHash64]]
    *    pre-threshold features computed from actual decoded pixels.
    *    Identical pictures give identical vectors; one edited tile
    *    moves only its grid cell — exactly the locality a perceptual
    *    feature needs for near-dup ANN. Block means over integer luma
    *    are multiples of 1/count, so the m04 oracle recomputes them
    *    arithmetically for the md5-block test images.
    *  - PCM16 WAV audio → `dim` windows of RMS energy over the
    *    decoded samples ([[frameEnergy]]'s acoustic features at fixed
    *    dimension).
    *  - ISO-BMFF video → REAL container-derived features
    *    ([[videoContainerFeatures]]: decoded mvhd timing + per-slot
    *    essence signatures — container-level is the ceiling without a
    *    codec, see that method's contract).
    *  - anything else (foreign formats — no JDK codec) →
    *    deterministic hash projection, a clearly-marked STAND-IN
    *    whose only contract is determinism + fixed shape; a real
    *    codec drops in without touching the plan. */
  private[graft] def featureKernel(content: Array[Byte], dim: Int): Array[Float] =
    imageBlockMeans(content, dim)
      .orElse(audioRmsFeatures(content, dim))
      .orElse(videoContainerFeatures(content, dim))
      .getOrElse(hashProjectionStub(content, dim))

  /** REAL container-derived video features — no JDK video codec
    * exists, so frame PIXELS are out of reach, but everything here is
    * decoded container structure and real essence bytes, not a hash
    * of the whole blob:
    *
    *  - cell 0: duration in milliseconds from the parsed mvhd
    *    (m09's verified timescale/duration fields);
    *  - cell 1: timescale; cell 2: track count;
    *  - cells 3…: one signature word per uniform schedule slot (the
    *    m15 sample schedule at k = dim−3): a rolling hash of the
    *    `mdat` essence bytes inside that slot's byte window,
    *    normalized to [0, 1). Slot index is folded into the hash seed
    *    — the m23 positional-signature discipline (content bound to
    *    its schedule slot, so shuffled re-edits don't alias).
    *
    * Identical container+essence → identical vector; a re-mux with
    * the same timing but re-encoded essence agrees on cells 0–2 and
    * differs in signature cells — exactly the locality a container-
    * level near-dup screen can honestly claim. MultimodalSpec pins
    * the timing cells to the mvhd arithmetic and the perturbation
    * behavior. */
  private[graft] def videoContainerFeatures(
      content: Array[Byte], dim: Int): Option[Array[Float]] =
    mp4Header(content).map { case (ts, dur, nTracks) =>
      val out = new Array[Float](dim)
      if (dim > 0) out(0) = (dur * 1000.0 / ts).toFloat
      if (dim > 1) out(1) = ts.toFloat
      if (dim > 2) out(2) = nTracks.toFloat
      val slots = dim - 3
      if (slots > 0) mdatRange(content).foreach { case (off, len) =>
        var i = 0
        while (i < slots) {
          val b0 = off + (i.toLong * len / slots).toInt
          val b1 = off + ((i + 1).toLong * len / slots).toInt
          var h = 0x9E3779B97F4A7C15L ^ i.toLong // slot-bound signature
          var p = b0
          while (p < b1) {
            h = (h ^ content(p)) * 0xC2B2AE3D27D4EB4FL
            p += 1
          }
          out(3 + i) = math.floorMod(h, 1000003L) / 1000003.0f
          i += 1
        }
      }
      out
    }

  /** ISO-BMFF box header at `off`: (headerLen, boxSize) with the two
    * special size encodings handled — size==1 means a 64-bit
    * `largesize` follows the type, size==0 means the box extends to
    * end-of-file (both appear in real-world large/streamed MP4s;
    * without them such files silently fall back to the
    * hash-projection stub). None when the header is truncated or the
    * box overruns the buffer. In-memory content is Int-addressable,
    * so any box that FITS the array also fits the Int arithmetic. */
  private def boxHeader(
      content: Array[Byte], off: Int, end: Int): Option[(Int, Int)] = {
    if (off + 8 > end) return None
    def u32(o: Int): Long =
      ((content(o) & 0xFFL) << 24) | ((content(o + 1) & 0xFFL) << 16) |
        ((content(o + 2) & 0xFFL) << 8) | (content(o + 3) & 0xFFL)
    val s32 = u32(off)
    val (hdr, size): (Int, Long) =
      if (s32 == 1L) {
        if (off + 16 > end) return None
        (16, (u32(off + 8) << 32) | u32(off + 12))
      } else if (s32 == 0L) (8, (end - off).toLong)
      else (8, s32)
    if (size < hdr || off + size > end) None
    else Some((hdr, size.toInt))
  }

  /** Top-level box walk to the `mdat` payload: (offset, length) of
    * the essence bytes, or None when absent/truncated. */
  private[graft] def mdatRange(content: Array[Byte]): Option[(Int, Int)] = {
    if (content == null || content.length < 16) return None
    var off = 0
    while (off + 8 <= content.length) {
      boxHeader(content, off, content.length) match {
        case None => return None
        case Some((hdr, size)) =>
          if (new String(content, off + 4, 4, "US-ASCII") == "mdat")
            return Some((off + hdr, size - hdr))
          off += size
      }
    }
    None
  }

  /** g×g block-mean integer-luma grid from real decoded pixels. */
  private[graft] def imageBlockMeans(
      content: Array[Byte], dim: Int): Option[Array[Float]] = {
    if (!looksLikeImage(content)) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(content))
      if (img == null) return None
      val g = math.max(1, math.sqrt(dim.toDouble).toInt)
      val w = img.getWidth; val h = img.getHeight
      val gray = img.getRaster.getNumBands == 1
      val sums = new Array[Long](g * g)
      val counts = new Array[Long](g * g)
      // bulk row fetches: one color-model conversion call per ROW, not
      // per pixel (the dominantColor/tileStats discipline — this is
      // the m04 feature ingest hot path)
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        if (gray) img.getRaster.getSamples(0, y, w, 1, 0, rowBuf)
        else img.getRGB(0, y, w, 1, rowBuf, 0, w)
        val rowBase = math.min(g - 1, y * g / h) * g
        var x = 0
        while (x < w) {
          val lum =
            if (gray) rowBuf(x).toLong
            else {
              val p = rowBuf(x)
              ((p >> 16 & 0xFF) * 299L + (p >> 8 & 0xFF) * 587L +
                (p & 0xFF) * 114L) / 1000L
            }
          val j = rowBase + math.min(g - 1, x * g / w)
          sums(j) += lum; counts(j) += 1
          x += 1
        }
        y += 1
      }
      val out = new Array[Float](dim)
      var j = 0
      while (j < g * g && j < dim) {
        if (counts(j) > 0) out(j) = (sums(j).toDouble / counts(j)).toFloat
        j += 1
      }
      Some(out)
    } catch { case _: Exception => None }
  }

  /** `dim` equal windows of RMS energy over real decoded PCM16. */
  private def audioRmsFeatures(
      content: Array[Byte], dim: Int): Option[Array[Float]] =
    decodePcm16Mono(content).map { bytes =>
      val n = bytes.length / 2
      val out = new Array[Float](dim)
      if (n > 0) {
        val win = math.max(1, (n + dim - 1) / dim)
        var f = 0
        while (f < dim) {
          val i0 = f * win
          val len = math.max(0, math.min(win, n - i0))
          if (len > 0) {
            var ss = 0.0; var i = i0
            while (i < i0 + len) {
              val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toDouble
              ss += s * s
              i += 1
            }
            out(f) = math.sqrt(ss / len).toFloat
          }
          f += 1
        }
      }
      out
    }

  /** STUB: deterministic hash projection for codec-less bytes. */
  private def hashProjectionStub(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (content == null) return out
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < content.length) {
      h = (h ^ content(i)) * 0xC2B2AE3D27D4EB4FL
      out(math.floorMod(h, dim).toInt) += ((h >> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  private val decodedSchema = StructType(mediaSchema.fields.toSeq ++ Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  /** Decode pass: binary → (width, height, channels, n_bytes) metadata.
    * Partition-local, no shuffle; at 100 TB this is a pure map stage
    * whose parallelism is the input partitioning. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media.select(mediaSchema.fieldNames.map(col).toIndexedSeq: _*)
      .mapPartitions { rows =>
        rows.map { r =>
          // positional access: upstream mapPartitions stages emit
          // schema-less GenericRows; `content` is mediaSchema field 2
          val content = r.getAs[Array[Byte]](2)
          val (w, h, c) = decodeKernel(content)
          Row.fromSeq(r.toSeq ++ Seq(w, h, c,
            if (content == null) 0L else content.length.toLong))
        }
      }(enc)
  }

  /** ViT-style patch tiling over REAL decoded pixels: each image
    * splits into a `patch`×`patch` grid (edge tiles clamped) and every
    * tile reports exact INTEGER pixel statistics — red-channel sum +
    * pixel count. Integer outputs are the verification design: the
    * m13 oracle regenerates the synthetic pixel stream arithmetically
    * (splitmix-style int64 ops in HUGEINT mod-2⁶⁴, t05's technique)
    * and must match the sums bit-for-bit, proving the ENTIRE
    * decode-to-pixel path (PNG parse, raster layout, channel order) —
    * not just header fields like m06. Pure map stage: one image in,
    * ≤⌈w/p⌉·⌈h/p⌉ rows out, no shuffle before the gate's sort. */
  def tileStats(media: DataFrame, patch: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("tile_x", IntegerType, nullable = false),
      StructField("tile_y", IntegerType, nullable = false),
      StructField("tw", IntegerType, nullable = false),
      StructField("th", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("red_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) Iterator.empty
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val nx = (w + patch - 1) / patch
            val ny = (h + patch - 1) / patch
            for {
              ty <- Iterator.range(0, ny)
              tx <- Iterator.range(0, nx)
            } yield {
              val x0 = tx * patch; val y0 = ty * patch
              val tw = math.min(patch, w - x0)
              val th = math.min(patch, h - y0)
              // one batched color-model conversion per tile — per-pixel
              // getRGB repeats bounds checks + conversion per call
              val buf = img.getRGB(x0, y0, tw, th, null, 0, tw)
              var sum = 0L
              var k = 0
              while (k < buf.length) {
                sum += (buf(k) >> 16) & 0xFF
                k += 1
              }
              Row(id, tx, ty, tw, th, tw.toLong * th, sum)
            }
          }
        }
      }(enc)
  }

  /** Feature-extraction pass: binary → float embedding column, batched
    * per partition. Output feeds Similarity.* (ANN / dedup). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), featureKernel(r.getAs[Array[Byte]](1), dim).toSeq)
        }
      }(enc)
  }

  /** Bounding-box fit preserving aspect ratio: output dims for (w, h)
    * clamped into (maxW, maxH), never upscaled, floor semantics. The
    * same arithmetic is SQL-expressible, which is what lets the resize
    * oracle recompute expected dims independently. */
  private[graft] def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    val scale = math.min(1.0,
      math.min(maxW / math.max(w, 1).toDouble, maxH / math.max(h, 1).toDouble))
    (math.max(1, math.floor(w * scale).toInt), math.max(1, math.floor(h * scale).toInt))
  }

  /** Resize kernel: for decodable images, a REAL pixel-raster rescale
    * (`Graphics2D` bilinear draw) re-encoded as PNG; for non-image
    * media, the deterministic byte-truncation stub (truncate by area
    * ratio so downstream size accounting is exercised). */
  private def resizeKernel(content: Array[Byte], maxW: Int, maxH: Int)
      : (Int, Int, Array[Byte]) = {
    imageHeader(content) match {
      case Some((w, h, _)) =>
        val (ow, oh) = fitBox(w, h, maxW, maxH)
        try {
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
          val dst = new java.awt.image.BufferedImage(
            ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, ow, oh, null)
          } finally g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", baos)
          (ow, oh, baos.toByteArray)
        } catch { case _: Exception => (ow, oh, content) }
      case None =>
        if (content == null || content.isEmpty) (1, 1, content)
        else {
          val (w, h, _) = decodeKernel(content)
          val (ow, oh) = fitBox(w, h, maxW, maxH)
          val ratio = (ow.toLong * oh).toDouble / (w.toLong * h).toDouble
          val keep = math.max(1, (content.length * ratio).toInt)
          (ow, oh, content.take(keep))
        }
    }
  }

  private val resizedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("out_width", IntegerType),
    StructField("out_height", IntegerType),
    StructField("out_content", BinaryType),
    StructField("out_bytes", IntegerType)))

  /** Resize pass (image): clamp to a bounding box preserving aspect
    * ratio. Real pixel rescale + PNG re-encode for decodable images
    * (javax.imageio); deterministic byte-truncation stub for media the
    * JDK has no codec for. Pure map stage — partition-local, no
    * shuffle; at 100 TB parallelism is the input partitioning. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(resizedSchema)
    media.select(col("media_id"), col("kind"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val content = r.getAs[Array[Byte]](2)
          val (ow, oh, out) = resizeKernel(content, maxW, maxH)
          Row(r.getLong(0), r.getString(1), ow, oh, out,
            if (out == null) null else out.length)
        }
      }(enc)
  }

  /** Frame-sampling pass (video): one row per sampled frame, frame
    * count derived from content size (stub: 1 frame / `frameBytes`).
    * The explode happens partition-locally; downstream ops see a
    * larger but still co-partitioned dataset. */
  def sampleFrames(media: DataFrame, everyNth: Int = 10,
      frameBytes: Int = 4096): DataFrame = {
    require(everyNth > 0 && frameBytes > 0)
    media
      .withColumn("n_frames",
        greatest(lit(1), (length(col("content")) / frameBytes).cast("int")))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))))
      .select(col("media_id"), col("kind"), col("frame_idx"), col("n_frames"))
  }

  /** True iff the bytes carry a RIFF/WAVE header. */
  private[graft] def looksLikeWav(content: Array[Byte]): Boolean =
    content != null && content.length >= 12 &&
      content(0) == 'R' && content(1) == 'I' && content(2) == 'F' &&
      content(3) == 'F' && content(8) == 'W' && content(9) == 'A' &&
      content(10) == 'V' && content(11) == 'E'

  /** Header-only WAV metadata read via `javax.sound.sampled` (JDK
    * built-in): (sampleRateHz, channels, frames). The PCM payload is
    * never decoded. None for non-WAV bytes. */
  private[graft] def wavHeader(content: Array[Byte]): Option[(Int, Int, Long)] = {
    if (!looksLikeWav(content)) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(content))
      val fmt = aff.getFormat
      Some((fmt.getSampleRate.toInt, fmt.getChannels, aff.getFrameLength.toLong))
    } catch { case _: Exception => None }
  }

  /** Render a real PCM-16 mono WAV with the given frame count and
    * sample rate, samples seeded from `seed` (deterministic). */
  private[graft] def renderWav(frames: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val data = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      var p = seed * 0x9E3779B97F4A7C15L + i
      p ^= p >>> 29; p *= 0xBF58476D1CE4E5B9L; p ^= p >>> 32
      val s = (p & 0xFFFF).toInt - 32768
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Synthesize a media table of REAL WAV clips whose sample rate and
    * frame count derive arithmetically from the id — same oracle
    * pattern as [[synthesizeImages]]: a SQL oracle recomputes the
    * expected metadata from the id, so a hash match proves the codec
    * read actual RIFF headers. */
  def synthesizeAudio(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val rate = 8000 + math.floorMod(id, 8).toInt * 1000
          val frames = 400 + math.floorMod(id * 13, 800).toInt
          Row(id, "audio", renderWav(frames, rate, id), "synthetic-wav")
        }
      }(enc)
  }

  /** Frame-level energy analysis over REAL decoded PCM — the audio
    * analogue of [[tileStats]]: parse the WAV through the JDK codec,
    * split the mono 16-bit stream into `frameSize`-sample frames
    * (last frame clamped), report exact INTEGER per-frame statistics
    * (Σ|s|, max|s|, sample count). The m14 oracle regenerates the
    * synthetic sample stream arithmetically and must match the sums
    * bit-for-bit, proving RIFF parse + PCM byte order + sign
    * handling — not just the header fields m08 checks. Pure map
    * stage; a VAD / silence-trim pass at 100 TB is this exact shape
    * plus a threshold filter. */

  /** Shared PCM decode contract for the per-sample audio passes
    * (frameEnergy / audioQcStats / frameGoertzel / audioFingerprint64):
    * parse through the JDK codec and accept only 16-bit mono
    * little-endian PCM; anything else → None (the decode DLQ
    * behavior). One definition so a contract change cannot silently
    * diverge between passes. */
  private def decodePcm16Mono(content: Array[Byte]): Option[Array[Byte]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val bytes = ais.readAllBytes()
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian) Some(bytes)
      else None
    } catch { case _: Exception => None }

  def frameEnergy(media: DataFrame, frameSize: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("abs_sum", LongType, nullable = false),
      StructField("abs_max", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val parsed = decodePcm16Mono(r.getAs[Array[Byte]](1))
          parsed match {
            case None => Iterator.empty
            case Some(bytes) =>
              val n = bytes.length / 2
              val nFrames = (n + frameSize - 1) / frameSize
              Iterator.range(0, nFrames).map { f =>
                val i0 = f * frameSize
                val len = math.min(frameSize, n - i0)
                var sum = 0L; var mx = 0; var i = i0
                while (i < i0 + len) {
                  val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF))
                  val a = math.abs(s)
                  sum += a; if (a > mx) mx = a
                  i += 1
                }
                Row(id, f, len, sum, mx)
              }
          }
        }
      }(enc)
  }

  /** Per-frame zero-crossing counts over REAL decoded PCM — the
    * cheapest voiced/unvoiced–noise discriminator an audio ingest
    * computes (high ZCR ≈ fricatives/noise, low ≈ tonal content).
    * A crossing is a polarity change between CONSECUTIVE samples
    * (polarity = s ≥ 0 — an exact integer test, no FP), and pair i
    * belongs to frame i/frameSize; frames whose only sample is the
    * clip's last (no successor pair) are omitted. Pure map stage,
    * integer outputs — the m28 oracle regenerates the synthetic
    * sample stream arithmetically and must match bit-for-bit
    * (m14's verification discipline). */
  def zeroCrossings(media: DataFrame, frameSize: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_pairs", IntegerType, nullable = false),
      StructField("n_crossings", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          decodePcm16Mono(r.getAs[Array[Byte]](1)) match {
            case None => Iterator.empty
            case Some(bytes) =>
              val n = bytes.length / 2
              def sample(i: Int): Int =
                (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)
              val nFrames = (n + frameSize - 1) / frameSize
              Iterator.range(0, nFrames).flatMap { f =>
                val i0 = f * frameSize
                val pairs = math.max(0, math.min(frameSize, n - 1 - i0))
                if (pairs == 0) None
                else {
                  var cross = 0; var i = i0
                  while (i < i0 + pairs) {
                    if ((sample(i) >= 0) != (sample(i + 1) >= 0)) cross += 1
                    i += 1
                  }
                  Some(Row(id, f, pairs, cross))
                }
              }
          }
        }
      }(enc)
  }

  /** Single-bin spectral energy (Goertzel 1958) over REAL decoded
    * PCM — the cheapest "is there tonal content near frequency f"
    * screen (dial-tone/beep/DTMF detection, hum screening) a speech
    * ingest runs per frame without paying for a full FFT. One linear
    * recurrence per frame (s₀ = x + coef·s₁ − s₂ with
    * coef = 2cos(2πf/fs) passed as a ROUNDED literal, m18's
    * rounded-basis rule) then power = s₁² + s₂² − coef·s₁·s₂.
    *
    * Verification: the recurrence is a fixed-order double fold, so
    * the m20 oracle replays it exactly with a list_reduce over the
    * arithmetically-regenerated samples — state rides in a 2-element
    * LIST, not a struct: DuckDB 1.0's struct-pack lambda writes
    * fields in order into the live accumulator, so a struct state
    * that writes s1 then reads the OLD s1 into s2 sees the mutated
    * value (measured); list construction copies. Pure map stage,
    * zero shuffle. */
  def frameGoertzel(media: DataFrame, frameSize: Int, coef: Double): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("power_raw", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val parsed = decodePcm16Mono(r.getAs[Array[Byte]](1))
          parsed match {
            case None => Iterator.empty
            case Some(bytes) =>
              val n = bytes.length / 2
              val nFrames = (n + frameSize - 1) / frameSize
              Iterator.range(0, nFrames).map { f =>
                val i0 = f * frameSize
                val len = math.min(frameSize, n - i0)
                var s1 = 0.0; var s2 = 0.0; var i = i0
                while (i < i0 + len) {
                  val x = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toDouble
                  val s0 = x + coef * s1 - s2
                  s2 = s1; s1 = s0
                  i += 1
                }
                Row(id, f, len, s1 * s1 + s2 * s2 - coef * s1 * s2)
              }
          }
        }
      }(enc)
  }

  /** Energy-contour audio fingerprint over REAL decoded PCM — the
    * audio analogue of [[imageAHash64]]: split the clip into
    * `frameSize`-sample frames, take each frame's exact integer
    * Σ|s|, and set bit f when energy RISES from frame f to f+1
    * (Haitsma/Kalker-style sign-of-delta fingerprinting, the shape
    * every near-dup audio system builds on). The contour survives
    * gain changes poorly but byte-identical and lightly-edited
    * re-encodes land within a few Hamming bits — the dedup target.
    * Bits come from exact integer comparisons, so the fingerprint is
    * bit-reproducible across engines and partitionings; output is
    * two BIGINT words in [[imageAHash64]]'s (w0, w1) layout, so
    * [[imageNearDupPairs]]'s banded blocking and
    * [[Similarity.hammingTopK]] search audio fingerprints unchanged.
    * Pure map stage; non-PCM16-mono bytes → null words (the decode
    * DLQ contract). */
  def audioFingerprint64(media: DataFrame, frameSize: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("w0", LongType, nullable = true),
      StructField("w1", LongType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val parsed = decodePcm16Mono(r.getAs[Array[Byte]](1))
          parsed match {
            case None => Row(id, null, null, null)
            case Some(bytes) =>
              val n = bytes.length / 2
              val nFrames = (n + frameSize - 1) / frameSize
              val en = new Array[Long](nFrames)
              var i = 0
              while (i < n) {
                val s = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)
                en(i / frameSize) += math.abs(s)
                i += 1
              }
              var w0 = 0L; var w1 = 0L; var f = 0
              while (f < math.min(63, nFrames - 1)) {
                if (en(f + 1) > en(f)) {
                  if (f < 32) w0 |= 1L << f else w1 |= 1L << (f - 32)
                }
                f += 1
              }
              Row(id, w0, w1, nFrames)
          }
        }
      }(enc)
  }

  /** Audio decode pass: binary → (sample_rate, channels, n_frames)
    * via the real JDK WAV parser; non-WAV bytes yield nulls. Header
    * read only — pure map stage. */
  def decodeAudioMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          wavHeader(r.getAs[Array[Byte]](1)) match {
            case Some((rate, ch, frames)) => Row(r.getLong(0), rate, ch, frames)
            case None => Row(r.getLong(0), null, null, null)
          }
        }
      }(enc)
  }

  /** Audio RESAMPLE pass (decimation): PCM-16 mono WAV → WAV at
    * sampleRate/factor, keeping every `factor`-th frame. Real byte
    * surgery through the JDK codec — the full PCM payload is decoded,
    * decimated, and re-encoded, so downstream consumers (and the m10
    * gate, which re-decodes the output) see a genuine, playable WAV.
    * Integer decimation only: it is exact (no interpolation filter to
    * diverge on), and output frames = ceil(n/factor), output rate =
    * rate/factor are id-recomputable for the oracle. Pure map stage —
    * no shuffle; cost is one decode+encode per clip, IO-bound at
    * scale. Non-WAV / malformed bytes yield a null row (the DLQ-style
    * contract every decode pass here follows). */
  def resampleAudio(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "decimation factor must be >= 1")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          decimateWav(r.getAs[Array[Byte]](1), factor) match {
            case Some(bytes) => Row(id, "audio", bytes, "resampled-wav")
            case None => Row(id, "audio", null, "resample-failed")
          }
        }
      }(enc)
  }

  /** The per-clip kernel of [[resampleAudio]]: None for non-WAV,
    * non-PCM16-mono, or truncated payloads — and for factors that do
    * not divide the clip's sample rate: the WAV header stores an
    * integer rate, so a non-dividing factor would silently truncate
    * (8000/3 → 2666 Hz) and break the exact rate/factor contract the
    * oracle recomputes. Rejecting keeps the output rate exact. */
  private[graft] def decimateWav(
      content: Array[Byte], factor: Int): Option[Array[Byte]] = {
    if (!looksLikeWav(content)) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16) return None
      if (fmt.getSampleRate.toInt % factor != 0) return None
      val n = ais.getFrameLength.toInt
      val pcm = ais.readAllBytes()
      if (pcm.length < n * 2) return None
      val outN = (n + factor - 1) / factor
      val out = new Array[Byte](outN * 2)
      var i = 0
      while (i < outN) {
        out(2 * i) = pcm(2 * i * factor)
        out(2 * i + 1) = pcm(2 * i * factor + 1)
        i += 1
      }
      val outFmt = new javax.sound.sampled.AudioFormat(
        fmt.getSampleRate / factor, 16, 1, true, false)
      val outAis = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(out), outFmt, outN.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(outAis,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      Some(baos.toByteArray)
    } catch { case _: Exception => None }
  }

  /** PCM-16 mono → WAV bytes through the JDK encoder (shared by the
    * padded synthesizer and the silence trimmer). */
  private def encodePcm16Wav(
      data: Array[Byte], frames: Int, sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Render [lead zeros | payload | trail zeros] PCM-16 mono WAV.
    * Payload samples use [[renderWav]]'s splitmix derivation; the two
    * EDGE samples are forced nonzero so a threshold-0 trim removes
    * exactly the padding (a pseudo-random edge sample is 0 with
    * p=1/65536 — enough to make a 500-doc gate flaky once fixtures
    * regenerate, so it is pinned instead of hoped against). */
  private[graft] def renderWavPadded(lead: Int, payload: Int, trail: Int,
      sampleRate: Int, seed: Long): Array[Byte] = {
    val n = lead + payload + trail
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < payload) {
      var p = seed * 0x9E3779B97F4A7C15L + i
      p ^= p >>> 29; p *= 0xBF58476D1CE4E5B9L; p ^= p >>> 32
      var s = (p & 0xFFFF).toInt - 32768
      if ((i == 0 || i == payload - 1) && s == 0) s = 1
      val j = lead + i
      data(2 * j) = (s & 0xFF).toByte
      data(2 * j + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    encodePcm16Wav(data, n, sampleRate)
  }

  /** Synthesize REAL WAV clips with id-derived leading/trailing
    * silence around the m08 payload: lead = id % 50, payload = 400 +
    * (id·13) % 800, trail = (id·7) % 60 frames at the m08 rate. The
    * m22 oracle recomputes the POST-TRIM frame count (= payload) from
    * the id alone, so a hash match proves [[trimSilence]] removed
    * exactly the silent frames from real codec bytes. */
  def synthesizeAudioPadded(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val rate = 8000 + math.floorMod(id, 8).toInt * 1000
          val lead = math.floorMod(id, 50).toInt
          val payload = 400 + math.floorMod(id * 13, 800).toInt
          val trail = math.floorMod(id * 7, 60).toInt
          Row(id, "audio", renderWavPadded(lead, payload, trail, rate, id),
            "synthetic-wav-padded")
        }
      }(enc)
  }

  /** Silence trim (the first pass of any audio curation pipeline):
    * strip leading/trailing frames with |sample| ≤ threshold and
    * re-encode — real decode → scan → re-encode byte surgery, same
    * contract as [[resampleAudio]]. Pure map stage; lead/trail
    * trimmed-frame counts ride along for QC reporting. All-silent
    * clips become 0-frame WAVs (kept, not nulled: they decoded fine —
    * dropping them is the caller's filter). Non-WAV/non-PCM16-mono →
    * null content (decode-DLQ contract). */
  def trimSilence(media: DataFrame, threshold: Int): DataFrame = {
    require(threshold >= 0, "threshold must be >= 0")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("lead_trimmed", IntegerType),
      StructField("trail_trimmed", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          trimWavSilence(r.getAs[Array[Byte]](1), threshold) match {
            case Some((bytes, lead, trail)) =>
              Row(id, "audio", bytes, "silence-trimmed", lead, trail)
            case None => Row(id, "audio", null, "trim-failed", null, null)
          }
        }
      }(enc)
  }

  /** Per-clip kernel of [[trimSilence]]: (trimmed bytes, leading
    * frames removed, trailing frames removed). */
  private[graft] def trimWavSilence(content: Array[Byte],
      threshold: Int): Option[(Array[Byte], Int, Int)] = {
    if (!looksLikeWav(content)) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16 ||
        fmt.isBigEndian) return None
      val n = ais.getFrameLength.toInt
      val pcm = ais.readAllBytes()
      if (pcm.length < n * 2) return None
      def amp(i: Int): Int =
        math.abs((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF))
      var lo = 0
      while (lo < n && amp(lo) <= threshold) lo += 1
      var hi = n - 1
      while (hi >= lo && amp(hi) <= threshold) hi -= 1
      val outN = hi - lo + 1
      val out = new Array[Byte](outN * 2)
      System.arraycopy(pcm, lo * 2, out, 0, outN * 2)
      Some((encodePcm16Wav(out, outN, fmt.getSampleRate.toInt),
        lo, n - 1 - hi))
    } catch { case _: Exception => None }
  }

  /** Synthesize REAL 64×64 grayscale PNGs whose 8×8 block pattern
    * derives from md5 — block (bx, by)'s 64 pixels all take the FIRST
    * BYTE of md5("id_bx_by") as their gray value. The same seed-free
    * derivation as the JL sign matrix (Similarity.signMatrix): a SQL
    * oracle recomputes every block value from md5 alone, which is
    * what lets the full decode → downsample → threshold path of
    * [[imageAHash64]] be oracle-checked end-to-end on real codec
    * bytes. */
  def synthesizeBlockImages(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "image", renderBlockPng(id, None), "synthetic-block-png")
        }
      }(enc)
  }

  /** Near-duplicate companions for [[synthesizeBlockImages]]: the
    * SAME md5 block pattern as `idCol` (so the rendered picture is
    * visually the original) with block (0,0) overridden to
    * `block0Value` — one edited tile, the canonical "slightly
    * modified re-upload". Emitted under `media_id + idOffset` so both
    * versions coexist in one corpus. The perturbation is
    * id-arithmetic + md5, so a SQL oracle reproduces the perturbed
    * fingerprints exactly. */
  def synthesizePerturbedBlockImages(df: DataFrame, idCol: String,
      idOffset: Long, block0Value: Int): DataFrame = {
    require(block0Value >= 0 && block0Value <= 255)
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id + idOffset, "image",
            renderBlockPng(id, Some(block0Value)), "synthetic-block-png-mod")
        }
      }(enc)
  }

  /** Cut decision for [[synthesizeShotFrames]]: frame `idx` of video
    * `videoId` starts a new shot iff the first md5 byte of
    * "{id}_cut_{idx}" lands in the low quarter — ~1.75 cuts per
    * 8-frame clip, reproducible by the SQL oracle from the id alone. */
  private[graft] def isShotCut(videoId: Long, idx: Int): Boolean =
    (java.security.MessageDigest.getInstance("MD5")
      .digest(s"${videoId}_cut_${idx}".getBytes("UTF-8"))(0) & 0xFF) % 4 == 0

  /** Frame sequences for shot-boundary tests: each video is `nFrames`
    * REAL block PNGs; frames within a shot render the SAME md5 block
    * pattern (patternId = videoId·100 + shot ordinal), so consecutive
    * same-shot frames decode to identical pixels (aHash Hamming 0)
    * and frames across a cut to unrelated patterns (~32 bits apart).
    * Output: (media_id, frame_idx, content). */
  def synthesizeShotFrames(
      df: DataFrame, idCol: String, nFrames: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          var shot = 0
          (0 until nFrames).iterator.map { idx =>
            if (idx > 0 && isShotCut(id, idx)) shot += 1
            Row(id, idx, renderBlockPng(id * 100 + shot, None))
          }
        }
      }(enc)
  }

  /** Shot-boundary detection over per-frame perceptual fingerprints —
    * the standard cut detector of a video-ingest pipeline: a boundary
    * is a frame whose fingerprint sits more than `minHamming` bits
    * from its predecessor's (same-shot frames re-encode within a few
    * bits; a cut jumps to an unrelated image ~32 bits away).
    *
    * Input is [[imageAHash64]]-shaped per frame: (media_id,
    * frame_idx, w0, w1). Scale shape: ONE window shuffle keyed by
    * media_id carrying 20-byte fingerprint rows — never pixels; the
    * decode/fingerprint pass upstream is map-only. Frames per video
    * is bounded (the sample schedule), so no skew concern. */
  def shotBoundaries(fingerprints: DataFrame, minHamming: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    fingerprints
      .withColumn("pw0", lag("w0", 1).over(w))
      .withColumn("pw1", lag("w1", 1).over(w))
      .filter(col("pw0").isNotNull)
      .withColumn("hamming",
        (bit_count(expr("w0 ^ pw0")) + bit_count(expr("w1 ^ pw1"))).cast("int"))
      .filter(col("hamming") > minHamming)
      .select(col("media_id"), col("frame_idx"), col("hamming"))
  }

  private[graft] def renderBlockPng(
      patternId: Long, block0Override: Option[Int]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val h = md.digest(s"${patternId}_${bx}_${by}".getBytes("UTF-8"))
        val v =
          if (bx == 0 && by == 0) block0Override.getOrElse(h(0) & 0xFF)
          else h(0) & 0xFF
        var y = by * 8
        while (y < by * 8 + 8) {
          var x = bx * 8
          while (x < bx * 8 + 8) {
            raster.setSample(x, y, 0, v); x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Banded-Hamming near-duplicate IMAGE pairs over [[imageAHash64]]
    * fingerprints — simhash's 4×16-bit pigeonhole blocking applied to
    * the picture domain: any two fingerprints within Hamming ≤ 3
    * agree exactly on at least one 16-bit band, so candidates come
    * from four uniform (band, value) bucket joins — never an
    * all-pairs scan — and the popcount verify touches candidates
    * only. O(corpus) + O(candidates), the 100-TB image-dedup shape. */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4-band blocking guarantees recall only for maxHamming <= 3")
    val withSim = hashes.select(col("media_id"),
      (col("w0").bitwiseOR(shiftleft(col("w1"), 32))).as("sig"))
    val bandCols = array((0 until 4).map { i =>
      struct(lit(i).as("band"),
        shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
    }: _*)
    val blocks = withSim
      .select(col("media_id"), col("sig"), explode(bandCols).as("b"))
      .select(col("media_id"), col("sig"), col("b.band"), col("b.v"))
    // hint("merge"): self-join exchange reuse (see
    // Dedup.jaccardPairsWithCounts for the full rationale)
    blocks.as("x").hint("merge").join(blocks.as("y"), Seq("band", "v"))
      .filter(col("x.media_id") < col("y.media_id"))
      .select(
        col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Splice a PNG `tEXt` metadata chunk (key\0value + CRC32 over
    * type+data, per the PNG spec) into [[renderBlockPng]]'s bytes,
    * right after IHDR — REAL container surgery, so the m24 parse has
    * an honest round-trip to prove (including CRC verification). */
  private[graft] def pngWithText(
      patternId: Long, key: String, value: String): Array[Byte] = {
    val base = renderBlockPng(patternId, None)
    // 8-byte signature + IHDR chunk (4 len + 4 type + 13 data + 4 crc)
    val insertAt = 8 + 25
    val data = (key + "\u0000" + value).getBytes("ISO-8859-1")
    val chunk = java.nio.ByteBuffer.allocate(12 + data.length)
    chunk.putInt(data.length)
    chunk.put("tEXt".getBytes("US-ASCII"))
    chunk.put(data)
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes("US-ASCII"))
    crc.update(data)
    chunk.putInt(crc.getValue.toInt)
    val out = new Array[Byte](base.length + chunk.capacity())
    System.arraycopy(base, 0, out, 0, insertAt)
    System.arraycopy(chunk.array(), 0, out, insertAt, chunk.capacity())
    System.arraycopy(base, insertAt, out, insertAt + chunk.capacity(),
      base.length - insertAt)
    out
  }

  /** Media rows whose PNG bytes carry an id-derived `tEXt` comment. */
  def synthesizeImagesWithText(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val v = s"src=${id % 7};gen=${id * 31 % 1000}"
          Row(id, "image", pngWithText(id, "Comment", v), "synthetic-png-text")
        }
      }(enc)
  }

  /** Parse every `tEXt` chunk out of real PNG bytes by walking the
    * chunk list (signature check, length-prefixed chunks, CRC32
    * re-verified per the spec) — the metadata-extraction pass of an
    * image-corpus ingest (provenance tags, capture software, license
    * strings ride in `tEXt`). Output one row per chunk: (media_id,
    * key, value, crc_ok). Malformed bytes yield no row (the decode
    * passes' shared DLQ contract). Pure map stage. */
  def pngTextChunks(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("key", StringType, nullable = true),
      StructField("value", StringType, nullable = true),
      StructField("crc_ok", BooleanType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val sig = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          if (b == null || b.length < 8 || !b.take(8).sameElements(sig)) Nil
          else try {
            val bb = java.nio.ByteBuffer.wrap(b)
            bb.position(8)
            val out = scala.collection.mutable.ListBuffer.empty[Row]
            var ok = true
            while (ok && bb.remaining() >= 12) {
              val len = bb.getInt
              // long arithmetic: a crafted length near Int.MaxValue
              // would wrap `len + 8` negative and pass an int check,
              // then blow up on allocation — malformed bytes must
              // yield no row, never a task failure
              if (len < 0 || bb.remaining().toLong < len.toLong + 8) ok = false
              else {
                val tpe = new Array[Byte](4); bb.get(tpe)
                val data = new Array[Byte](len); bb.get(data)
                val crcStored = bb.getInt
                if (new String(tpe, "US-ASCII") == "tEXt") {
                  val crc = new java.util.zip.CRC32()
                  crc.update(tpe); crc.update(data)
                  val s = new String(data, "ISO-8859-1")
                  val nul = s.indexOf('\u0000')
                  val (k, v) =
                    if (nul >= 0) (s.substring(0, nul), s.substring(nul + 1))
                    else (s, "")
                  out += Row(id, k, v, crc.getValue.toInt == crcStored)
                }
              }
            }
            out.toList
          } catch { case _: Exception => Nil }
        }
      }(enc)
  }

  /** Near-duplicate VIDEOS from shared keyframe signatures — the
    * re-upload/re-encode screen of a video-corpus ingest: two videos
    * are candidate duplicates when ≥ `minShared` of their sampled
    * keyframes carry the same content signature (positional — the
    * signature should bind frame content to its schedule slot, so
    * shuffled re-edits don't alias).
    *
    * Scale shape: an inverted index keyed by frame signature — the
    * t07 discipline applied to frames: one exchange of (sig,
    * media_id), pairs generated only WITHIN a signature bucket, never
    * all-pairs across videos. `maxSigFreq` drops signatures shared by
    * more than that many videos (intro cards, logo stings, black
    * frames — the boilerplate collapse that makes a signature bucket
    * quadratic); dropped frames can't vote, so treat it as the same
    * recall dial as t07's shingle cap.
    *
    * @param frames (media_id, frame_sig) — one row per sampled frame
    * @return (id_a < id_b, n_shared) with n_shared ≥ minShared */
  def keyframeNearDupPairs(
      frames: DataFrame, minShared: Int,
      maxSigFreq: Option[Int] = None): DataFrame = {
    require(minShared >= 1, "minShared must be positive")
    val f = frames.select(col("media_id"), col("frame_sig")).distinct()
    val pruned = maxSigFreq match {
      case Some(cap) =>
        require(cap >= 2, "maxSigFreq < 2 would drop every shared frame")
        f.withColumn("__n",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy("frame_sig")))
          .filter(col("__n") <= cap).drop("__n")
      case None => f
    }
    // hint("merge"): self-join exchange reuse (see
    // Dedup.jaccardPairsWithCounts for the full rationale)
    pruned.as("x").hint("merge").join(pruned.as("y"), Seq("frame_sig"))
      .filter(col("x.media_id") < col("y.media_id"))
      .groupBy(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Average-hash (aHash) perceptual fingerprint over REAL image
    * bytes: decode, downsample to an 8×8 grid of block means, set bit
    * j when block j's mean exceeds the global mean — the standard
    * near-duplicate-image primitive (two re-encodes/resizes of the
    * same picture land within a few Hamming bits). Output is two
    * BIGINT words in [[Similarity.binarySignBits]]'s layout, so
    * [[Similarity.hammingTopK]] searches image fingerprints directly.
    * The threshold compares exact integer sums (`blockSum·64 >
    * totalSum` — no FP mean), so the hash is bit-reproducible across
    * engines and partitionings. Pure map stage; undecodable bytes →
    * null row (the decode passes' shared DLQ contract). */
  def imageAHash64(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("w0", LongType, nullable = true),
      StructField("w1", LongType, nullable = true),
      StructField("n_set", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            val w = img.getWidth; val h = img.getHeight
            val gray = img.getRaster.getNumBands == 1
            // integer luma per pixel, summed into its 8×8 grid cell
            val sums = new Array[Long](64)
            val counts = new Array[Long](64)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val lum =
                  if (gray) img.getRaster.getSample(x, y, 0).toLong
                  else {
                    val p = img.getRGB(x, y)
                    ((p >> 16 & 0xFF) * 299L + (p >> 8 & 0xFF) * 587L +
                      (p & 0xFF) * 114L) / 1000L
                  }
                val j = math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w)
                sums(j) += lum; counts(j) += 1
                x += 1
              }
              y += 1
            }
            // bit j iff blockMean_j > globalMean, in exact integers:
            // (sum_j / n_j) > (total / N)  ⇔  sum_j · N > total · n_j
            val total = sums.sum; val n = counts.sum
            var w0 = 0L; var w1 = 0L; var set = 0
            var j = 0
            while (j < 64) {
              if (sums(j) * n > total * counts(j)) {
                if (j < 32) w0 |= 1L << j else w1 |= 1L << (j - 32)
                set += 1
              }
              j += 1
            }
            Row(id, w0, w1, set)
          } catch { case _: Exception => Row(id, null, null, null) }
        }
      }(enc)
  }

  /** Render a real PNG with the given dimensions, pixels seeded from
    * `seed` (deterministic: same seed+dims → identical bytes). */
  /** Dominant color per image over a 3-bit/channel quantized RGB cube
    * (512 buckets) — the cheap chromatic fingerprint image-curation
    * pipelines use for near-solid/banner detection (a dominant-bucket
    * fraction near 1.0 means the "image" is a flat card) and as a
    * grouping key for palette-level dedup blocking. Decodes the REAL
    * raster via javax.imageio, folds a 512-entry local histogram per
    * image, and emits the argmax bucket with its pixel share — ties
    * break on the lower bucket id so the pick replays in SQL. Pure map
    * stage: one row out per image, zero shuffle, histogram memory
    * bounded at 512 longs regardless of image size. Malformed bytes
    * yield no row (the decode passes' shared DLQ contract). */
  def dominantColor(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bucket", IntegerType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("total_px", LongType, nullable = false),
      StructField("frac", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) Iterator.empty
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val hist = new Array[Long](512)
            var y = 0
            while (y < h) {
              val buf = img.getRGB(0, y, w, 1, null, 0, w)
              var x = 0
              while (x < w) {
                val p = buf(x)
                // (r>>5)<<6 | (g>>5)<<3 | (b>>5): 3 bits per channel
                hist(((p >> 15) & 0x1C0) | ((p >> 10) & 0x38) |
                  ((p >> 5) & 0x7)) += 1
                x += 1
              }
              y += 1
            }
            var best = 0
            var k = 1
            while (k < 512) {
              if (hist(k) > hist(best)) best = k
              k += 1
            }
            val total = w.toLong * h
            // single double division, rounded HALF_UP at 6 — the
            // cross-engine determinism contract of the m-family
            val frac = BigDecimal(hist(best).toDouble / total)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            Iterator.single(Row(id, best, hist(best), total, frac))
          }
        }
      }(enc)
  }

  private[graft] def renderPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var p = seed * 0x9E3779B97F4A7C15L + (y.toLong << 20) + x
        p ^= p >>> 29; p *= 0xBF58476D1CE4E5B9L; p ^= p >>> 32
        img.setRGB(x, y, (p & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Synthesize a media table of REAL PNG images from any table with a
    * numeric id column. Dimensions derive arithmetically from the id
    * (`width = 16 + id % 64`, `height = 16 + (id * 7) % 48`), which is
    * what makes the decode path independently verifiable: a SQL oracle
    * can recompute the expected dimensions from the id alone, so a
    * rows+hash match proves the codec read the actual image headers. */
  def synthesizeImages(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = 16 + math.floorMod(id, 64).toInt
          val h = 16 + math.floorMod(id * 7, 48).toInt
          Row(id, "image", renderPng(w, h, id), "synthetic-png")
        }
      }(enc)
  }

  /** Synthesize a media table from any table with an id + string column
    * (used for tests/benchmarks in lieu of real media files). */
  // ---- REAL video container metadata (ISO-BMFF / MP4) --------------
  // The JDK has no video codec, but the MP4 CONTAINER is a simple
  // length-prefixed box tree — the metadata a 100-TB curation pass
  // actually needs (duration, timescale, track count) lives in
  // moov/mvhd and never requires decoding a frame. Writer + parser are
  // ~60 lines of pure JVM; decode stays header-only and IO-bound.

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** Minimal valid-enough MP4: ftyp + moov(mvhd + n×trak) + mdat. */
  private[graft] def renderMp4(
      timescale: Int, durationUnits: Long, nTracks: Int, seed: Long): Array[Byte] = {
    val ftyp = mp4Box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512) ++
        "isommp42".getBytes("US-ASCII"))
    val mvhd = mp4Box("mvhd",
      Array[Byte](0, 0, 0, 0) ++        // version 0 + flags
        be32(0) ++ be32(0) ++           // creation, modification
        be32(timescale) ++ be32(durationUnits.toInt) ++
        be32(0x00010000) ++             // rate 1.0
        Array[Byte](0x01, 0x00) ++      // volume 1.0
        new Array[Byte](10) ++          // reserved
        new Array[Byte](36) ++          // matrix (zeros fine for meta)
        new Array[Byte](24) ++          // pre_defined
        be32(nTracks + 1))              // next_track_ID
    val traks = (0 until nTracks).map(i => mp4Box("trak", be32(i)))
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    val moov = mp4Box("moov", mvhd ++ traks)
    val data = new Array[Byte](32)
    var i = 0; var p = seed
    while (i < data.length) {
      p = p * 0x9E3779B97F4A7C15L + 1; data(i) = (p >>> 56).toByte; i += 1
    }
    ftyp ++ moov ++ mp4Box("mdat", data)
  }

  /** Header-only MP4 parse: (timescale, durationUnits, nTracks) from
    * the moov box, or None if the bytes are not ISO-BMFF. Handles
    * mvhd versions 0 and 1; never touches mdat. */
  private[graft] def mp4Header(content: Array[Byte]): Option[(Int, Long, Int)] = {
    if (content == null || content.length < 16) return None
    def u32(o: Int): Long =
      ((content(o) & 0xFFL) << 24) | ((content(o + 1) & 0xFFL) << 16) |
        ((content(o + 2) & 0xFFL) << 8) | (content(o + 3) & 0xFFL)
    def typ(o: Int): String =
      new String(content, o, 4, "US-ASCII")
    if (typ(4) != "ftyp") return None
    var off = 0
    while (off + 8 <= content.length) {
      val (hdrLen, size) = boxHeader(content, off, content.length) match {
        case None => return None
        case Some(hs) => hs
      }
      if (typ(off + 4) == "moov") {
        var in = off + hdrLen; val end = off + size
        var ts = -1; var dur = -1L; var tracks = 0
        while (in + 8 <= end) {
          val (bHdr, bs) = boxHeader(content, in, end) match {
            case None => return None
            case Some(hs) => hs
          }
          typ(in + 4) match {
            case "mvhd" =>
              // mvhd is a ~108-byte FullBox — a 64-bit-size header
              // here means a malformed file, and the fixed field
              // offsets below assume the 8-byte header. The box size
              // must also COVER those offsets: a truncated mvhd
              // (bs 8..39) would index past the buffer and kill the
              // Spark task where the contract is None.
              if (bHdr != 8 || bs < 9) return None
              val v = content(in + 8) & 0xFF
              if (v == 1) { // 64-bit times: ts at +28, dur at +32 (8B)
                if (bs < 40) return None
                ts = u32(in + 28).toInt
                dur = (u32(in + 32) << 32) | u32(in + 36)
              } else {
                if (bs < 28) return None
                ts = u32(in + 20).toInt
                dur = u32(in + 24)
              }
            case "trak" => tracks += 1
            case _ =>
          }
          in += bs
        }
        return if (ts > 0) Some((ts, dur, tracks)) else None
      }
      off += size
    }
    None
  }

  def synthesizeVideo(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val ts = 600 * (1 + math.floorMod(id, 4).toInt)
          val dur = 240L + math.floorMod(id * 17, 2400)
          val n = 1 + math.floorMod(id, 3).toInt
          Row(id, "video", renderMp4(ts, dur, n, id), "synthetic-mp4")
        }
      }(enc)
  }

  /** Video metadata decode: parses the real MP4 container headers.
    * Partition-local map, no shuffle; unparseable bytes → null row
    * fields (same contract as decodeAudioMeta). */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("timescale", IntegerType),
      StructField("duration_units", LongType),
      StructField("n_tracks", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          mp4Header(r.getAs[Array[Byte]](1)) match {
            case Some((ts, dur, n)) => Row(r.getLong(0), ts, dur, n)
            case None => Row(r.getLong(0), null, null, null)
          }
        }
      }(enc)
  }

  def synthesize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("synthetic").as("source"))

  /** Audio QC statistics over REAL decoded PCM — the clipping /
    * DC-offset / peak screen every speech-corpus ingest runs before
    * paying for transcription: clipped recordings (samples pinned at
    * the rail) and DC-biased ones (mic/ADC fault) are dropped or
    * repaired early. One pass over the samples per clip, ALL-INTEGER
    * outputs (clip count, signed DC sum, peak |s|) so the m16 oracle
    * regenerates the synthetic PCM arithmetically and must match
    * bit-for-bit — the m14 proof pattern. Pure map stage, zero
    * shuffle; non-WAV / non-PCM16-mono bytes yield no row (the decode
    * DLQ contract). */
  /** Histogram equalization over REAL grayscale rasters — the
    * contrast-normalization pass an image-corpus ingest runs before
    * perceptual hashing or feature extraction (under/over-exposed
    * shots otherwise collapse into few gray levels and alias in
    * aHash/pHash space). The classic integer transfer function
    * v' = ⌊(cdf(v) − cdf_min)·255 / (N − cdf_min)⌋ — EXACT integer
    * arithmetic end to end, so the whole pixel transform is
    * SQL-replayable (m26 verifies every 8×8 block of the RE-ENCODED
    * output against an oracle that recomputes histogram → CDF → map
    * from the md5 block derivation alone). Pure map stage; re-encodes
    * through the JDK codec. */
  def equalizeGray(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            if (img == null) None
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              val raster = img.getRaster
              val hist = new Array[Long](256)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  hist(raster.getSample(x, y, 0)) += 1; x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              val cdf = new Array[Long](256)
              var acc = 0L; var v = 0
              while (v < 256) { acc += hist(v); cdf(v) = acc; v += 1 }
              var cdfMin = 0L; v = 0
              while (v < 256 && cdfMin == 0L) {
                if (hist(v) > 0) cdfMin = cdf(v); v += 1
              }
              val out = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val or = out.getRaster
              y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val s = raster.getSample(x, y, 0)
                  val m =
                    if (n == cdfMin) 0
                    else ((cdf(s) - cdfMin) * 255L / (n - cdfMin)).toInt
                  or.setSample(x, y, 0, m); x += 1
                }
                y += 1
              }
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", baos)
              Some(Row(id, "image", baos.toByteArray, "equalized"))
            }
          } catch { case _: Exception => None }
        }
      }(enc)
  }

  /** Read back the 8×8-block gray values of a block-structured image
    * (the verification half of [[equalizeGray]]'s round-trip): one
    * row per block with its value and a uniformity flag (a
    * non-uniform block means the transform or codec leaked across
    * block boundaries). */
  def grayBlockValues(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bx", IntegerType, nullable = false),
      StructField("by", IntegerType, nullable = false),
      StructField("v", IntegerType, nullable = false),
      StructField("uniform", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            if (img == null || img.getWidth % 8 != 0 || img.getHeight % 8 != 0)
              Nil
            else {
              val raster = img.getRaster
              for {
                by <- 0 until img.getHeight / 8
                bx <- 0 until img.getWidth / 8
              } yield {
                val v0 = raster.getSample(bx * 8, by * 8, 0)
                var uniform = true
                var y = by * 8
                while (y < by * 8 + 8) {
                  var x = bx * 8
                  while (x < bx * 8 + 8) {
                    if (raster.getSample(x, y, 0) != v0) uniform = false
                    x += 1
                  }
                  y += 1
                }
                Row(id, bx, by, v0, uniform)
              }
            }
          } catch { case _: Exception => Nil }
        }
      }(enc)
  }

  /** Peak normalization over REAL PCM — the gain-staging pass before
    * any audio corpus trains or transcribes (clips recorded at wildly
    * different levels otherwise dominate/vanish in energy-based
    * screens). Every sample rescales to `sign(s)·⌊|s|·target/peak⌋` —
    * EXACT integer arithmetic (trunc of a non-negative quotient), so
    * the whole per-sample transform is engine-replayable (float gain
    * would round differently per engine) — and the clip re-encodes
    * through the JDK codec. Silent clips (peak 0) pass through
    * unchanged. Pure map stage; output re-decodes (m25 proves it by
    * running [[audioQcStats]] over the OUTPUT bytes). */
  def peakNormalize(media: DataFrame, targetPeak: Int): DataFrame = {
    require(targetPeak >= 1 && targetPeak <= 32767)
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("old_peak", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val content = r.getAs[Array[Byte]](1)
          if (!looksLikeWav(content)) None
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(content))
            val fmt = ais.getFormat
            if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16 ||
              fmt.isBigEndian) None
            else {
              val pcm = ais.readAllBytes()
              val n = pcm.length / 2
              var peak = 0; var i = 0
              while (i < n) {
                val s = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF)
                val a = math.abs(s); if (a > peak) peak = a
                i += 1
              }
              val out = new Array[Byte](n * 2)
              i = 0
              while (i < n) {
                val s = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF)
                val v =
                  if (peak == 0) s
                  else {
                    val m = (math.abs(s).toLong * targetPeak / peak).toInt
                    if (s < 0) -m else m
                  }
                out(2 * i) = (v & 0xFF).toByte
                out(2 * i + 1) = ((v >> 8) & 0xFF).toByte
                i += 1
              }
              Some(Row(id, "audio",
                encodePcm16Wav(out, n, fmt.getSampleRate.toInt),
                "peak-normalized", peak))
            }
          } catch { case _: Exception => None }
        }
      }(enc)
  }

  def audioQcStats(media: DataFrame, clipThreshold: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("n_clipped", IntegerType, nullable = false),
      StructField("dc_sum", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val parsed = decodePcm16Mono(r.getAs[Array[Byte]](1))
          parsed.map { bytes =>
            val n = bytes.length / 2
            var clipped = 0; var dc = 0L; var peak = 0; var i = 0
            while (i < n) {
              val s = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)
              val a = math.abs(s)
              if (a >= clipThreshold) clipped += 1
              dc += s; if (a > peak) peak = a
              i += 1
            }
            Row(id, n, clipped, dc, peak)
          }.iterator
        }
      }(enc)
  }

  /** [[synthesizeBlockImages]] with a LETTERBOX: `t = id % 17` uniform
    * zero-value rows at the top and bottom (the aspect-ratio padding a
    * video-still or thumbnail pipeline must detect and crop), md5
    * block pixels between. Same seed-free derivation — a SQL oracle
    * rebuilds every pixel from id arithmetic + md5. */
  def synthesizeLetterboxImages(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("source", StringType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, "image", renderLetterboxPng(id),
            "synthetic-letterbox-png")
        }
      }(enc)
  }

  private[graft] def renderLetterboxPng(id: Long): Array[Byte] = {
    val t = math.floorMod(id, 17).toInt
    val md = java.security.MessageDigest.getInstance("MD5")
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val v =
          if (y < t || y >= 64 - t) 0
          else {
            val h = md.digest(s"${id}_${x / 8}_${y / 8}".getBytes("UTF-8"))
            h(0) & 0xFF
          }
        raster.setSample(x, y, 0, v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** DCT-II basis for [[imagePHash64]], rounded to 6 decimals —
    * `B(u)(x) = round6(cos(π(2x+1)u/16))`. The rounding is the
    * portability contract: every downstream product/sum is EXACT
    * decimal arithmetic over these fixed literals (the m18 oracle
    * interpolates the same values into its SQL), so the hash is
    * bit-reproducible across engines with no float-boundary hazard —
    * the trig-free-oracle discipline of the JL sign matrix, applied
    * where the math genuinely needs cosines. */
  private[graft] lazy val dctBasis6: Array[Array[java.math.BigDecimal]] =
    Array.tabulate(8, 8) { (u, x) =>
      java.math.BigDecimal.valueOf(Math.cos(Math.PI * (2 * x + 1) * u / 16.0))
        .setScale(6, java.math.RoundingMode.HALF_UP)
    }

  /** Perceptual DCT hash (pHash) over REAL image bytes — the
    * industry-standard near-duplicate-image fingerprint one tier above
    * [[imageAHash64]]: aHash thresholds block BRIGHTNESS (fooled by
    * global exposure shifts), pHash thresholds the 8×8 DCT SPECTRUM
    * against its own median, capturing structure. Pipeline: decode →
    * 8×8 grid of block luma means (exact ÷, scale-6) → 2-D DCT-II via
    * [[dctBasis6]] (all-decimal exact products/sums) → bit (u,v) set
    * when its coefficient exceeds the exact median of the 63 non-DC
    * coefficients (32nd-smallest under the (value, index) total
    * order; DC excluded and always 0). Output words follow
    * [[graft.operators.Similarity.binarySignBits]]'s layout so
    * `hammingTopK` / [[imageNearDupPairs]] consume pHash directly.
    * Pure map stage; undecodable bytes → null words. */
  def imagePHash64(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("w0", LongType, nullable = true),
      StructField("w1", LongType, nullable = true),
      StructField("n_set", IntegerType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val basis = dctBasis6
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            val w = img.getWidth; val h = img.getHeight
            val gray = img.getRaster.getNumBands == 1
            val sums = new Array[Long](64)
            val counts = new Array[Long](64)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val lum =
                  if (gray) img.getRaster.getSample(x, y, 0).toLong
                  else {
                    val p = img.getRGB(x, y)
                    ((p >> 16 & 0xFF) * 299L + (p >> 8 & 0xFF) * 587L +
                      (p & 0xFF) * 114L) / 1000L
                  }
                val j = math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w)
                sums(j) += lum; counts(j) += 1
                x += 1
              }
              y += 1
            }
            // exact decimal block means (scale 6 — for the md5-block
            // gate images the division is exact: 64·v / 64)
            val mean = Array.tabulate(8, 8) { (bx, by) =>
              java.math.BigDecimal.valueOf(sums(by * 8 + bx))
                .divide(java.math.BigDecimal.valueOf(counts(by * 8 + bx)),
                  6, java.math.RoundingMode.HALF_UP)
            }
            // 2-D DCT-II, exact decimal products and sums
            val coef = Array.tabulate(8, 8) { (u, v) =>
              var acc = java.math.BigDecimal.ZERO
              var x = 0
              while (x < 8) {
                var yy = 0
                while (yy < 8) {
                  acc = acc.add(mean(x)(yy)
                    .multiply(basis(u)(x)).multiply(basis(v)(yy)))
                  yy += 1
                }
                x += 1
              }
              acc
            }
            // median = 32nd smallest of the 63 non-DC coefficients
            // under the (value, idx) total order
            val nonDc = (for {
              u <- 0 until 8; v <- 0 until 8; if u != 0 || v != 0
            } yield (coef(u)(v), u * 8 + v))
              .sortWith { case ((c1, i1), (c2, i2)) =>
                val c = c1.compareTo(c2); c < 0 || (c == 0 && i1 < i2)
              }
            val med = nonDc(31)._1
            var w0 = 0L; var w1 = 0L; var set = 0
            nonDc.foreach { case (c, idx) =>
              if (c.compareTo(med) > 0) {
                if (idx < 32) w0 |= 1L << idx else w1 |= 1L << (idx - 32)
                set += 1
              }
            }
            Row(id, w0, w1, set)
          } catch { case _: Exception => Row(id, null, null, null) }
        }
      }(enc)
  }

  /** Uniform-border (letterbox / pillarbox) detection over REAL
    * decoded rasters: with `bv` = the pixel at (0,0), count the
    * leading/trailing rows and columns made ENTIRELY of `bv`. The
    * crop rectangle a thumbnail/training-image pipeline applies
    * before feature extraction falls straight out
    * (`content_h = h − top − bottom`). All-integer, defined purely on
    * the pixel grid — the m17 oracle recomputes the same counts from
    * the arithmetic pixel stream, proving decode + raster orientation.
    * Pure map stage; undecodable bytes yield no row. */
  def borderStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("border_val", IntegerType, nullable = false),
      StructField("top", IntegerType, nullable = false),
      StructField("bottom", IntegerType, nullable = false),
      StructField("left", IntegerType, nullable = false),
      StructField("right", IntegerType, nullable = false),
      StructField("content_h", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val img =
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))))
            catch { case _: Exception => None }
          img.map { im =>
            val (w, h) = (im.getWidth, im.getHeight)
            val raster = im.getRaster
            val bv = raster.getSample(0, 0, 0)
            def rowUniform(y: Int): Boolean = {
              var x = 0
              while (x < w) {
                if (raster.getSample(x, y, 0) != bv) return false
                x += 1
              }
              true
            }
            def colUniform(x: Int): Boolean = {
              var y = 0
              while (y < h) {
                if (raster.getSample(x, y, 0) != bv) return false
                y += 1
              }
              true
            }
            var top = 0
            while (top < h && rowUniform(top)) top += 1
            var bottom = 0
            while (bottom < h - top && rowUniform(h - 1 - bottom)) bottom += 1
            var left = 0
            while (left < w && colUniform(left)) left += 1
            var right = 0
            while (right < w - left && colUniform(w - 1 - right)) right += 1
            Row(id, bv, top, bottom, left, right, h - top - bottom)
          }.iterator
        }
      }(enc)
  }
}
