package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {

  private def media = Multimodal.synthesize(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
    "doc_id", "text")

  test("synthesized media table has the canonical schema") {
    val df = media
    assert(df.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "content", "source"))
    assert(df.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(df.count() > 0)
  }

  test("decodeMeta adds deterministic width/height/channels/n_bytes") {
    def run() = Multimodal.decodeMeta(media)
      .drop("content").orderBy("media_id").collect()
    val (d1, d2) = (run(), run())
    assert(d1.map(_.toString).toSeq == d2.map(_.toString).toSeq)
    val r = Multimodal.decodeMeta(media).orderBy("media_id").head()
    assert(r.getAs[Int]("width") >= 64 && r.getAs[Int]("channels") == 3)
    assert(r.getAs[Long]("n_bytes") > 0)
  }

  test("extractFeatures yields fixed-dim embeddings feeding ANN ops") {
    val feats = Multimodal.extractFeatures(media, dim = 32)
    assert(feats.schema.fieldNames.toSeq == Seq("media_id", "embedding"))
    val sizes = feats.select(size(col("embedding"))).distinct().collect()
    assert(sizes.map(_.getInt(0)).toSeq == Seq(32))
    // embeddings are usable by the similarity operators
    val topk = graft.operators.Similarity.bruteForceTopK(
      feats, feats.filter(col("media_id") < 2), "media_id", "embedding", 3)
    assert(topk.count() == 6)
  }

  test("image features are REAL block-mean luma from decoded pixels") {
    // md5-block PNG: 8×8 grid of constant 8×8 blocks — the 4×4
    // feature grid's cell c must equal the mean of its 4 block
    // values, computed here independently from the same md5 scheme
    val png = Multimodal.renderBlockPng(42L, None)
    val feats = Multimodal.imageBlockMeans(png, 16).get
    val md = java.security.MessageDigest.getInstance("MD5")
    def block(bx: Int, by: Int): Int =
      md.digest(s"42_${bx}_${by}".getBytes("UTF-8"))(0) & 0xFF
    for (cy <- 0 until 4; cx <- 0 until 4) {
      val expect = (block(2 * cx, 2 * cy) + block(2 * cx + 1, 2 * cy) +
        block(2 * cx, 2 * cy + 1) + block(2 * cx + 1, 2 * cy + 1)) / 4.0f
      assert(feats(cy * 4 + cx) == expect,
        s"cell ($cx,$cy): got ${feats(cy * 4 + cx)}, want $expect")
    }
    // byte-identical image → identical features; one edited tile
    // moves ONLY the affected cell
    val same = Multimodal.imageBlockMeans(Multimodal.renderBlockPng(42L, None), 16).get
    assert(feats.toSeq == same.toSeq)
    val edited = Multimodal.imageBlockMeans(
      Multimodal.renderBlockPng(42L, Some(255)), 16).get
    assert(edited(0) != feats(0))
    assert(edited.toSeq.drop(1) == feats.toSeq.drop(1),
      "an edit in block (0,0) must only move cell 0")
  }

  test("audio features are real per-window RMS over decoded PCM") {
    import spark.implicits._
    val ids = Seq(Tuple1(7L)).toDF("id")
    val wav = Multimodal.synthesizeAudio(ids, "id")
    val feats = Multimodal.extractFeatures(wav, dim = 8)
      .collect().head.getSeq[Float](1)
    assert(feats.length == 8)
    // synthesized tones carry energy in every window; RMS bounded by
    // the PCM16 range
    assert(feats.forall(f => f > 0f && f <= 32768f), feats.toString)
    // deterministic
    val again = Multimodal.extractFeatures(wav, dim = 8)
      .collect().head.getSeq[Float](1)
    assert(feats == again)
  }

  test("shotBoundaries reports exactly the planted cut positions from real decoded frames") {
    import spark.implicits._
    val vids = Seq(3L, 4L, 5L).toDF("id")
    val frames = Multimodal.synthesizeShotFrames(vids, "id", nFrames = 8)
    assert(frames.count() == 24)
    val fp0 = Multimodal.imageAHash64(frames.select(
      (col("media_id") * 100 + col("frame_idx")).as("media_id"), col("content")))
    val fp = fp0.select(
      expr("media_id div 100").cast("long").as("media_id"),
      pmod(col("media_id"), lit(100)).cast("int").as("frame_idx"),
      col("w0"), col("w1"))
    val got = Multimodal.shotBoundaries(fp, minHamming = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // expected boundaries = the md5 cut schedule, computed independently
    val want = (for {
      v <- Seq(3L, 4L, 5L); i <- 1 until 8
      if Multimodal.isShotCut(v, i)
    } yield (v, i)).toSet
    assert(got == want, s"got $got want $want")
    // same-shot consecutive frames are IDENTICAL pixels → Hamming 0,
    // so no false boundaries at any threshold
    assert(Multimodal.shotBoundaries(fp, minHamming = 0).collect()
      .forall(_.getInt(2) > 3))
  }

  test("resize clamps to bounding box preserving aspect ratio") {
    val out = Multimodal.resize(media, maxW = 128, maxH = 128).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(w >= 1 && w <= 128 && h >= 1 && h <= 128, s"out of box: ${w}x$h")
      assert(r.getAs[Int]("out_bytes") >= 1)
    }
    // an already-small image must be untouched (scale clamped to 1.0)
    val decoded = Multimodal.decodeMeta(media)
      .select("media_id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val big = Multimodal.resize(media, maxW = 4096, maxH = 4096).collect()
    big.foreach { r =>
      val (w0, h0) = decoded(r.getAs[Long]("media_id"))
      assert(r.getAs[Int]("out_width") == w0 && r.getAs[Int]("out_height") == h0)
    }
  }

  test("decodeMeta reads REAL PNG headers via javax.imageio") {
    val png = Multimodal.renderPng(37, 21, seed = 42L)
    assert(Multimodal.looksLikeImage(png))
    assert(Multimodal.imageHeader(png).contains((37, 21, 3)))

    val imgs = Multimodal.synthesizeImages(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "doc_id")
    val decoded = Multimodal.decodeMeta(imgs)
      .select("media_id", "width", "height", "channels").collect()
    assert(decoded.nonEmpty)
    decoded.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 16 + math.floorMod(id, 64).toInt, s"width of $id")
      assert(r.getInt(2) == 16 + math.floorMod(id * 7, 48).toInt, s"height of $id")
      assert(r.getInt(3) == 3)
    }
  }

  test("resize of a REAL PNG re-encodes an actually-scaled raster") {
    val imgs = Multimodal.synthesizeImages(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "doc_id")
    val out = Multimodal.resize(imgs, maxW = 32, maxH = 32).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(ow >= 1 && ow <= 32 && oh >= 1 && oh <= 32)
      // the emitted bytes are a real PNG whose header matches the
      // declared output dimensions — decode them back to prove it
      val hdr = Multimodal.imageHeader(r.getAs[Array[Byte]]("out_content"))
      assert(hdr.exists { case (w, h, _) => w == ow && h == oh },
        s"re-decoded dims $hdr != declared ${ow}x$oh")
    }
  }

  test("decodeAudioMeta reads REAL WAV headers via javax.sound.sampled") {
    val wav = Multimodal.renderWav(frames = 123, sampleRate = 11000, seed = 5L)
    assert(Multimodal.looksLikeWav(wav))
    assert(Multimodal.wavHeader(wav).contains((11000, 1, 123L)))
    assert(Multimodal.renderWav(123, 11000, 5L).toSeq == wav.toSeq) // deterministic
    assert(Multimodal.wavHeader("not audio".getBytes).isEmpty)

    val clips = Multimodal.synthesizeAudio(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "doc_id")
    val decoded = Multimodal.decodeAudioMeta(clips).collect()
    assert(decoded.nonEmpty)
    decoded.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8000 + math.floorMod(id, 8).toInt * 1000)
      assert(r.getInt(2) == 1)
      assert(r.getLong(3) == 400 + math.floorMod(id * 13, 800))
    }
  }

  test("renderPng is deterministic; non-image bytes fall back to stub") {
    assert(Multimodal.renderPng(20, 10, 7L).toSeq ==
      Multimodal.renderPng(20, 10, 7L).toSeq)
    assert(!Multimodal.looksLikeImage("just some text".getBytes))
    assert(Multimodal.imageHeader("just some text".getBytes).isEmpty)
    assert(Multimodal.imageHeader(null).isEmpty)
  }

  test("sampleFrames explodes per-frame rows partition-locally") {
    val frames = Multimodal.sampleFrames(media, everyNth = 1)
    assert(frames.count() >= media.count())
    assert(frames.schema.fieldNames.contains("frame_idx"))
  }

  test("mp4Header round-trips renderMp4 and rejects malformed bytes") {
    val bytes = Multimodal.renderMp4(1200, 1234L, 2, seed = 42L)
    assert(Multimodal.mp4Header(bytes).contains((1200, 1234L, 2)))
    // determinism
    assert(bytes.toSeq == Multimodal.renderMp4(1200, 1234L, 2, 42L).toSeq)
    // malformed: not ISO-BMFF / truncated / box overrunning the buffer
    assert(Multimodal.mp4Header("plain text, not a container".getBytes).isEmpty)
    assert(Multimodal.mp4Header(null).isEmpty)
    assert(Multimodal.mp4Header(bytes.take(20)).isEmpty)
    val corrupt = bytes.clone(); corrupt(0) = 0x7F.toByte // huge top box size
    assert(Multimodal.mp4Header(corrupt).isEmpty)
  }

  test("mp4Header parses version-1 mvhd (64-bit times)") {
    // hand-build a moov with a v1 mvhd: times are 8 bytes
    def be32(v: Int) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long) = be32((v >> 32).toInt) ++ be32(v.toInt)
    def box(t: String, p: Array[Byte]) = be32(8 + p.length) ++ t.getBytes ++ p
    val mvhd = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(90000) ++ be64(5000000000L) ++ new Array[Byte](80))
    val mp4 = box("ftyp", "isom".getBytes ++ be32(0)) ++
      box("moov", mvhd ++ box("trak", Array[Byte]())) ++
      box("mdat", Array[Byte](1, 2, 3))
    assert(Multimodal.mp4Header(mp4).contains((90000, 5000000000L, 1)))
  }

  test("mdatRange handles size==1 (largesize) and size==0 (to-EOF) boxes") {
    // ISO-BMFF's two special size encodings — real-world large /
    // streamed MP4s use them, and they used to silently route files
    // to the hash-projection stub instead of container features
    def be32(v: Int) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long) = be32((v >> 32).toInt) ++ be32(v.toInt)
    def box(t: String, p: Array[Byte]) = be32(8 + p.length) ++ t.getBytes ++ p
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0))
    val payload = Array[Byte](9, 8, 7, 6, 5)
    // size==1: 16-byte header, 64-bit largesize
    val mdatLarge = be32(1) ++ "mdat".getBytes ++ be64(16L + payload.length) ++ payload
    val f1 = ftyp ++ mdatLarge
    assert(Multimodal.mdatRange(f1).contains((ftyp.length + 16, payload.length)))
    // size==0: box extends to end of file
    val mdatEof = be32(0) ++ "mdat".getBytes ++ payload
    val f0 = ftyp ++ mdatEof
    assert(Multimodal.mdatRange(f0).contains((ftyp.length + 8, payload.length)))
    // truncated largesize header / largesize overrunning the buffer → None
    assert(Multimodal.mdatRange(ftyp ++ be32(1) ++ "mdat".getBytes ++ be32(0)).isEmpty)
    assert(Multimodal.mdatRange(
      ftyp ++ be32(1) ++ "mdat".getBytes ++ be64(1L << 40) ++ payload).isEmpty)
    // the top-level walk in mp4Header steps over a largesize box too
    def mvhd0 = box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(600) ++ be32(1200) ++ new Array[Byte](80))
    val withMoov = ftyp ++ mdatLarge ++ box("moov", mvhd0 ++ box("trak", Array[Byte]()))
    assert(Multimodal.mp4Header(withMoov).contains((600, 1200L, 1)))
  }

  test("decimateWav keeps exactly every nth PCM sample and halves the rate") {
    val wav = Multimodal.renderWav(frames = 101, sampleRate = 10000, seed = 5L)
    val out = Multimodal.decimateWav(wav, factor = 2).get
    // re-decode: ceil(101/2)=51 frames at 5000 Hz
    assert(Multimodal.wavHeader(out).contains((5000, 1, 51L)))
    // sample-exact: output frame i == input frame 2i (no filtering)
    def pcm(bytes: Array[Byte]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val raw = ais.readAllBytes()
      (0 until ais.getFrameLength.toInt).map(i =>
        ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xFF)).toShort)
    }
    val in = pcm(wav); val dec = pcm(out)
    assert(dec == (0 until 51).map(i => in(2 * i)))
    // malformed / unsupported inputs are rejected, not mangled
    assert(Multimodal.decimateWav("not audio".getBytes, 2).isEmpty)
    assert(Multimodal.decimateWav(null, 2).isEmpty)
    assert(Multimodal.decimateWav(wav.take(30), 2).isEmpty)
    // a factor that does not divide the rate would silently truncate
    // the integer WAV header rate (10000/3) → rejected
    assert(Multimodal.decimateWav(wav, 3).isEmpty)
    assert(Multimodal.decimateWav(wav, 4).nonEmpty) // 10000/4 = 2500 exact
  }

  test("trimWavSilence strips exactly the padding, re-encoding real WAV") {
    val wav = Multimodal.renderWavPadded(
      lead = 7, payload = 50, trail = 3, sampleRate = 9000, seed = 42L)
    assert(Multimodal.wavHeader(wav).contains((9000, 1, 60L)))
    val (out, lead, trail) = Multimodal.trimWavSilence(wav, 0).get
    assert((lead, trail) == (7, 3))
    assert(Multimodal.wavHeader(out).contains((9000, 1, 50L)))
    // trimmed payload is byte-identical to the un-padded render
    val bare = Multimodal.renderWavPadded(0, 50, 0, 9000, 42L)
    def pcm(bytes: Array[Byte]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      ais.readAllBytes().toSeq
    }
    assert(pcm(out) == pcm(bare))
    // no padding → identity; all-silent → empty clip, counts split
    val (same, l0, t0) = Multimodal.trimWavSilence(bare, 0).get
    assert((l0, t0) == (0, 0) && pcm(same) == pcm(bare))
    val silent = Multimodal.renderWavPadded(5, 0, 5, 8000, 1L)
    val (empty, l1, t1) = Multimodal.trimWavSilence(silent, 0).get
    assert(l1 + t1 == 10 && Multimodal.wavHeader(empty).exists(_._3 == 0L))
    // decode-DLQ contract on garbage
    assert(Multimodal.trimWavSilence("not audio".getBytes, 0).isEmpty)
    assert(Multimodal.trimWavSilence(null, 0).isEmpty)
  }

  test("imageAHash64 survives resize (near-dup) but separates images") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val imgs = Multimodal.synthesizeBlockImages(ids, "doc_id")
    val orig = Multimodal.imageAHash64(imgs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val small = Multimodal.imageAHash64(
        Multimodal.resize(imgs, 32, 32)
          .select(col("media_id"), col("out_content").as("content")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // a half-size bilinear re-render of the same picture stays within
    // a few bits (the near-duplicate property a pHash dedup keys on)…
    Seq(1L, 2L, 3L).foreach { id =>
      assert(ham(orig(id), small(id)) <= 6,
        s"resize moved id=$id by ${ham(orig(id), small(id))} bits")
    }
    // …while DIFFERENT images stay far apart (~32 expected at random)
    assert(ham(orig(1L), orig(2L)) >= 10 && ham(orig(1L), orig(3L)) >= 10)
  }

  test("tileStats: tiles partition each image exactly, clamped at edges") {
    import spark.implicits._
    val imgs = Multimodal.synthesizeImages(Seq(5L, 64L, 77L).toDF("doc_id"), "doc_id")
    val tiles = Multimodal.tileStats(imgs, patch = 16).collect()
    assert(tiles.forall(r => r.getLong(5) == r.getInt(3).toLong * r.getInt(4)),
      "n_px must equal tw×th")
    assert(tiles.forall(r => r.getInt(3) <= 16 && r.getInt(4) <= 16))
    val cover = tiles.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(5)).sum)
    Seq(5L, 64L, 77L).foreach { id =>
      val (w, h) = (16 + (id % 64), 16 + (id * 7) % 48)
      assert(cover(id) == w * h, s"id=$id covered ${cover(id)} of ${w * h}")
    }
    // red sums are bounded by 255·n_px and not all zero (real pixels)
    assert(tiles.forall(r => r.getLong(6) >= 0 && r.getLong(6) <= 255L * r.getLong(5)))
    assert(tiles.map(_.getLong(6)).sum > 0)
  }

  test("audioQcStats matches a local decode of the same WAV exactly") {
    import spark.implicits._
    val media = Multimodal.synthesizeAudio(Seq(3L, 9L).toDF("doc_id"), "doc_id")
    val got = Multimodal.audioQcStats(media, clipThreshold = 32000)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4))).toMap
    Seq(3L, 9L).foreach { id =>
      val frames = 400 + math.floorMod(id * 13, 800).toInt
      var clipped = 0; var dc = 0L; var peak = 0
      (0 until frames).foreach { i =>
        var p = id * 0x9E3779B97F4A7C15L + i
        p ^= p >>> 29; p *= 0xBF58476D1CE4E5B9L; p ^= p >>> 32
        val s = (p & 0xFFFF).toInt - 32768
        val a = math.abs(s)
        if (a >= 32000) clipped += 1
        dc += s; if (a > peak) peak = a
      }
      assert(got(id) == ((frames, clipped, dc, peak)), s"id=$id mismatch")
    }
    // malformed bytes yield no row (decode DLQ contract)
    val bad = Seq((1L, "audio", Array[Byte](1, 2, 3), "x"))
      .toDF("media_id", "kind", "content", "source")
    assert(Multimodal.audioQcStats(bad, 32000).count() == 0)
  }

  test("borderStats detects the synthesized letterbox exactly") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 16L, 17L, 33L) // t = 0, 5, 16, 0, 16
    val media = Multimodal.synthesizeLetterboxImages(ids.toDF("doc_id"), "doc_id")
    val got = Multimodal.borderStats(media).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(6))).toMap
    ids.foreach { id =>
      val t = math.floorMod(id, 17).toInt
      assert(got(id) == ((t, t, 64 - 2 * t)),
        s"id=$id (t=$t) got ${got(id)}")
    }
    // undecodable bytes yield no row
    val bad = Seq((1L, "image", Array[Byte](9, 9), "x"))
      .toDF("media_id", "kind", "content", "source")
    assert(Multimodal.borderStats(bad).count() == 0)
  }

  test("keyframeNearDupPairs: shared-signature voting, boilerplate cap") {
    import spark.implicits._
    // video 1 & 2: 8 frames, 7 shared; video 3 disjoint except one
    // "intro card" signature shared by ALL videos
    def frames(id: Long, sigs: Seq[String]) = sigs.map(s => (id, s))
    val data = (
      frames(1L, (0 to 6).map(i => s"s$i") :+ "only1") ++
      frames(2L, (0 to 6).map(i => s"s$i") :+ "only2") ++
      frames(3L, (0 to 7).map(i => s"x$i"))
    ).map { case (id, s) => (id, s) } ++
      Seq((1L, "intro"), (2L, "intro"), (3L, "intro"))
    val df = data.toDF("media_id", "frame_sig")

    val pairs = Multimodal.keyframeNearDupPairs(df, minShared = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 8L))) // 7 content + shared intro

    // capping the intro signature (freq 3 > cap 2) removes its vote
    val capped = Multimodal.keyframeNearDupPairs(df, minShared = 6,
        maxSigFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == Set((1L, 2L, 7L)))

    // duplicate frame rows never double-vote
    val doubled = df.unionByName(df)
    val dd = Multimodal.keyframeNearDupPairs(doubled, minShared = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dd == Set((1L, 2L, 8L)))
  }

  test("pngWithText splice keeps the PNG decodable; parse verifies CRC") {
    import spark.implicits._
    val bytes = Multimodal.pngWithText(42L, "Comment", "hello world")
    // the spliced container still decodes as an image
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 64 && img.getHeight == 64)
    val rows = Multimodal.pngTextChunks(
      Seq((42L, "image", bytes, "x")).toDF("media_id", "kind", "content", "source"))
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getString(1) == "Comment" &&
      rows(0).getString(2) == "hello world" && rows(0).getBoolean(3))
    // corrupt one data byte inside the tEXt chunk → crc_ok false
    val bad = bytes.clone()
    bad(8 + 25 + 8 + 2) = 'X'.toByte
    val badRows = Multimodal.pngTextChunks(
      Seq((43L, "image", bad, "x")).toDF("media_id", "kind", "content", "source"))
      .collect()
    assert(badRows.length == 1 && !badRows(0).getBoolean(3))
    // garbage bytes yield no rows
    assert(Multimodal.pngTextChunks(
      Seq((44L, "image", Array[Byte](1, 2, 3), "x"))
        .toDF("media_id", "kind", "content", "source")).count() == 0)
  }

  test("dominantColor picks the modal quantized bucket; ties go to the lower bucket") {
    import spark.implicits._
    def png(pixels: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y * w + x))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    // color A (200,100,50) -> bucket 6*64+3*8+1 = 409; B (10,20,30) -> 0
    val a = (200 << 16) | (100 << 8) | 50
    val b = (10 << 16) | (20 << 8) | 30
    val majority = png(Seq(a, a, a, a, a, b, b, b), 4, 2)
    val out = Multimodal.dominantColor(
      Seq((1L, majority)).toDF("media_id", "content")).collect()
    assert(out.length == 1)
    assert(out(0).getInt(1) == 409 && out(0).getLong(2) == 5L &&
      out(0).getLong(3) == 8L && out(0).getDouble(4) == 0.625,
      out(0).toString)
    // exact tie: 4 px each -> lower bucket id (B's bucket 0) wins
    val tied = png(Seq(a, a, a, a, b, b, b, b), 4, 2)
    val t = Multimodal.dominantColor(
      Seq((2L, tied)).toDF("media_id", "content")).collect()
    assert(t(0).getInt(1) == 0 && t(0).getLong(2) == 4L, t(0).toString)
    // malformed bytes yield no row (shared DLQ contract)
    assert(Multimodal.dominantColor(
      Seq((3L, Array[Byte](9, 9, 9))).toDF("media_id", "content")).count() == 0)
  }

  test("m04 video branch: features derive from decoded container fields, not a blob hash") {
    val dim = 16
    val (ts, dur, n) = (1200, 2000L, 2)
    val bytes = Multimodal.renderMp4(ts, dur, n, seed = 7L)
    val f = Multimodal.videoContainerFeatures(bytes, dim).get
    // timing cells are the PARSED mvhd fields (m09's arithmetic)
    assert(f(0) == (dur * 1000.0 / ts).toFloat &&
      f(1) == ts.toFloat && f(2) == n.toFloat, f.toSeq.toString)
    // deterministic, fixed shape, signature cells in [0, 1)
    assert(f.length == dim)
    assert(Multimodal.videoContainerFeatures(bytes, dim).get.sameElements(f))
    assert(f.drop(3).forall(v => v >= 0f && v < 1f), f.toSeq.toString)
    // same container timing, re-encoded essence: cells 0-2 agree,
    // at least one slot signature moves (and not all of them must —
    // signatures are positional per the m23 discipline)
    val remux = Multimodal.renderMp4(ts, dur, n, seed = 8L)
    val g = Multimodal.videoContainerFeatures(remux, dim).get
    assert(g(0) == f(0) && g(1) == f(1) && g(2) == f(2))
    assert(!g.drop(3).sameElements(f.drop(3)))
    // different duration: timing cell moves
    val other = Multimodal.renderMp4(ts, dur + 600, n, seed = 7L)
    assert(Multimodal.videoContainerFeatures(other, dim).get.head != f(0))
    // the kernel routes ISO-BMFF bytes through this branch
    assert(Multimodal.featureKernel(bytes, dim).sameElements(f))
    // and non-BMFF bytes still take the documented hash-projection
    // stand-in (unchanged shape; determinism)
    val txt = "not a video at all".getBytes("UTF-8")
    assert(Multimodal.videoContainerFeatures(txt, dim).isEmpty)
    assert(Multimodal.featureKernel(txt, dim).length == dim)
    // truncated/hostile container bytes: parse refuses, kernel falls
    // through rather than failing the task
    val truncated = bytes.take(24)
    assert(Multimodal.featureKernel(truncated, dim).length == dim)
  }
}
