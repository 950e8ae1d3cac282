package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{HammingDedup, Multimodal}

/** Multimodal-column plumbing over a media table synthesized from
  * `documents` (this environment ships no media files or codecs; the
  * decode kernels are deterministic stubs — see
  * [[graft.operators.Multimodal]]). What the oracles verify is the
  * Spark-side contract: binary column handling, the mapPartitions
  * decode pass, metadata schema, and the frame-sampling explode. */
object MultimodalOps {
  import Tables.t

  private def media(s: org.apache.spark.sql.SparkSession, dir: String) =
    Multimodal.synthesize(
      Tables.spread(t(s, dir, "documents")), "doc_id", "text")

  private val duckKind =
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  // Decode pass → per-kind byte totals. The width/height stub outputs
  // are not in the projection, so the oracle checks the real contract:
  // the binary column's length survives the mapPartitions decode.
  private val m01 = GraftQuery(
    "m01_media_kind_stats",
    (s, dir) => {
      Multimodal.decodeMeta(media(s, dir))
        .groupBy("kind")
        .agg(count(lit(1)).as("n_media"), sum("n_bytes").as("sum_bytes"))
        .orderBy("kind")
    },
    Some(s"""SELECT $duckKind AS kind, count(*) AS n_media,
             CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes
             FROM documents GROUP BY 1 ORDER BY kind"""))

  // Full decode output including the stub width/height/channels. The
  // stub kernel is a mod-2⁶⁴ byte fold (h = h·31 + byte, seeded), so
  // the oracle replays it exactly in DuckDB HUGEINT arithmetic (t05's
  // technique; the corpus is pure ASCII so ord(char) == UTF-8 byte).
  // floorMod(h, 1024) == m % 1024 on the unsigned residue because
  // 1024 | 2⁶⁴, and floorMod(h >> 16, 1024) reads bits 16–25, which
  // the arithmetic and logical shifts share — so (m // 65536) % 1024
  // matches the signed-shift kernel bit-for-bit.
  private val m02 = GraftQuery(
    "m02_media_decode_meta",
    (s, dir) => {
      Multimodal.decodeMeta(media(s, dir))
        .select("media_id", "kind", "width", "height", "channels", "n_bytes")
        .orderBy("media_id")
    },
    Some(s"""WITH f AS (SELECT doc_id, strlen(text) AS len, list_reduce(
               list_prepend(CAST(1125899906842597 AS HUGEINT),
                 list_transform(range(1, strlen(text) + 1),
                   i -> CAST(ord(substr(text, i, 1)) AS HUGEINT))),
               (h, b) -> (h * 31 + b) % 18446744073709551616) AS m
             FROM documents)
             SELECT doc_id AS media_id, $duckKind AS kind,
               CASE WHEN len = 0 THEN 0
                 ELSE CAST(64 + m % 1024 AS INT) END AS width,
               CASE WHEN len = 0 THEN 0
                 ELSE CAST(64 + (m // 65536) % 1024 AS INT) END AS height,
               CASE WHEN len = 0 THEN 0 ELSE 3 END AS channels,
               CAST(len AS BIGINT) AS n_bytes
             FROM f ORDER BY media_id"""))

  // Frame sampling: content → n_frames (1 per 256 bytes) → every 2nd
  // frame exploded partition-locally. The oracle recomputes the
  // sampled-frame count arithmetic per document.
  private val m03 = GraftQuery(
    "m03_frame_sample",
    (s, dir) => {
      Multimodal.sampleFrames(media(s, dir), everyNth = 2, frameBytes = 256)
        .groupBy("kind")
        .agg(count(lit(1)).as("n_frames_sampled"),
          countDistinct("media_id").as("n_media"))
        .orderBy("kind")
    },
    Some(s"""WITH m AS (SELECT $duckKind AS kind,
               greatest(1, strlen(text) // 256) AS n_frames
               FROM documents)
             SELECT kind, CAST(sum((n_frames - 1) // 2 + 1) AS BIGINT) AS n_frames_sampled,
               count(*) AS n_media
             FROM m GROUP BY kind ORDER BY kind"""))

  // Feature extraction feeding vector search, on REAL decoded pixels:
  // md5-block PNGs (m11's corpus) → Multimodal.featureKernel's image
  // path (4×4 block-mean luma grid — the aHash pre-threshold
  // features) → exact cosine top-3 against the first 5 images. The
  // corpus also plants byte-identical twins of every query under
  // media_id+1000000 (cosine exactly 1.0 at rank 1). The oracle
  // recomputes every feature arithmetically from md5 alone (cell
  // mean = Σ of its 4 constant 8×8 blocks / 4 — exact doubles: all
  // products are small integers/16, so the dot/norm/round chain is
  // bit-identical across engines) and replays the full brute-force
  // ranking — decode → feature → ANN proven end-to-end with no stub
  // anywhere in the path.
  private val m04 = GraftQuery(
    "m04_media_feature_topk",
    (s, dir) => {
      val base = Tables.spread(t(s, dir, "documents"))
      val orig = Multimodal.synthesizeBlockImages(base, "doc_id")
      val twins = orig.filter(col("media_id") < 5)
        .withColumn("media_id", col("media_id") + 1000000L)
      val feats = graft.operators.Multimodal.extractFeatures(
        orig.unionByName(twins), dim = 16)
      graft.operators.Similarity.bruteForceTopK(
          feats, feats.filter(col("media_id") < 5), "media_id", "embedding", k = 3)
        .select(col("query_id"), col("rank"), col("nbr_id"), col("cosine"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH ids AS (
              SELECT doc_id AS media_id, doc_id AS pat FROM documents
              UNION ALL
              SELECT doc_id + 1000000, doc_id FROM documents WHERE doc_id < 5),
            b AS (SELECT media_id, j,
                CAST(concat('0x', substr(md5(CAST(pat AS VARCHAR) || '_' ||
                  CAST(j % 8 AS VARCHAR) || '_' || CAST(j // 8 AS VARCHAR)),
                  1, 2)) AS INT) AS v
              FROM ids, (SELECT CAST(unnest(range(64)) AS INT) AS j)),
            f AS (SELECT media_id,
                ((j // 8) // 2) * 4 + (j % 8) // 2 AS c,
                sum(v) / 4.0 AS feat
              FROM b GROUP BY media_id, ((j // 8) // 2) * 4 + (j % 8) // 2),
            n AS (SELECT media_id, sqrt(sum(feat * feat)) AS nrm
              FROM f GROUP BY media_id),
            q AS (SELECT media_id, c, feat FROM f WHERE media_id < 5),
            dots AS (SELECT q.media_id AS query_id, f.media_id AS nbr_id,
                sum(q.feat * f.feat) AS d
              FROM q JOIN f ON q.c = f.c AND f.media_id <> q.media_id
              GROUP BY q.media_id, f.media_id),
            sc AS (SELECT query_id, nbr_id,
                round(d / (nq.nrm * nc.nrm), 6) AS cosine
              FROM dots
              JOIN n nq ON nq.media_id = query_id
              JOIN n nc ON nc.media_id = nbr_id),
            rk AS (SELECT query_id, nbr_id, cosine,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, nbr_id) AS rank FROM sc)
            SELECT query_id, CAST(rank AS INT) AS rank, nbr_id,
              round(cosine, 4) AS cosine
            FROM rk WHERE rank <= 3 ORDER BY query_id, rank"""))

  // Resize pass over the synthesized (text-byte) media: every row
  // takes the non-image stub branch — (w, h) from m02's byte-fold
  // kernel, `fitBox` bounding-box floor arithmetic, byte truncation
  // by area ratio. All of it is IEEE-double arithmetic mirrored
  // operation-for-operation in the oracle (min/floor/trunc match
  // Java's math.min/floor/toInt; the integer products stay < 2⁵³ so
  // every double is exact before the final divisions).
  private val m05 = GraftQuery(
    "m05_media_resize",
    (s, dir) => {
      Multimodal.resize(media(s, dir), maxW = 128, maxH = 128)
        .select("media_id", "kind", "out_width", "out_height", "out_bytes")
        .orderBy("media_id")
    },
    Some(s"""WITH f AS (SELECT doc_id, strlen(text) AS len, list_reduce(
               list_prepend(CAST(1125899906842597 AS HUGEINT),
                 list_transform(range(1, strlen(text) + 1),
                   i -> CAST(ord(substr(text, i, 1)) AS HUGEINT))),
               (h, b) -> (h * 31 + b) % 18446744073709551616) AS m
             FROM documents),
             d AS (SELECT doc_id, len,
               CAST(64 + m % 1024 AS INT) AS w,
               CAST(64 + (m // 65536) % 1024 AS INT) AS h
             FROM f),
             sc AS (SELECT doc_id, len, w, h,
               least(CAST(1.0 AS DOUBLE),
                 least(128.0 / w, 128.0 / h)) AS scale
             FROM d),
             o AS (SELECT doc_id, len, w, h,
               greatest(1, CAST(floor(w * scale) AS INT)) AS ow,
               greatest(1, CAST(floor(h * scale) AS INT)) AS oh
             FROM sc)
             SELECT doc_id AS media_id, $duckKind AS kind,
               CASE WHEN len = 0 THEN 1 ELSE ow END AS out_width,
               CASE WHEN len = 0 THEN 1 ELSE oh END AS out_height,
               CASE WHEN len = 0 THEN 0
                 ELSE greatest(1, CAST(trunc(len *
                   ((CAST(ow AS DOUBLE) * oh) / (CAST(w AS DOUBLE) * h)))
                   AS INT)) END AS out_bytes
             FROM o ORDER BY media_id"""))

  // REAL codec end-to-end: synthesize actual PNGs whose dimensions are
  // an arithmetic function of the id, decode them with javax.imageio
  // (header-only read), and let DuckDB recompute the expected dims from
  // the id alone. A rows+schema+hash match proves the codec read real
  // image headers — no stub in this path.
  private val m06 = GraftQuery(
    "m06_image_decode_real",
    (s, dir) => {
      Multimodal.decodeMeta(
          Multimodal.synthesizeImages(
            Tables.spread(t(s, dir, "documents")), "doc_id"))
        .select(col("media_id"), col("width"), col("height"), col("channels"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
              CAST(16 + doc_id % 64 AS INT) AS width,
              CAST(16 + (doc_id * 7) % 48 AS INT) AS height,
              CAST(3 AS INT) AS channels
            FROM documents ORDER BY media_id"""))

  // REAL pixel rescale (Graphics2D bilinear + PNG re-encode); the
  // oracle recomputes the aspect-preserving bounding-box arithmetic in
  // SQL. Identical IEEE-754 double ops on both sides → exact match.
  private val m07 = GraftQuery(
    "m07_image_resize_real",
    (s, dir) => {
      Multimodal.resize(
          Multimodal.synthesizeImages(
            Tables.spread(t(s, dir, "documents")), "doc_id"),
          maxW = 32, maxH = 32)
        .select(col("media_id"), col("out_width"), col("out_height"))
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
              SELECT doc_id AS media_id,
                CAST(16 + doc_id % 64 AS INT) AS w,
                CAST(16 + (doc_id * 7) % 48 AS INT) AS h
              FROM documents),
            scaled AS (
              SELECT media_id, w, h,
                least(1.0, least(32.0 / w, 32.0 / h)) AS scale
              FROM dims)
            SELECT media_id,
              CAST(greatest(1, floor(w * scale)) AS INT) AS out_width,
              CAST(greatest(1, floor(h * scale)) AS INT) AS out_height
            FROM scaled ORDER BY media_id"""))

  // REAL audio codec end-to-end (javax.sound.sampled WAV parser):
  // synthesized PCM-16 clips carry id-derived sample rate and frame
  // count; the oracle recomputes both from the id — a hash match
  // proves the RIFF headers were actually parsed.
  private val m08 = GraftQuery(
    "m08_audio_decode_real",
    (s, dir) => {
      Multimodal.decodeAudioMeta(
          Multimodal.synthesizeAudio(
            Tables.spread(t(s, dir, "documents")), "doc_id"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
              CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
              CAST(1 AS INT) AS channels,
              CAST(400 + (doc_id * 13) % 800 AS BIGINT) AS n_frames
            FROM documents ORDER BY media_id"""))

  // REAL video container metadata end-to-end: synthesized ISO-BMFF/MP4
  // files carry id-derived timescale/duration/track-count in moov/mvhd;
  // the oracle recomputes them from the id — a hash match proves the
  // box tree was actually walked (no codec needed: container metadata
  // is what a curation pass reads, frames are never decoded).
  private val m09 = GraftQuery(
    "m09_video_decode_real",
    (s, dir) => {
      Multimodal.decodeVideoMeta(
          Multimodal.synthesizeVideo(
            Tables.spread(t(s, dir, "documents")), "doc_id"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
              CAST(600 * (1 + doc_id % 4) AS INT) AS timescale,
              CAST(240 + (doc_id * 17) % 2400 AS BIGINT) AS duration_units,
              CAST(1 + doc_id % 3 AS INT) AS n_tracks
            FROM documents ORDER BY media_id"""))

  // REAL audio resample end-to-end: synthesized PCM-16 WAVs are
  // decimated ×2 (every 2nd frame, rate halved — true payload
  // surgery through the JDK codec), then the OUTPUT bytes are
  // re-decoded by the same header reader the m08 gate uses. The
  // oracle recomputes the expected post-resample metadata from the id
  // alone — a hash match proves decode → decimate → re-encode →
  // re-decode all actually happened to the bytes.
  private val m10 = GraftQuery(
    "m10_audio_resample_real",
    (s, dir) => {
      Multimodal.decodeAudioMeta(
          Multimodal.resampleAudio(
            Multimodal.synthesizeAudio(
              Tables.spread(t(s, dir, "documents")), "doc_id"),
            factor = 2))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
              CAST((8000 + (doc_id % 8) * 1000) // 2 AS INT) AS sample_rate,
              CAST(1 AS INT) AS channels,
              CAST((400 + (doc_id * 13) % 800 + 1) // 2 AS BIGINT) AS n_frames
            FROM documents ORDER BY media_id"""))

  // Image perceptual hash (aHash) over REAL PNG bytes, fully
  // oracle-checked: the synthesized images carry an 8×8 block pattern
  // whose gray values derive from md5 (the JL-sign-matrix trick moved
  // into pixels), so DuckDB recomputes every block value from md5
  // alone and replays the integer threshold — a hash match proves the
  // codec DECODED the actual pixels, downsampled them, and
  // thresholded correctly. Output words are binarySignBits-shaped:
  // hammingTopK searches these fingerprints directly (image near-dup
  // detection at 16 B per image).
  private val m11 = GraftQuery(
    "m11_image_ahash_real",
    (s, dir) => {
      Multimodal.imageAHash64(
          Multimodal.synthesizeBlockImages(
            Tables.spread(t(s, dir, "documents")), "doc_id"))
        .orderBy("media_id")
    },
    Some("""WITH ids AS (SELECT doc_id AS media_id FROM documents),
            b AS (SELECT media_id, j,
                CAST(concat('0x', substr(md5(CAST(media_id AS VARCHAR) || '_' ||
                  CAST(j % 8 AS VARCHAR) || '_' || CAST(j // 8 AS VARCHAR)),
                  1, 2)) AS INT) AS v
              FROM ids, (SELECT CAST(unnest(range(64)) AS INT) AS j)),
            tot AS (SELECT media_id, sum(v) AS total FROM b GROUP BY media_id),
            bits AS (SELECT media_id, j,
                CASE WHEN v * 64 > total THEN 1 ELSE 0 END AS bit
              FROM b JOIN tot USING (media_id))
            SELECT media_id,
              CAST(sum(CASE WHEN j < 32 THEN bit * (1::BIGINT << j)
                ELSE 0 END) AS BIGINT) AS w0,
              CAST(sum(CASE WHEN j >= 32 THEN bit * (1::BIGINT << (j - 32))
                ELSE 0 END) AS BIGINT) AS w1,
              CAST(sum(bit) AS INT) AS n_set
            FROM bits GROUP BY media_id ORDER BY media_id"""))

  // Image near-duplicate PAIRS: m11's aHash fingerprints through
  // simhash-style 4×16-bit pigeonhole banding (one-band-exact
  // candidates + popcount verify — never all-pairs). The corpus
  // plants perturbed companions (same md5 block pattern, ONE edited
  // tile, offset ids) whose fingerprints sit a few Hamming bits from
  // their originals; random image pairs sit ~32 bits apart, so the
  // pair set is exactly planted-copy ↔ original. The oracle
  // recomputes both fingerprint sets from md5 + the perturbation
  // arithmetic and scans ALL pairs — banding recall ≤ 3 bits is
  // pigeonhole-exact, so banded Spark ≡ exhaustive SQL.
  private val m12 = GraftQuery(
    "m12_image_neardup_pairs",
    (s, dir) => {
      val base = Tables.spread(t(s, dir, "documents"))
      val orig = Multimodal.synthesizeBlockImages(base, "doc_id")
      val mod = Multimodal.synthesizePerturbedBlockImages(
        base.filter(col("doc_id") < 50), "doc_id",
        idOffset = 10000000L, block0Value = 255)
      Multimodal.imageNearDupPairs(
          Multimodal.imageAHash64(orig.unionByName(mod)), maxHamming = 3)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH ids AS (
              SELECT doc_id AS media_id, doc_id AS pat, FALSE AS mod
              FROM documents
              UNION ALL
              SELECT doc_id + 10000000, doc_id, TRUE FROM documents
              WHERE doc_id < 50),
            b AS (SELECT media_id, j,
                CASE WHEN mod AND j = 0 THEN 255 ELSE
                  CAST(concat('0x', substr(md5(CAST(pat AS VARCHAR) || '_' ||
                    CAST(j % 8 AS VARCHAR) || '_' || CAST(j // 8 AS VARCHAR)),
                    1, 2)) AS INT) END AS v
              FROM ids, (SELECT CAST(unnest(range(64)) AS INT) AS j)),
            tot AS (SELECT media_id, sum(v) AS total FROM b GROUP BY media_id),
            bits AS (SELECT media_id, j,
                CASE WHEN v * 64 > total THEN 1 ELSE 0 END AS bit
              FROM b JOIN tot USING (media_id)),
            w AS (SELECT media_id,
                CAST(sum(CASE WHEN j < 32 THEN bit * (1::BIGINT << j)
                  ELSE 0 END) AS BIGINT) AS w0,
                CAST(sum(CASE WHEN j >= 32 THEN bit * (1::BIGINT << (j - 32))
                  ELSE 0 END) AS BIGINT) AS w1
              FROM bits GROUP BY media_id)
            SELECT a.media_id AS id_a, c.media_id AS id_b,
              CAST(bit_count(xor(a.w0, c.w0)) + bit_count(xor(a.w1, c.w1))
                AS INT) AS hamming
            FROM w a JOIN w c ON a.media_id < c.media_id
            WHERE bit_count(xor(a.w0, c.w0)) + bit_count(xor(a.w1, c.w1)) <= 3
            ORDER BY id_a, id_b"""))

  // ViT patch tiling verified TO THE PIXEL: the oracle regenerates the
  // synthetic image's pixel stream arithmetically (the splitmix-style
  // generator renderPng uses, expressed in HUGEINT mod-2⁶⁴ with the
  // 64×64 multiply split into 32-bit halves to stay inside INT128)
  // and aggregates the same integer tile sums. A hash match therefore
  // proves PNG parse + raster layout + channel order end-to-end —
  // strictly stronger than m06/m07's header/dimension checks.
  private val m13 = GraftQuery(
    "m13_image_tile_stats",
    (s, dir) => {
      Multimodal.tileStats(
          Multimodal.synthesizeImages(
            Tables.spread(t(s, dir, "documents")), "doc_id"), patch = 16)
        .orderBy("media_id", "tile_y", "tile_x")
    },
    // splitmix constants: 0x9E3779B97F4A7C15 = 11400714819323198485,
    // 0xBF58476D1CE4E5B9 = 3210233709·2³² + 484763065
    Some("""WITH dims AS (SELECT doc_id AS media_id,
                 16 + doc_id % 64 AS w, 16 + (doc_id * 7) % 48 AS h
               FROM documents),
             xs AS (SELECT media_id, w, h, unnest(range(w)) AS x FROM dims),
             xy AS (SELECT media_id, w, h, x, unnest(range(h)) AS y FROM xs),
             p0 AS (SELECT media_id, x, y,
                 ((media_id::HUGEINT * 11400714819323198485) +
                  (y::HUGEINT * 1048576) + x::HUGEINT)
                 % 18446744073709551616 AS u
               FROM xy),
             p1 AS (SELECT media_id, x, y,
                 xor(u, u // 536870912) % 18446744073709551616 AS u FROM p0),
             p2 AS (SELECT media_id, x, y,
                 ((u * 484763065) % 18446744073709551616 +
                  (((u % 4294967296) * 3210233709) % 4294967296) * 4294967296)
                 % 18446744073709551616 AS u
               FROM p1),
             p3 AS (SELECT media_id, x, y,
                 (xor(u, u // 4294967296) % 16777216) // 65536 AS red FROM p2),
             tiles AS (SELECT p3.media_id,
                 CAST(x // 16 AS INT) AS tile_x, CAST(y // 16 AS INT) AS tile_y,
                 red, d.w, d.h
               FROM p3 JOIN dims d ON p3.media_id = d.media_id)
             SELECT media_id, tile_x, tile_y,
               CAST(least(16, w - tile_x * 16) AS INT) AS tw,
               CAST(least(16, h - tile_y * 16) AS INT) AS th,
               CAST(count(*) AS BIGINT) AS n_px,
               CAST(sum(red) AS BIGINT) AS red_sum
             FROM tiles GROUP BY media_id, tile_x, tile_y, w, h
             ORDER BY media_id, tile_y, tile_x"""))

  // Audio frame energy verified TO THE SAMPLE — m13's oracle pattern
  // on the PCM stream: the SQL side regenerates every 16-bit sample
  // arithmetically and aggregates the same integer frame energies, so
  // a hash match proves RIFF parse + little-endian byte order + sign
  // handling through the real javax.sound decode.
  private val m14 = GraftQuery(
    "m14_audio_frame_energy",
    (s, dir) => {
      Multimodal.frameEnergy(
          Multimodal.synthesizeAudio(
            Tables.spread(t(s, dir, "documents")), "doc_id"), frameSize = 160)
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH dims AS (SELECT doc_id AS media_id,
                 400 + (doc_id * 13) % 800 AS nf
               FROM documents),
             smp AS (SELECT media_id, unnest(range(nf)) AS i FROM dims),
             p0 AS (SELECT media_id, i,
                 ((media_id::HUGEINT * 11400714819323198485) + i::HUGEINT)
                 % 18446744073709551616 AS u
               FROM smp),
             p1 AS (SELECT media_id, i,
                 xor(u, u // 536870912) % 18446744073709551616 AS u FROM p0),
             p2 AS (SELECT media_id, i,
                 ((u * 484763065) % 18446744073709551616 +
                  (((u % 4294967296) * 3210233709) % 4294967296) * 4294967296)
                 % 18446744073709551616 AS u
               FROM p1),
             v AS (SELECT media_id, i,
                 CAST((xor(u, u // 4294967296) % 65536) - 32768 AS INT) AS s
               FROM p2),
             fr AS (SELECT media_id, CAST(i // 160 AS INT) AS frame_idx,
                 abs(s) AS a FROM v)
             SELECT media_id, frame_idx,
               CAST(count(*) AS INT) AS n_samples,
               CAST(sum(a) AS BIGINT) AS abs_sum,
               CAST(max(a) AS INT) AS abs_max
             FROM fr GROUP BY media_id, frame_idx
             ORDER BY media_id, frame_idx"""))

  // Uniform frame-sampling schedule computed FROM the real MP4 decode:
  // k=8 sample points per video at floor(i·duration/k) movie units,
  // converted to integer milliseconds via the decoded timescale. Every
  // output value is integer arithmetic over m09's verified container
  // fields, so the oracle derives the same schedule from the id
  // formulas — a wrong timescale/duration parse breaks the hash. This
  // is the seek-table a frame-extraction pass hands to a real decoder.
  private val m15 = GraftQuery(
    "m15_video_sample_schedule",
    (s, dir) => {
      Multimodal.decodeVideoMeta(
          Multimodal.synthesizeVideo(
            Tables.spread(t(s, dir, "documents")), "doc_id"))
        .select(col("media_id"), col("timescale"), col("duration_units"),
          explode(sequence(lit(0), lit(7))).as("sample_idx"))
        .select(col("media_id"), col("sample_idx"),
          expr("CAST(sample_idx * duration_units DIV 8 AS BIGINT)")
            .as("sample_unit"),
          expr("CAST((sample_idx * duration_units DIV 8) * 1000 DIV timescale AS BIGINT)")
            .as("sample_ms"))
        .orderBy("media_id", "sample_idx")
    },
    Some("""WITH dims AS (SELECT doc_id AS media_id,
                 600 * (1 + doc_id % 4) AS ts,
                 240 + (doc_id * 17) % 2400 AS dur
               FROM documents),
             i AS (SELECT media_id, ts, dur,
                 CAST(gs.i AS INT) AS sample_idx
               FROM dims, generate_series(0, 7) AS gs(i))
             SELECT media_id, sample_idx,
               CAST(sample_idx * dur // 8 AS BIGINT) AS sample_unit,
               CAST((sample_idx * dur // 8) * 1000 // ts AS BIGINT) AS sample_ms
             FROM i ORDER BY media_id, sample_idx"""))

  // Audio QC verified TO THE SAMPLE: real javax.sound WAV decode →
  // one-pass integer clipping count (|s| ≥ 32000), signed DC sum, and
  // peak — the screen a speech-corpus ingest runs before paying for
  // transcription. The oracle regenerates every PCM sample
  // arithmetically (m14's HUGEINT splitmix) and must match the sums
  // bit-for-bit, proving RIFF parse + endianness + sign handling.
  private val m16 = GraftQuery(
    "m16_audio_qc_stats",
    (s, dir) => {
      Multimodal.audioQcStats(
          Multimodal.synthesizeAudio(
            Tables.spread(t(s, dir, "documents")), "doc_id"),
          clipThreshold = 32000)
        .orderBy("media_id")
    },
    Some("""WITH dims AS (SELECT doc_id AS media_id,
                 400 + (doc_id * 13) % 800 AS nf
               FROM documents),
             smp AS (SELECT media_id, unnest(range(nf)) AS i FROM dims),
             p0 AS (SELECT media_id, i,
                 ((media_id::HUGEINT * 11400714819323198485) + i::HUGEINT)
                 % 18446744073709551616 AS u
               FROM smp),
             p1 AS (SELECT media_id, i,
                 xor(u, u // 536870912) % 18446744073709551616 AS u FROM p0),
             p2 AS (SELECT media_id, i,
                 ((u * 484763065) % 18446744073709551616 +
                  (((u % 4294967296) * 3210233709) % 4294967296) * 4294967296)
                 % 18446744073709551616 AS u
               FROM p1),
             v AS (SELECT media_id, i,
                 CAST((xor(u, u // 4294967296) % 65536) - 32768 AS INT) AS s
               FROM p2)
             SELECT media_id, CAST(count(*) AS INT) AS n_samples,
               CAST(sum(CASE WHEN abs(s) >= 32000 THEN 1 ELSE 0 END) AS INT)
                 AS n_clipped,
               CAST(sum(s) AS BIGINT) AS dc_sum,
               CAST(max(abs(s)) AS INT) AS peak
             FROM v GROUP BY media_id ORDER BY media_id"""))

  // Letterbox detection verified TO THE PIXEL: synthesized 64×64 PNGs
  // carry id%17 uniform zero rows top and bottom (aspect padding);
  // borderStats decodes the real raster and counts leading/trailing
  // uniform rows/columns against pixel (0,0). The oracle rebuilds the
  // full pixel grid from id arithmetic + md5 and recomputes the SAME
  // generic counts — a wrong decode, row order, or off-by-one crop
  // breaks the hash.
  private val m17 = GraftQuery(
    "m17_image_border_detect",
    (s, dir) => {
      Multimodal.borderStats(
          Multimodal.synthesizeLetterboxImages(
            Tables.spread(t(s, dir, "documents")), "doc_id"))
        .orderBy("media_id")
    },
    Some("""WITH ids AS (SELECT doc_id AS media_id,
                 CAST(doc_id % 17 AS INT) AS t FROM documents),
             px AS (SELECT media_id, t, x.x AS x, y.y AS y,
                 CASE WHEN y.y < t OR y.y >= 64 - t THEN 0
                   ELSE CAST(concat('0x', substr(md5(
                     media_id::VARCHAR || '_' || (x.x // 8)::VARCHAR ||
                     '_' || (y.y // 8)::VARCHAR), 1, 2)) AS INT)
                 END AS v
               FROM ids,
                 (SELECT CAST(unnest(range(64)) AS INT) AS x) x,
                 (SELECT CAST(unnest(range(64)) AS INT) AS y) y),
             bv AS (SELECT media_id, v AS bval FROM px WHERE x = 0 AND y = 0),
             bad AS (SELECT px.media_id, x, y
               FROM px JOIN bv USING (media_id) WHERE v != bval),
             byy AS (SELECT media_id, min(y) AS miny, max(y) AS maxy
               FROM bad GROUP BY media_id),
             byx AS (SELECT media_id, min(x) AS minx, max(x) AS maxx
               FROM bad GROUP BY media_id),
             agg AS (SELECT bv.media_id, bv.bval,
                 coalesce(byy.miny, 64) AS top,
                 least(CASE WHEN byy.maxy IS NULL THEN 64
                   ELSE 63 - byy.maxy END,
                   64 - coalesce(byy.miny, 64)) AS bottom,
                 coalesce(byx.minx, 64) AS lft,
                 least(CASE WHEN byx.maxx IS NULL THEN 64
                   ELSE 63 - byx.maxx END,
                   64 - coalesce(byx.minx, 64)) AS rgt
               FROM bv
               LEFT JOIN byy USING (media_id)
               LEFT JOIN byx USING (media_id))
             SELECT media_id, CAST(bval AS INT) AS border_val,
               CAST(top AS INT) AS top, CAST(bottom AS INT) AS bottom,
               CAST(lft AS INT) AS "left", CAST(rgt AS INT) AS "right",
               CAST(64 - top - bottom AS INT) AS content_h
             FROM agg ORDER BY media_id"""))

  // Perceptual DCT hash (pHash) verified bit-for-bit: real PNG decode
  // → 8×8 block-mean grid → 2-D DCT-II over a ROUNDED-LITERAL cosine
  // basis (the same 64 decimals are interpolated into this oracle, so
  // every product/sum is exact decimal arithmetic in both engines — no
  // float/trig divergence possible) → median threshold over the 63
  // non-DC coefficients. The structure-sensitive upgrade of m11's
  // aHash, same two-word layout, searchable by hammingTopK/
  // imageNearDupPairs.
  private val m18 = GraftQuery(
    "m18_image_phash",
    (s, dir) => {
      Multimodal.imagePHash64(
          Multimodal.synthesizeBlockImages(
            Tables.spread(t(s, dir, "documents")), "doc_id"))
        .orderBy("media_id")
    },
    Some {
      val basisRows = (for (u <- 0 until 8; x <- 0 until 8) yield
        s"($u, $x, ${Multimodal.dctBasis6(u)(x).toPlainString})")
        .mkString(", ")
      s"""WITH b AS (SELECT * FROM (VALUES $basisRows) t(u, x, bb)),
          px AS (SELECT doc_id AS media_id, gx.x AS x, gy.y AS y,
              CAST(CAST(concat('0x', substr(md5(doc_id::VARCHAR || '_' ||
                gx.x::VARCHAR || '_' || gy.y::VARCHAR), 1, 2)) AS INT)
                AS DECIMAL(9,6)) AS v
            FROM documents,
              (SELECT CAST(unnest(range(8)) AS INT) AS x) gx,
              (SELECT CAST(unnest(range(8)) AS INT) AS y) gy),
          coef AS (SELECT media_id, bu.u AS u, bv.u AS v,
              sum(px.v * CAST(bu.bb AS DECIMAL(8,6))
                * CAST(bv.bb AS DECIMAL(8,6))) AS c
            FROM px
            JOIN b bu ON bu.x = px.x
            JOIN b bv ON bv.x = px.y
            GROUP BY media_id, bu.u, bv.u),
          ranked AS (SELECT media_id, u, v, c, row_number() OVER
              (PARTITION BY media_id ORDER BY c, u, v) AS rn
            FROM coef WHERE NOT (u = 0 AND v = 0)),
          med AS (SELECT media_id, c AS m FROM ranked WHERE rn = 32),
          bits AS (SELECT coef.media_id, u * 8 + v AS idx,
              CASE WHEN NOT (u = 0 AND v = 0) AND c > m
                THEN 1 ELSE 0 END AS bit
            FROM coef JOIN med USING (media_id))
          SELECT media_id,
            CAST(sum(CASE WHEN bit = 1 AND idx < 32
              THEN (1::BIGINT << idx) ELSE 0 END) AS BIGINT) AS w0,
            CAST(sum(CASE WHEN bit = 1 AND idx >= 32
              THEN (1::BIGINT << (idx - 32)) ELSE 0 END) AS BIGINT) AS w1,
            CAST(sum(bit) AS INT) AS n_set
          FROM bits GROUP BY media_id ORDER BY media_id"""
    })

  // The COMPLETE image-dedup pipeline in one declarative plan —
  // fingerprint (m11 aHash over real decode) → banded-Hamming
  // candidate pairs (m12, never all-pairs) → connected components
  // (near-dup similarity is not transitive) → full-corpus spine with
  // a canonical representative (min id = the original; perturbed
  // re-uploads carry +10⁷ ids) and an is_dup drop flag. Every stage
  // reuses an oracle-checked operator; the oracle replays fingerprint
  // → all-pairs ≤3 edges → recursive label propagation → spine.
  private val m19 = GraftQuery(
    "m19_image_dedup_pipeline",
    (s, dir) => {
      val base = Tables.spread(t(s, dir, "documents"))
      val orig = Multimodal.synthesizeBlockImages(base, "doc_id")
      val mod = Multimodal.synthesizePerturbedBlockImages(
        base.filter(col("doc_id") < 50), "doc_id",
        idOffset = 10000000L, block0Value = 255)
      val hashes = Multimodal.imageAHash64(orig.unionByName(mod))
      val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 3)
      val comp = graft.operators.Dedup.connectedComponents(
        pairs, "id_a", "id_b")
      hashes.select(col("media_id"))
        .join(comp, hashes("media_id") === comp("doc_id"), "left")
        .select(col("media_id"),
          coalesce(col("component_id"), col("media_id")).as("rep_id"),
          (col("component_id").isNotNull &&
            col("media_id") =!= col("component_id")).as("is_dup"))
        .orderBy("media_id")
    },
    Some("""WITH RECURSIVE ids AS (
              SELECT doc_id AS media_id, doc_id AS pat, FALSE AS mod
              FROM documents
              UNION ALL
              SELECT doc_id + 10000000, doc_id, TRUE FROM documents
              WHERE doc_id < 50),
            b AS (SELECT media_id, j,
                CASE WHEN mod AND j = 0 THEN 255 ELSE
                  CAST(concat('0x', substr(md5(CAST(pat AS VARCHAR) || '_' ||
                    CAST(j % 8 AS VARCHAR) || '_' || CAST(j // 8 AS VARCHAR)),
                    1, 2)) AS INT) END AS v
              FROM ids, (SELECT CAST(unnest(range(64)) AS INT) AS j)),
            tot AS (SELECT media_id, sum(v) AS total FROM b GROUP BY media_id),
            bits AS (SELECT media_id, j,
                CASE WHEN v * 64 > total THEN 1 ELSE 0 END AS bit
              FROM b JOIN tot USING (media_id)),
            w AS (SELECT media_id,
                CAST(sum(CASE WHEN j < 32 THEN bit * (1::BIGINT << j)
                  ELSE 0 END) AS BIGINT) AS w0,
                CAST(sum(CASE WHEN j >= 32 THEN bit * (1::BIGINT << (j - 32))
                  ELSE 0 END) AS BIGINT) AS w1
              FROM bits GROUP BY media_id),
            pairs AS (SELECT a.media_id AS u, c.media_id AS v
              FROM w a JOIN w c ON a.media_id < c.media_id
              WHERE bit_count(xor(a.w0, c.w0)) +
                bit_count(xor(a.w1, c.w1)) <= 3),
            edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
            cc AS (
              SELECT u AS node, u AS label FROM edges
              UNION
              SELECT e.v AS node, c.label FROM cc c JOIN edges e ON c.node = e.u
            ),
            comp AS (SELECT node, min(label) AS component_id
              FROM cc GROUP BY node)
            SELECT w.media_id,
              CAST(coalesce(comp.component_id, w.media_id) AS BIGINT) AS rep_id,
              comp.component_id IS NOT NULL AND
                w.media_id != comp.component_id AS is_dup
            FROM w LEFT JOIN comp ON w.media_id = comp.node
            ORDER BY w.media_id"""))

  // Goertzel single-bin spectral energy per 160-sample frame over the
  // REAL WAV decode, at the fs/6 bin: coef = 2cos(π/3) = 1.0
  // EXACTLY, so the recurrence over integer PCM samples stays
  // integer-valued in doubles (|s| ≤ 160·32768 and power ≤ ~8e13,
  // both far under 2⁵³) and the gate emits EXACT BIGINT power — no
  // round() anywhere. That is the m14 integer-proof rule applied to
  // a recursive filter: a rounded-double variant (any other bin)
  // hits genuine engine round() divergence at half boundaries —
  // measured at sf0.1, Spark's exact-decimal HALF_UP vs DuckDB's
  // scaled rounding disagreed on one frame in 27k. The oracle
  // regenerates the PCM arithmetically and replays the fold
  // sample-by-sample (2-element LIST state; see frameGoertzel's
  // Scaladoc for why not a struct). A hash match proves decode +
  // frame split + the exact operation order of the filter.
  private val m20 = GraftQuery(
    "m20_audio_goertzel_power",
    (s, dir) => {
      Multimodal.frameGoertzel(
          Multimodal.synthesizeAudio(
            Tables.spread(t(s, dir, "documents")), "doc_id"),
          frameSize = 160, coef = 1.0)
        .select(col("media_id"), col("frame_idx"), col("n_samples"),
          // exact integer in a double → BIGINT cast is lossless
          col("power_raw").cast("bigint").as("power"))
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH dims AS (SELECT doc_id AS media_id,
                 400 + (doc_id * 13) % 800 AS nf
               FROM documents),
             smp AS (SELECT media_id, unnest(range(nf)) AS i FROM dims),
             p0 AS (SELECT media_id, i,
                 ((media_id::HUGEINT * 11400714819323198485) + i::HUGEINT)
                 % 18446744073709551616 AS u
               FROM smp),
             p1 AS (SELECT media_id, i,
                 xor(u, u // 536870912) % 18446744073709551616 AS u FROM p0),
             p2 AS (SELECT media_id, i,
                 ((u * 484763065) % 18446744073709551616 +
                  (((u % 4294967296) * 3210233709) % 4294967296) * 4294967296)
                 % 18446744073709551616 AS u
               FROM p1),
             v AS (SELECT media_id, i,
                 CAST((xor(u, u // 4294967296) % 65536) - 32768 AS INT) AS s
               FROM p2),
             fr AS (SELECT media_id, CAST(i // 160 AS INT) AS frame_idx, i,
                 CAST(s AS DOUBLE) AS x FROM v),
             g AS (SELECT media_id, frame_idx,
                 CAST(count(*) AS INT) AS n_samples,
                 list_reduce(
                   list_prepend([CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)],
                     list([x, CAST(0 AS DOUBLE)] ORDER BY i)),
                   (acc, e) -> [e[1] + acc[1] - acc[2], acc[1]]) AS st
               FROM fr GROUP BY media_id, frame_idx)
             SELECT media_id, frame_idx, n_samples,
               CAST(st[1] * st[1] + st[2] * st[2]
                 - st[1] * st[2] AS BIGINT) AS power
             FROM g ORDER BY media_id, frame_idx"""))

  // Banded-Hamming near-duplicate AUDIO pairs over energy-contour
  // fingerprints — m12's image-dedup shape transplanted to the audio
  // domain (the blocking operator is fingerprint-agnostic: any
  // (media_id, w0, w1) layout feeds it). Planted byte-identical
  // clips under id+10000000 guarantee Hamming-0 pairs; the oracle
  // regenerates every clip's PCM arithmetically (seeded by the BASE
  // id — planted copies share bytes, hence samples), rebuilds the
  // sign-of-delta fingerprint in exact integer SQL, and scans ALL
  // pairs — 4×16-bit banding recall ≤ 3 bits is pigeonhole-exact, so
  // banded Spark ≡ exhaustive SQL.
  private val m21 = GraftQuery(
    "m21_audio_neardup_pairs",
    (s, dir) => {
      val orig = Multimodal.synthesizeAudio(
        Tables.spread(t(s, dir, "documents")), "doc_id")
      val planted = orig.filter(col("media_id") < 50)
        .withColumn("media_id", col("media_id") + 10000000L)
      Multimodal.imageNearDupPairs(
          Multimodal.audioFingerprint64(orig.unionByName(planted),
            frameSize = 16),
          maxHamming = 3)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH ids AS (
              SELECT doc_id AS media_id, doc_id AS pat FROM documents
              UNION ALL
              SELECT doc_id + 10000000, doc_id FROM documents
              WHERE doc_id < 50),
            dims AS (SELECT media_id, pat,
                400 + (pat * 13) % 800 AS nf FROM ids),
            smp AS (SELECT media_id, pat, unnest(range(nf)) AS i FROM dims),
            p0 AS (SELECT media_id, i,
                ((pat::HUGEINT * 11400714819323198485) + i::HUGEINT)
                % 18446744073709551616 AS u
              FROM smp),
            p1 AS (SELECT media_id, i,
                xor(u, u // 536870912) % 18446744073709551616 AS u FROM p0),
            p2 AS (SELECT media_id, i,
                ((u * 484763065) % 18446744073709551616 +
                 (((u % 4294967296) * 3210233709) % 4294967296) * 4294967296)
                % 18446744073709551616 AS u
              FROM p1),
            v AS (SELECT media_id, i,
                CAST((xor(u, u // 4294967296) % 65536) - 32768 AS INT) AS s
              FROM p2),
            e AS (SELECT media_id, CAST(i // 16 AS INT) AS f,
                CAST(sum(abs(s)) AS BIGINT) AS en
              FROM v GROUP BY 1, 2),
            d AS (SELECT media_id, f, en,
                lead(en) OVER (PARTITION BY media_id ORDER BY f) AS nen
              FROM e),
            bits AS (SELECT media_id, f AS j,
                CASE WHEN nen > en THEN 1 ELSE 0 END AS bit
              FROM d WHERE f < 63 AND nen IS NOT NULL),
            w AS (SELECT media_id,
                CAST(sum(CASE WHEN j < 32 THEN bit * (1::BIGINT << j)
                  ELSE 0 END) AS BIGINT) AS w0,
                CAST(sum(CASE WHEN j >= 32 THEN bit * (1::BIGINT << (j - 32))
                  ELSE 0 END) AS BIGINT) AS w1
              FROM bits GROUP BY media_id)
            SELECT a.media_id AS id_a, c.media_id AS id_b,
              CAST(bit_count(xor(a.w0, c.w0)) + bit_count(xor(a.w1, c.w1))
                AS INT) AS hamming
            FROM w a JOIN w c ON a.media_id < c.media_id
            WHERE bit_count(xor(a.w0, c.w0)) + bit_count(xor(a.w1, c.w1)) <= 3
            ORDER BY id_a, id_b"""))

  // REAL silence-trim end-to-end: id-padded WAVs (lead = id % 50,
  // trail = (id·7) % 60 silent frames around the m08 payload) go
  // through decode → edge-scan → re-encode, and the OUTPUT bytes are
  // re-decoded by the same header reader m08 uses. The oracle
  // recomputes the post-trim frame count (= payload length) from the
  // id alone — an untrimmed clip would carry lead+payload+trail
  // frames and hash-mismatch, so the match proves genuine payload
  // surgery. The trim pass itself is map-only; attaching the re-decoded
  // meta to the trim counts is a tiny id-keyed join (AQE broadcasts
  // it), gate-side composition only.
  private val m22 = GraftQuery(
    "m22_audio_silence_trim",
    (s, dir) => {
      val trimmed = Multimodal.trimSilence(
        Multimodal.synthesizeAudioPadded(
          Tables.spread(t(s, dir, "documents")), "doc_id"),
        threshold = 0)
      Multimodal.decodeAudioMeta(trimmed)
        .join(trimmed.select(col("media_id"),
          col("lead_trimmed"), col("trail_trimmed")), Seq("media_id"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
              CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
              CAST(1 AS INT) AS channels,
              CAST(400 + (doc_id * 13) % 800 AS BIGINT) AS n_frames,
              CAST(doc_id % 50 AS INT) AS lead_trimmed,
              CAST((doc_id * 7) % 60 AS INT) AS trail_trimmed
            FROM documents ORDER BY media_id"""))

  // Video near-dup via shared keyframe signatures: 50 re-encoded
  // copies (same REAL parsed MP4 container → same sample schedule;
  // one frame perturbed) must pair with their originals at 7/8 shared
  // signatures through the inverted-index join — never all-pairs.
  // Frame CONTENT is the declared stub (the container carries no
  // codec stream); the container parse, schedule arithmetic, and
  // signature-bucket join are real and replayed exactly by the
  // oracle.
  private val m23 = GraftQuery(
    "m23_video_keyframe_neardup",
    (s, dir) => {
      val base = Tables.spread(t(s, dir, "documents"))
      val orig = Multimodal.synthesizeVideo(base, "doc_id")
      val copies = Multimodal.synthesizeVideo(
          base.filter(col("doc_id") < 50), "doc_id")
        .withColumn("media_id", col("media_id") + lit(10000000L))
      val meta = Multimodal.decodeVideoMeta(orig.unionByName(copies))
      val frames = meta
        .select(col("media_id"), col("duration_units"),
          explode(sequence(lit(0), lit(7))).as("idx"))
        .withColumn("su", expr("CAST(idx * duration_units DIV 8 AS BIGINT)"))
        .withColumn("pat", when(col("media_id") >= 10000000L,
          col("media_id") - 10000000L).otherwise(col("media_id")))
        .withColumn("fv", when(
          col("media_id") >= 10000000L && col("idx") === 0, lit(255))
          .otherwise(expr("CAST(conv(substr(md5(concat(cast(pat AS string)," +
            " '_f_', cast(idx AS string))), 1, 2), 16, 10) AS INT)")))
        .select(col("media_id"), md5(concat_ws(":",
          col("duration_units"), col("su"), col("fv"))).as("frame_sig"))
      Multimodal.keyframeNearDupPairs(frames, minShared = 6)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH ids AS (SELECT doc_id AS media_id, doc_id AS pat,
                FALSE AS perturbed FROM documents
              UNION ALL
              SELECT doc_id + 10000000, doc_id, TRUE FROM documents
              WHERE doc_id < 50),
            dims AS (SELECT media_id, pat, perturbed,
                240 + (pat * 17) % 2400 AS dur FROM ids),
            fr AS (SELECT media_id, pat, perturbed, dur,
                CAST(gs.i AS INT) AS idx,
                CAST(CAST(gs.i AS INT) * dur // 8 AS BIGINT) AS su
              FROM dims, generate_series(0, 7) AS gs(i)),
            fv AS (SELECT media_id, dur, su,
                CASE WHEN perturbed AND idx = 0 THEN 255
                  ELSE CAST(concat('0x', substr(md5(CAST(pat AS VARCHAR) ||
                    '_f_' || CAST(idx AS VARCHAR)), 1, 2)) AS INT) END AS v
              FROM fr),
            sig AS (SELECT media_id,
                md5(CAST(dur AS VARCHAR) || ':' || CAST(su AS VARCHAR) ||
                  ':' || CAST(v AS VARCHAR)) AS fs FROM fv)
            SELECT a.media_id AS id_a, b.media_id AS id_b,
              count(*) AS n_shared
            FROM sig a JOIN sig b
              ON a.fs = b.fs AND a.media_id < b.media_id
            GROUP BY 1, 2 HAVING count(*) >= 6 ORDER BY id_a, id_b"""))

  // Shot-boundary detection on REAL decoded pixels: each "video" is 8
  // block-PNG frames, frames share their shot's md5 pattern and shots
  // cut at md5-derived positions — so consecutive same-shot frames
  // decode to identical pixels (aHash Hamming 0) and cuts jump ~32
  // bits. The detector (one fingerprint-width window per video) must
  // report exactly the planted cuts; the oracle regenerates shot
  // schedule, block values, threshold bits, and the lag/Hamming
  // comparison from md5 arithmetic alone — decode → fingerprint →
  // boundary proven end-to-end (m11's verification discipline moved
  // from single images to sequences).
  private val m27 = GraftQuery(
    "m27_shot_boundaries",
    (s, dir) => {
      val base = Tables.spread(t(s, dir, "documents"))
        .filter(col("doc_id") < 200)
      val frames = Multimodal.synthesizeShotFrames(base, "doc_id")
      val fp0 = Multimodal.imageAHash64(frames.select(
        (col("media_id") * 100 + col("frame_idx")).as("media_id"),
        col("content")))
      val fp = fp0.select(
        expr("media_id div 100").cast("long").as("media_id"),
        pmod(col("media_id"), lit(100)).cast("int").as("frame_idx"),
        col("w0"), col("w1"))
      Multimodal.shotBoundaries(fp, minHamming = 3)
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH ids AS (SELECT doc_id AS v FROM documents WHERE doc_id < 200),
            cuts AS (SELECT v, CAST(gs.i AS INT) AS idx,
                CASE WHEN gs.i = 0 THEN 0
                  WHEN CAST(concat('0x', substr(md5(CAST(v AS VARCHAR) ||
                    '_cut_' || CAST(gs.i AS VARCHAR)), 1, 2)) AS INT) % 4 = 0
                  THEN 1 ELSE 0 END AS is_cut
              FROM ids, generate_series(0, 7) AS gs(i)),
            shots AS (SELECT v, idx,
                CAST(sum(is_cut) OVER (PARTITION BY v ORDER BY idx)
                  AS BIGINT) AS shot FROM cuts),
            pats AS (SELECT v, idx, v * 100 + shot AS pat FROM shots),
            b AS (SELECT v, idx, j,
                CAST(concat('0x', substr(md5(CAST(pat AS VARCHAR) || '_' ||
                  CAST(j % 8 AS VARCHAR) || '_' || CAST(j // 8 AS VARCHAR)),
                  1, 2)) AS INT) AS bv
              FROM pats, (SELECT CAST(unnest(range(64)) AS INT) AS j)),
            tot AS (SELECT v, idx, sum(bv) AS total FROM b GROUP BY v, idx),
            bits AS (SELECT b.v, b.idx, j,
                CASE WHEN bv * 64 > total THEN 1 ELSE 0 END AS bit
              FROM b JOIN tot ON b.v = tot.v AND b.idx = tot.idx),
            wrd AS (SELECT v, idx,
                CAST(sum(CASE WHEN j < 32 THEN bit * (1::BIGINT << j)
                  ELSE 0 END) AS BIGINT) AS w0,
                CAST(sum(CASE WHEN j >= 32 THEN bit * (1::BIGINT << (j - 32))
                  ELSE 0 END) AS BIGINT) AS w1
              FROM bits GROUP BY v, idx),
            lagged AS (SELECT v, idx, w0, w1,
                lag(w0) OVER (PARTITION BY v ORDER BY idx) AS pw0,
                lag(w1) OVER (PARTITION BY v ORDER BY idx) AS pw1
              FROM wrd)
            SELECT v AS media_id, idx AS frame_idx,
              CAST(bit_count(xor(w0, pw0)) + bit_count(xor(w1, pw1))
                AS INT) AS hamming
            FROM lagged
            WHERE pw0 IS NOT NULL AND
              bit_count(xor(w0, pw0)) + bit_count(xor(w1, pw1)) > 3
            ORDER BY media_id, frame_idx"""))

  // Per-frame zero-crossing rate over REAL decoded PCM (the
  // voiced/unvoiced screen): polarity changes between consecutive
  // samples, exact integer tests end-to-end, so the oracle
  // regenerates the synthesized sample stream arithmetically (m14's
  // splitmix HUGEINT replay) and lead()-compares polarities — a hash
  // match proves WAV parse, sample order, and the pairing/frame
  // assignment.
  private val m28 = GraftQuery(
    "m28_audio_zero_crossings",
    (s, dir) => {
      Multimodal.zeroCrossings(
          Multimodal.synthesizeAudio(
            Tables.spread(t(s, dir, "documents")), "doc_id"), frameSize = 160)
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH dims AS (SELECT doc_id AS media_id,
                 400 + (doc_id * 13) % 800 AS nf
               FROM documents),
             smp AS (SELECT media_id, nf, unnest(range(nf)) AS i FROM dims),
             p0 AS (SELECT media_id, nf, i,
                 ((media_id::HUGEINT * 11400714819323198485) + i::HUGEINT)
                 % 18446744073709551616 AS u
               FROM smp),
             p1 AS (SELECT media_id, nf, i,
                 xor(u, u // 536870912) % 18446744073709551616 AS u FROM p0),
             p2 AS (SELECT media_id, nf, i,
                 ((u * 484763065) % 18446744073709551616 +
                  (((u % 4294967296) * 3210233709) % 4294967296) * 4294967296)
                 % 18446744073709551616 AS u
               FROM p1),
             v AS (SELECT media_id, nf, i,
                 CAST((xor(u, u // 4294967296) % 65536) - 32768 AS INT) AS s
               FROM p2),
             nx AS (SELECT media_id, nf, i, s,
                 lead(s) OVER (PARTITION BY media_id ORDER BY i) AS s2
               FROM v),
             pr AS (SELECT media_id, CAST(i // 160 AS INT) AS frame_idx,
                 CASE WHEN (s >= 0) <> (s2 >= 0) THEN 1 ELSE 0 END AS x
               FROM nx WHERE i < nf - 1)
             SELECT media_id, frame_idx,
               CAST(count(*) AS INT) AS n_pairs,
               CAST(sum(x) AS INT) AS n_crossings
             FROM pr GROUP BY media_id, frame_idx
             ORDER BY media_id, frame_idx"""))

  // PNG textual metadata: an id-derived `tEXt` chunk is SPLICED into
  // the real PNG bytes (length-prefixed chunk + CRC32, per spec) and
  // recovered by walking the container's chunk list with CRC
  // re-verification — the provenance/license metadata pass of an
  // image ingest. The oracle regenerates the embedded key/value from
  // the id and asserts crc_ok, proving splice → parse round-trips
  // through real bytes.
  private val m24 = GraftQuery(
    "m24_png_text_metadata",
    (s, dir) => {
      Multimodal.pngTextChunks(
          Multimodal.synthesizeImagesWithText(
            Tables.spread(t(s, dir, "documents")), "doc_id"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id, 'Comment' AS "key",
              'src=' || CAST(doc_id % 7 AS VARCHAR) || ';gen=' ||
                CAST(doc_id * 31 % 1000 AS VARCHAR) AS "value",
              TRUE AS crc_ok
            FROM documents ORDER BY media_id"""))

  // Peak normalization verified TO THE SAMPLE: real WAV decode →
  // exact integer rescale (sign·⌊|s|·32000/peak⌋) → JDK re-encode,
  // then audioQcStats re-decodes the OUTPUT bytes. The oracle
  // regenerates every PCM sample (m14's HUGEINT splitmix), applies
  // the same integer gain, and must match the signed sum / clip
  // count / new peak bit-for-bit — gain staging with zero
  // cross-engine rounding hazard.
  private val m25 = GraftQuery(
    "m25_audio_peak_normalize",
    (s, dir) => {
      // localCheckpoint: audioQcStats and the old_peak join are two
      // DAG branches — without it the decode→scan→re-encode pipeline
      // runs twice
      val norm = Multimodal.peakNormalize(
        Multimodal.synthesizeAudio(
          Tables.spread(t(s, dir, "documents")), "doc_id"),
        targetPeak = 32000).localCheckpoint()
      Multimodal.audioQcStats(norm, clipThreshold = 32000)
        .join(norm.select(col("media_id"), col("old_peak")), Seq("media_id"))
        .orderBy("media_id")
    },
    Some("""WITH dims AS (SELECT doc_id AS media_id,
                 400 + (doc_id * 13) % 800 AS nf
               FROM documents),
             smp AS (SELECT media_id, unnest(range(nf)) AS i FROM dims),
             p0 AS (SELECT media_id, i,
                 ((media_id::HUGEINT * 11400714819323198485) + i::HUGEINT)
                 % 18446744073709551616 AS u
               FROM smp),
             p1 AS (SELECT media_id, i,
                 xor(u, u // 536870912) % 18446744073709551616 AS u FROM p0),
             p2 AS (SELECT media_id, i,
                 ((u * 484763065) % 18446744073709551616 +
                  (((u % 4294967296) * 3210233709) % 4294967296) * 4294967296)
                 % 18446744073709551616 AS u
               FROM p1),
             v AS (SELECT media_id, i,
                 CAST((xor(u, u // 4294967296) % 65536) - 32768 AS INT) AS s
               FROM p2),
             pk AS (SELECT media_id, max(abs(s)) AS peak FROM v
               GROUP BY media_id),
             nv AS (SELECT v.media_id,
                 CASE WHEN peak = 0 THEN s
                   WHEN s < 0 THEN -CAST((CAST(abs(s) AS BIGINT) * 32000)
                     // peak AS INT)
                   ELSE CAST((CAST(abs(s) AS BIGINT) * 32000) // peak AS INT)
                 END AS n, peak
               FROM v JOIN pk USING (media_id))
             SELECT media_id, CAST(count(*) AS INT) AS n_samples,
               CAST(sum(CASE WHEN abs(n) >= 32000 THEN 1 ELSE 0 END) AS INT)
                 AS n_clipped,
               CAST(sum(n) AS BIGINT) AS dc_sum,
               CAST(max(abs(n)) AS INT) AS peak,
               CAST(max(pk.peak) AS INT) AS old_peak
             FROM nv JOIN pk USING (media_id)
             GROUP BY media_id ORDER BY media_id"""))

  // Histogram equalization verified TO THE BLOCK: real PNG decode →
  // exact-integer CDF transfer → JDK re-encode → SECOND decode reads
  // every 8×8 block of the OUTPUT. The oracle recomputes histogram →
  // CDF → mapping from the md5 block derivation alone (a window count
  // over block values IS the pixel CDF, since blocks are uniform) and
  // must match each equalized block value; the uniform flag proves
  // the codec round-trip leaked nothing across block edges.
  private val m26 = GraftQuery(
    "m26_image_equalize",
    (s, dir) => {
      Multimodal.grayBlockValues(
          Multimodal.equalizeGray(
            Multimodal.synthesizeBlockImages(
              Tables.spread(t(s, dir, "documents")), "doc_id")))
        .orderBy("media_id", "by", "bx")
    },
    Some("""WITH b AS (SELECT doc_id AS media_id, bx, by,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '_' ||
                  CAST(bx AS VARCHAR) || '_' || CAST(by AS VARCHAR)), 1, 2))
                  AS INT) AS v
              FROM documents,
                (SELECT CAST(unnest(range(8)) AS INT) AS bx),
                (SELECT CAST(unnest(range(8)) AS INT) AS by)),
            c AS (SELECT media_id, bx, by, v,
                64 * count(*) OVER (PARTITION BY media_id ORDER BY v
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cdf,
                64 * sum(CASE WHEN v = mn THEN 1 ELSE 0 END)
                  OVER (PARTITION BY media_id) AS cdfmin
              FROM (SELECT *, min(v) OVER (PARTITION BY media_id) AS mn
                FROM b)),
            eq AS (SELECT media_id, bx, by,
                CASE WHEN cdfmin = 4096 THEN 0
                  ELSE CAST((cdf - cdfmin) * 255 // (4096 - cdfmin) AS INT)
                END AS v
              FROM c)
            SELECT media_id, bx, by, v, TRUE AS uniform
            FROM eq ORDER BY media_id, by, bx"""))

  // Dominant quantized color verified TO THE PIXEL — m13's
  // regeneration oracle over ALL THREE channels: the SQL side rebuilds
  // every pixel's 24-bit RGB arithmetically, quantizes to the same
  // 3-bit/channel cube, and replays the argmax (count desc, bucket
  // asc). A hash match proves decode + channel order + quantization +
  // tie rule end-to-end. The op itself is the flat-card/banner
  // detector of image curation: frac → 1.0 means near-solid.
  private val m29 = GraftQuery(
    "m29_image_dominant_color",
    (s, dir) => {
      Multimodal.dominantColor(
          Multimodal.synthesizeImages(
            Tables.spread(t(s, dir, "documents")), "doc_id"))
        .orderBy("media_id")
    },
    Some("""WITH dims AS (SELECT doc_id AS media_id,
                 16 + doc_id % 64 AS w, 16 + (doc_id * 7) % 48 AS h
               FROM documents),
             xs AS (SELECT media_id, w, h, unnest(range(w)) AS x FROM dims),
             xy AS (SELECT media_id, w, h, x, unnest(range(h)) AS y FROM xs),
             p0 AS (SELECT media_id, x, y,
                 ((media_id::HUGEINT * 11400714819323198485) +
                  (y::HUGEINT * 1048576) + x::HUGEINT)
                 % 18446744073709551616 AS u
               FROM xy),
             p1 AS (SELECT media_id, x, y,
                 xor(u, u // 536870912) % 18446744073709551616 AS u FROM p0),
             p2 AS (SELECT media_id, x, y,
                 ((u * 484763065) % 18446744073709551616 +
                  (((u % 4294967296) * 3210233709) % 4294967296) * 4294967296)
                 % 18446744073709551616 AS u
               FROM p1),
             px AS (SELECT media_id,
                 xor(u, u // 4294967296) % 16777216 AS rgb FROM p2),
             bk AS (SELECT media_id,
                 CAST(((rgb // 65536) // 32) * 64 +
                   (((rgb // 256) % 256) // 32) * 8 +
                   ((rgb % 256) // 32) AS INT) AS bucket
               FROM px),
             cn AS (SELECT media_id, bucket,
                 CAST(count(*) AS BIGINT) AS n_px FROM bk
               GROUP BY media_id, bucket),
             top AS (SELECT media_id, bucket, n_px, row_number() OVER (
                 PARTITION BY media_id ORDER BY n_px DESC, bucket) AS rn
               FROM cn)
             SELECT t.media_id, t.bucket, t.n_px,
               CAST(d.w * d.h AS BIGINT) AS total_px,
               round(CAST(t.n_px AS DOUBLE) / (d.w * d.h), 6) AS frac
             FROM top t JOIN dims d USING (media_id)
             WHERE rn = 1 ORDER BY media_id"""))

  // Multimodal dedup verdict — the pair-level union a paired
  // (text, image) corpus needs: exact text dup ∪ perceptual image
  // near-dup, with modality attribution ('both'/'text'/'image').
  // A text-only dedup keeps re-hosted images with new captions; an
  // image-only dedup keeps re-rendered cards with identical copy —
  // the verdict is what LAION-style curation actually filters on.
  // Three planted cohorts make every branch non-vacuous: same text +
  // perturbed image (both), same text + unrelated image (text),
  // edited text + perturbed image (image). Shape: one md5-keyed text
  // self-join + m12's banded fingerprint join + a keyed full-outer
  // merge — each side its documented scale shape.
  private val m30 = GraftQuery(
    "m30_multimodal_dedup_verdict",
    (s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val aIds = base.filter(pmod(col("doc_id"), lit(10)) === 0)
      val bIds = base.filter(pmod(col("doc_id"), lit(10)) === 5)
      val cIds = base.filter(pmod(col("doc_id"), lit(10)) === 3)
      val texts = base
        .unionByName(aIds.select(
          (col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionByName(bIds.select(
          (col("doc_id") + 2000000L).as("doc_id"), col("text")))
        .unionByName(cIds.select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" zz"), col("doc_id").cast("string"))
            .as("text")))
      val images = Multimodal
        .synthesizeBlockImages(Tables.spread(base), "doc_id")
        .unionByName(Multimodal.synthesizePerturbedBlockImages(
          aIds, "doc_id", idOffset = 1000000L, block0Value = 255))
        .unionByName(Multimodal.synthesizeBlockImages(
          bIds.select((col("doc_id") + 2000000L).as("doc_id")), "doc_id"))
        .unionByName(Multimodal.synthesizePerturbedBlockImages(
          cIds, "doc_id", idOffset = 3000000L, block0Value = 255))
      val h = texts.select(col("doc_id"),
        md5(graft.functions.TextFunctions.normalizeText(col("text"))).as("h"))
      // hint("merge"): self-join exchange reuse (see
      // Dedup.jaccardPairsWithCounts for the full rationale)
      val tp = h.as("x").hint("merge").join(h.as("y"), Seq("h"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          lit(true).as("t"))
      val ip = Multimodal.imageNearDupPairs(
          Multimodal.imageAHash64(images), maxHamming = 3)
        .select(col("id_a"), col("id_b"), lit(true).as("i"))
      tp.join(ip, Seq("id_a", "id_b"), "full_outer")
        .select(col("id_a"), col("id_b"),
          when(col("t").isNotNull && col("i").isNotNull, "both")
            .when(col("t").isNotNull, "text").otherwise("image")
            .as("modality"))
        .orderBy("id_a", "id_b")
    },
    Some("""WITH ids AS (
              SELECT doc_id AS media_id, doc_id AS pat, FALSE AS mod
              FROM documents
              UNION ALL
              SELECT doc_id + 1000000, doc_id, TRUE FROM documents
              WHERE doc_id % 10 = 0
              UNION ALL
              SELECT doc_id + 2000000, doc_id + 2000000, FALSE FROM documents
              WHERE doc_id % 10 = 5
              UNION ALL
              SELECT doc_id + 3000000, doc_id, TRUE FROM documents
              WHERE doc_id % 10 = 3),
            b AS (SELECT media_id, j,
                CASE WHEN mod AND j = 0 THEN 255 ELSE
                  CAST(concat('0x', substr(md5(CAST(pat AS VARCHAR) || '_' ||
                    CAST(j % 8 AS VARCHAR) || '_' || CAST(j // 8 AS VARCHAR)),
                    1, 2)) AS INT) END AS v
              FROM ids, (SELECT CAST(unnest(range(64)) AS INT) AS j)),
            tot AS (SELECT media_id, sum(v) AS total FROM b GROUP BY media_id),
            bits AS (SELECT media_id, j,
                CASE WHEN v * 64 > total THEN 1 ELSE 0 END AS bit
              FROM b JOIN tot USING (media_id)),
            w AS (SELECT media_id,
                CAST(sum(CASE WHEN j < 32 THEN bit * (1::BIGINT << j)
                  ELSE 0 END) AS BIGINT) AS w0,
                CAST(sum(CASE WHEN j >= 32 THEN bit * (1::BIGINT << (j - 32))
                  ELSE 0 END) AS BIGINT) AS w1
              FROM bits GROUP BY media_id),
            ip AS (SELECT a.media_id AS id_a, c.media_id AS id_b
              FROM w a JOIN w c ON a.media_id < c.media_id
              WHERE bit_count(xor(a.w0, c.w0)) +
                bit_count(xor(a.w1, c.w1)) <= 3),
            tx AS (SELECT doc_id,
                md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
              FROM (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents
                WHERE doc_id % 10 = 0
                UNION ALL
                SELECT doc_id + 2000000, text FROM documents
                WHERE doc_id % 10 = 5
                UNION ALL
                SELECT doc_id + 3000000,
                  text || ' zz' || CAST(doc_id AS VARCHAR) FROM documents
                WHERE doc_id % 10 = 3)),
            tp AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b
              FROM tx x JOIN tx y ON x.h = y.h AND x.doc_id < y.doc_id)
            SELECT coalesce(tp.id_a, ip.id_a) AS id_a,
              coalesce(tp.id_b, ip.id_b) AS id_b,
              CASE WHEN tp.id_a IS NOT NULL AND ip.id_a IS NOT NULL
                THEN 'both'
                WHEN tp.id_a IS NOT NULL THEN 'text'
                ELSE 'image' END AS modality
            FROM tp FULL OUTER JOIN ip
              ON tp.id_a = ip.id_a AND tp.id_b = ip.id_b
            ORDER BY id_a, id_b"""))

  // Video feature cells gated CELL-BY-CELL: the m04 kernel's video
  // branch (container-derived features, round 7) replayed exactly in
  // DuckDB. The timing cells are mvhd arithmetic (m09's formulas cast
  // through REAL — the same float32 the kernel emits); the signature
  // cells replay the mdat essence bytes via the LCG's closed form
  // (p_j = A_j·seed + B_j mod 2⁶⁴, constants embedded below), then
  // fold the slot window through the rolling hash with list_reduce —
  // sign extension, xor, and the 64-bit multiply (32-bit split, the
  // m15 trick) all in HUGEINT. A hash match proves mdatRange found
  // the essence payload and every hash/sign step matches the JVM.
  private val m31 = {
    val M64 = BigInt(1) << 64
    val K1 = BigInt("9E3779B97F4A7C15", 16) // renderMp4 LCG multiplier
    val K2 = BigInt("C2B2AE3D27D4EB4F", 16) // rolling-hash multiplier
    // p_j = (A_j·seed + B_j) mod 2⁶⁴ for the j-th LCG state (j ≥ 1);
    // essence byte i is the top byte of p_{i+1}
    val (aList, bList) = {
      var a = BigInt(1); var b = BigInt(0)
      val as = Array.newBuilder[BigInt]; val bs = Array.newBuilder[BigInt]
      (1 to 32).foreach { _ =>
        a = (a * K1) % M64; b = (b * K1 + 1) % M64
        as += a; bs += b
      }
      (as.result().mkString("[", ",", "]"),
        bs.result().mkString("[", ",", "]"))
    }
    val k2hi = K2 >> 32
    val k2lo = K2 & BigInt("FFFFFFFF", 16)
    GraftQuery(
      "m31_video_feature_cells",
      (s, dir) => {
        Multimodal.extractFeatures(
            Multimodal.synthesizeVideo(
              Tables.spread(t(s, dir, "documents")), "doc_id"), dim = 8)
          .select(col("media_id"), posexplode(col("embedding")))
          .select(col("media_id"), col("pos").cast("int").as("cell"),
            col("col").cast("double").as("value"))
          .orderBy("media_id", "cell")
      },
      Some(s"""WITH ids AS (SELECT doc_id AS media_id,
                   600 * (1 + doc_id % 4) AS ts,
                   240 + (doc_id * 17) % 2400 AS dur,
                   1 + doc_id % 3 AS ntr
                 FROM documents),
             wb AS (SELECT media_id, CAST(gs.i AS INT) AS slot,
                    CAST(gj.j AS INT) AS j
                FROM ids, generate_series(0, 4) gs(i),
                     generate_series(0, 31) gj(j)
                WHERE gj.j >= gs.i * 32 // 5 AND gj.j < (gs.i + 1) * 32 // 5),
             byt AS (SELECT media_id, slot, j,
                    ((list_extract($aList, j + 1) * media_id +
                      list_extract($bList, j + 1)) % 18446744073709551616)
                      // 72057594037927936 AS u
                    FROM wb),
             sx AS (SELECT media_id, slot, j,
                    CASE WHEN u >= 128
                      THEN 18446744073709551616 - 256 + u ELSE u END AS su
                    FROM byt),
             lst AS (SELECT media_id, slot, list(su ORDER BY j) AS us
                     FROM sx GROUP BY media_id, slot),
             hsh AS (SELECT media_id, slot,
                    list_reduce(
                      list_prepend(xor(CAST(11400714819323198485 AS HUGEINT),
                        CAST(slot AS HUGEINT)), us),
                      (h, u) -> (xor(h, u) * $k2lo +
                                 ((xor(h, u) * $k2hi) % 4294967296) * 4294967296
                                ) % 18446744073709551616) AS hu
                    FROM lst),
             sig AS (SELECT media_id, slot + 3 AS cell,
                    CAST(CAST(((CASE WHEN hu >= 9223372036854775808
                                 THEN hu - 18446744073709551616 ELSE hu END)
                               % 1000003 + 1000003) % 1000003 AS REAL)
                         / CAST(1000003 AS REAL) AS DOUBLE) AS value
                    FROM hsh),
             tc AS (SELECT media_id, 0 AS cell,
                      CAST(CAST(dur * 1000.0 / ts AS REAL) AS DOUBLE) AS value
                    FROM ids
                    UNION ALL SELECT media_id, 1,
                      CAST(CAST(ts AS REAL) AS DOUBLE) FROM ids
                    UNION ALL SELECT media_id, 2,
                      CAST(CAST(ntr AS REAL) AS DOUBLE) FROM ids)
             SELECT media_id, CAST(cell AS INT) AS cell, value
             FROM (SELECT * FROM tc UNION ALL SELECT * FROM sig)
             ORDER BY media_id, cell"""))
  }

  // STREAMING Hamming admission (HammingDedup.streamingHammingDupFilter)
  // gated as a deterministic batch replay — t108/v40's discipline for
  // PERCEPTUAL FINGERPRINTS (the (w0, w1) two-word layout every m-family
  // signature emits: aHash/pHash/audio/keyframe). Unlike the MinHash and
  // hyperplane daemons, recall here is EXACT by pigeonhole (16 chunks of
  // 8 bits; a pair within Hamming ≤ 15 must match in some chunk), and
  // the whole operator — fingerprints, banding, verify — is integer
  // arithmetic, so the oracle replays it bit-for-bit. Fingerprints are
  // two 60-bit words built from md5 halves (30-bit pieces, so no BIGINT
  // overflow in either engine); batch1 re-uploads batch0's media with 2
  // flipped bits (cross-batch dup), batch2 re-uploads batch1's class
  // with 1 flip (cross-batch, against FOLDED state — compaction runs
  // between bids 1 and 2), adds 3-flip copies of its own class
  // (within-batch, exactly at maxHamming = 3) and 28-flip copies of
  // batch0 (the never-match cohort, admitted). The oracle replays
  // probe-then-commit per bid in recursive CTEs over
  // bit_count(xor(...)) distances.
  private val m32 = {
    def w(tag: String, piece: Int) =
      s"(CAST(concat('0x', substr(md5(doc_id::VARCHAR || '_$tag$piece'), 1, 8)) AS BIGINT) % 1073741824)"
    def word(tag: String) = s"(${w(tag, 0)} * 1073741824 + ${w(tag, 1)})"
    val ham = "(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)))"
    def hamTo(h: String) =
      s"(bit_count(xor(w.w0, $h.w0)) + bit_count(xor(w.w1, $h.w1)))"
    GraftQuery(
      "m32_streaming_hamming_dedup_replay",
      (s, dir) => {
        def h30(c: org.apache.spark.sql.Column, tag: String) =
          conv(substring(md5(concat(c.cast("string"), lit("_" + tag))), 1, 8),
            16, 10).cast("long") % lit(1073741824L)
        // project to doc_id BEFORE spread: the synthetic fingerprints
        // derive from ids alone, and the explicit projection keeps the
        // text column out of the parquet scan (measured 432 MB → 0.4 MB
        // input at sf0.1)
        // checkpoint the synthesized fingerprints ONCE: the replay's
        // many consumers (banded self-joins, CC rounds, probes,
        // commits) each re-ran the scan+md5 lineage otherwise —
        // measured 432 MB of repeated input over a 0.6 MB table
        val fp = Tables.spread(t(s, dir, "documents").select("doc_id"))
          .select(
            col("doc_id"),
            (h30(col("doc_id"), "p0") * lit(1073741824L) +
              h30(col("doc_id"), "p1")).as("w0"),
            (h30(col("doc_id"), "q0") * lit(1073741824L) +
              h30(col("doc_id"), "q1")).as("w1"))
          .localCheckpoint(true)
        def cls(k: Int) = fp.filter(pmod(col("doc_id"), lit(9)) === k)
        def flipped(df: org.apache.spark.sql.DataFrame, off: Long, mask: Long) =
          df.select((col("doc_id") + off).as("doc_id"),
            col("w0").bitwiseXOR(lit(mask)).as("w0"), col("w1"))
        val b0 = cls(0)
        val b1 = cls(1).unionByName(flipped(cls(0), 1000000L, 5L))
        val b2 = cls(2)
          .unionByName(flipped(cls(1), 2000000L, 1L))
          .unionByName(flipped(cls(2), 3000000L, 7L))
          .unionByName(flipped(cls(0), 4000000L, 0xFFFFFFFL))
        val stateDir = java.nio.file.Files
          .createTempDirectory("graft_m32_state")
        val perBid = Seq(b0, b1, b2).zipWithIndex.map { case (b, bid) =>
          val surv = HammingDedup.hammingDupFilterBatch(b, "doc_id",
            "w0", "w1", stateDir.toString, bid.toLong, maxHamming = 3)
          HammingDedup.hammingDupCommitBatch(surv, "doc_id", "w0", "w1",
            stateDir.toString, bid.toLong)
          // checkpoint BEFORE the fold deletes the pre-fold state files
          val ids = surv.select(lit(bid.toLong).as("bid"), col("doc_id"))
            .localCheckpoint(true)
          if (bid == 1) HammingDedup.compactHammingDupState(s,
            stateDir.toString, upToBid = 1L, minReplayableBid = 2L)
          ids
        }
        java.nio.file.Files.walk(stateDir)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        perBid.reduce(_ unionByName _).orderBy("bid", "doc_id")
      },
      Some(s"""WITH RECURSIVE
               f AS (SELECT doc_id, ${word("p")} AS w0, ${word("q")} AS w1
                 FROM documents),
               b0 AS (SELECT doc_id, w0, w1 FROM f WHERE doc_id % 9 = 0),
               b1 AS (SELECT doc_id, w0, w1 FROM f WHERE doc_id % 9 = 1
                 UNION ALL
                 SELECT doc_id + 1000000, xor(w0, 5), w1 FROM f
                 WHERE doc_id % 9 = 0),
               b2 AS (SELECT doc_id, w0, w1 FROM f WHERE doc_id % 9 = 2
                 UNION ALL
                 SELECT doc_id + 2000000, xor(w0, 1), w1 FROM f
                 WHERE doc_id % 9 = 1
                 UNION ALL
                 SELECT doc_id + 3000000, xor(w0, 7), w1 FROM f
                 WHERE doc_id % 9 = 2
                 UNION ALL
                 SELECT doc_id + 4000000, xor(w0, 268435455), w1 FROM f
                 WHERE doc_id % 9 = 0),
               p0 AS (SELECT a.doc_id AS u, b.doc_id AS v
                 FROM b0 a JOIN b0 b ON a.doc_id < b.doc_id
                 WHERE $ham <= 3),
               e0 AS (SELECT u, v FROM p0 UNION ALL SELECT v, u FROM p0),
               cc0 AS (SELECT u AS node, u AS label FROM e0
                 UNION
                 SELECT g.v AS node, c.label FROM cc0 c JOIN e0 g
                   ON c.node = g.u),
               s0 AS (SELECT doc_id, w0, w1 FROM b0 WHERE doc_id NOT IN
                 (SELECT node FROM (SELECT node, min(label) AS m FROM cc0
                    GROUP BY node) WHERE node <> m)),
               p1 AS (SELECT a.doc_id AS u, b.doc_id AS v
                 FROM b1 a JOIN b1 b ON a.doc_id < b.doc_id
                 WHERE $ham <= 3),
               e1 AS (SELECT u, v FROM p1 UNION ALL SELECT v, u FROM p1),
               cc1 AS (SELECT u AS node, u AS label FROM e1
                 UNION
                 SELECT g.v AS node, c.label FROM cc1 c JOIN e1 g
                   ON c.node = g.u),
               s1w AS (SELECT doc_id, w0, w1 FROM b1 WHERE doc_id NOT IN
                 (SELECT node FROM (SELECT node, min(label) AS m FROM cc1
                    GROUP BY node) WHERE node <> m)),
               s1 AS (SELECT w.doc_id, w.w0, w.w1 FROM s1w w
                 WHERE NOT EXISTS
                 (SELECT 1 FROM s0 h WHERE ${hamTo("h")} <= 3)),
               a1 AS (SELECT doc_id, w0, w1 FROM s0
                 UNION ALL SELECT doc_id, w0, w1 FROM s1),
               p2 AS (SELECT a.doc_id AS u, b.doc_id AS v
                 FROM b2 a JOIN b2 b ON a.doc_id < b.doc_id
                 WHERE $ham <= 3),
               e2 AS (SELECT u, v FROM p2 UNION ALL SELECT v, u FROM p2),
               cc2 AS (SELECT u AS node, u AS label FROM e2
                 UNION
                 SELECT g.v AS node, c.label FROM cc2 c JOIN e2 g
                   ON c.node = g.u),
               s2w AS (SELECT doc_id, w0, w1 FROM b2 WHERE doc_id NOT IN
                 (SELECT node FROM (SELECT node, min(label) AS m FROM cc2
                    GROUP BY node) WHERE node <> m)),
               s2 AS (SELECT w.doc_id, w.w0, w.w1 FROM s2w w
                 WHERE NOT EXISTS
                 (SELECT 1 FROM a1 h WHERE ${hamTo("h")} <= 3))
               SELECT CAST(bid AS BIGINT) AS bid,
                 CAST(doc_id AS BIGINT) AS doc_id FROM (
                   SELECT 0 AS bid, doc_id FROM s0
                   UNION ALL SELECT 1, doc_id FROM s1
                   UNION ALL SELECT 2, doc_id FROM s2)
               ORDER BY bid, doc_id"""))
  }

  val all: Seq[GraftQuery] = Seq(m01, m02, m03, m04, m05, m06, m07, m08, m09,
    m10, m11, m12, m13, m14, m15, m16, m17, m18, m19, m20, m21, m22, m23,
    m24, m25, m26, m27, m28, m29, m30, m31, m32)
}
