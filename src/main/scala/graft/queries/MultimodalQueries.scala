package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal column plumbing over driver data — every oracle row parses
  * REAL container bytes (the stub codec has no oracle row since r15; it
  * remains only as the documented fallback seam for native-library
  * formats like MP3/H.264).
  *
  *  - `q_media_*`: [[Multimodal.syntheticMedia]] encodes actual 24bpp
  *    BMPs, RIFF PCM16 WAVs and YUV4MPEG2 (C444) videos whose CONTENT is
  *    a closed-form function of the id; the engine must parse the real
  *    bytes ([[graft.multimodal.MediaCodecs]]) to reproduce what the
  *    oracle computes from the formulas — header fields, encoded byte
  *    sizes, exact pixel-channel sums, PCM amplitude stats, and a decode
  *    → nearest-neighbor resample → re-encode → re-decode round trip.
  *    Compressed tiers (PNG/GIF/JPEG/FLAC/MJPEG-AVI/G.711/ADPCM) ride
  *    their own fixtures.
  *  - `q_multimodal_*`: the pipeline-plumbing stages (metadata sniffing
  *    across the COMPRESSED container families, fixed-size binary frame
  *    chunking, byte-budget capping) — re-pointed at real containers in
  *    r15, so the sniff dispatcher, the chunker and the budget cap are
  *    all exercised on bytes a crawler would actually hold.
  */
object MultimodalQueries extends QuerySet {

  /** Shared fixture for the Hamming-band queries: real BMP encodes whose
    * pixels are a closed-form function of the id, one near-twin (single
    * bumped pixel region) per source image. id % 6 subset: the synthetic
    * formulas make sequential ids hash a few bits apart, so the full
    * corpus is an artificially DENSE near-dup graph (real corpora
    * concentrate that density in boilerplate, which the caps quarantine)
    * — half the images keeps the twin gate and the incidental-collision
    * coverage without the artifact's quadratic pair volume.
    */
  private def hammingMedia(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // no Spread: plain BMP encode is cheap per row — the exchange
    // measured +0.65/+0.44 s on the two consumer rows (see
    // Multimodal.syntheticMedia)
    graft.sources.Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 6 == 0)
      .mapPartitions(_.flatMap { id =>
        val w = (8 + (id * 5) % 9).toInt
        val h = (8 + (id * 3) % 9).toInt
        def px(bump: Int)(x: Int, y: Int): Int = {
          val r = ((x * 7 + y * 13 + id +
            (if (bump != 0 && x == 0 && y == 0) bump else 0)) % 256).toInt
          val g = ((x * 11 + y * 3 + id * 5) % 256).toInt
          val b = ((x + y + id * 9) % 256).toInt
          (r << 16) | (g << 8) | b
        }
        Iterator(
          (id, "image", graft.multimodal.MediaCodecs.encodeBmp(w, h, px(0))),
          (-id - 1, "image",
            graft.multimodal.MediaCodecs.encodeBmp(w, h, px(96))))
      }).toDF("media_id", "kind", "payload")
  }

  /** Real COMPRESSED containers across three codec families — PNG
    * (deflate), FLAC (entropy-coded lossless audio, the q_media_flac
    * params), GIF (LZW palette) — the fixture the metadata SNIFF
    * dispatcher is oracled on. Encoded sizes are not closed-form for
    * compressed formats, so the metadata row carries only the
    * header-derived fields.
    */
  private def compressedMedia(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // spread before the per-id PNG/FLAC/GIF encodes (CPU-dense; no-op
    // at production split counts)
    graft.core.Spread.ifStarved(
        graft.sources.Tables.documents(s, d).select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map { id =>
        (id % 3) match {
          case 0 =>
            val w = (8 + (id * 5) % 9).toInt
            val h = (8 + (id * 3) % 9).toInt
            (id, "image", graft.multimodal.MediaCodecs.encodePng(w, h,
              (x, y) => {
                val r = ((x * 7 + y * 13 + id) % 256).toInt
                val g = ((x * 11 + y * 3 + id * 5) % 256).toInt
                val b = ((x + y + id * 9) % 256).toInt
                (r << 16) | (g << 8) | b
              }, filterType = (id % 5).toInt))
          case 1 =>
            val ch = (1 + id % 2).toInt
            val frames = (150 + (id * 13) % 300).toInt
            val pcm = Array.tabulate(frames * ch)(i =>
              (((i / ch) * (3 + id % 5) + (i % ch) * 17L + id * 7L)
                % 4096L - 2048L).toShort)
            (id, "audio", graft.multimodal.FlacCodec
              .encodeFlac(ch, 8000, pcm, blockSize = 192))
          case _ =>
            val w = (8 + (id * 5) % 9).toInt
            val h = (8 + (id * 3) % 9).toInt
            (id, "image", graft.multimodal.MediaCodecs.encodeGifGray(w, h,
              (x, y) => ((x * 7 + y * 13 + id) % 256).toInt))
        }
      }).toDF("media_id", "kind", "payload")
  }

  val queries: Map[String, QFn] = Map(
    // metadata SNIFF across the compressed families: the dispatcher must
    // recognize PNG / FLAC / GIF magic and parse the real headers
    // (IHDR, STREAMINFO, logical screen descriptor) — the q_media_decode
    // twin for containers whose SIZE is not closed-form
    "q_multimodal_meta" -> ((s, d) => {
      Multimodal.decodeMeta(compressedMedia(s, d), Multimodal.SniffCodec)
        .toDF("media_id", "kind", "bytes", "width", "height", "duration_ms",
          "channels")
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("duration_ms"), col("channels"))
    }),

    // fixed-size binary frame chunking over REAL Y4M payloads: every 3rd
    // 64-byte window — the generic record-slicing stage (shard-for-
    // transport, fixed-record parse), fed by bytes whose total length the
    // oracle derives from the container formulas
    "q_multimodal_frames" -> ((s, d) => {
      Multimodal.sampleFrames(Multimodal.syntheticMedia(s, d), 64, 3)
        .groupBy(col("mediaId").as("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame")).cast("long")).as("frame_bytes"))
        .select(col("media_id"), col("n_frames"), col("frame_bytes"))
    }),

    // byte-budget cap over real containers (transport quota contract):
    // payloads over budget are truncated to it, the rest pass whole
    "q_multimodal_resize" -> ((s, d) => {
      Multimodal.resize(Multimodal.syntheticMedia(s, d), 1000)
        .select(col("media_id"), length(col("payload")).cast("long")
          .as("bytes"))
    }),

    // REAL container decode: header fields + encoded byte size parsed
    // from actual BMP/WAV/Y4M bytes
    "q_media_decode" -> ((s, d) => {
      Multimodal.decodeMeta(Multimodal.syntheticMedia(s, d),
          Multimodal.SniffCodec)
        .toDF("media_id", "kind", "bytes", "width", "height", "duration_ms",
          "channels")
    }),

    // real frame sampling: parse the Y4M container, every 2nd frame,
    // exact per-plane byte sums
    "q_media_frames" -> ((s, d) =>
      Multimodal.videoFrameStats(Multimodal.syntheticMedia(s, d), stride = 2)
        .toDF("media_id", "frame_idx", "sum_y", "sum_u", "sum_v")),

    // real pixel decode: exact per-channel sums over every decoded pixel
    "q_media_image_stats" -> ((s, d) =>
      Multimodal.imageStats(Multimodal.syntheticMedia(s, d))
        .toDF("media_id", "width", "height", "n_px", "sum_r", "sum_g",
          "sum_b")),

    // REAL COMPRESSED decode: the same closed-form pixels shipped as PNG
    // — zlib-deflated IDAT with the row filter VARYING by id (doc_id % 5
    // covers None/Sub/Up/Average/Paeth), so matching the oracle's
    // pixel-formula sums requires an actual inflate + per-filter
    // reconstruction (MediaCodecs.decodePng, pure-JDK zlib). Encoding
    // happens executor-side per row (map-only); the decode rides the
    // same imageStats pipeline as the BMP row
    "q_media_png" -> ((s, d) => {
      import s.implicits._
      val media = graft.core.Spread.ifStarved(  // CPU-dense per-id encode below
          graft.sources.Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .mapPartitions(_.map { id =>
          val w = (8 + (id * 5) % 9).toInt
          val h = (8 + (id * 3) % 9).toInt
          val payload = graft.multimodal.MediaCodecs.encodePng(w, h, (x, y) => {
            val r = ((x * 7 + y * 13 + id) % 256).toInt
            val g = ((x * 11 + y * 3 + id * 5) % 256).toInt
            val b = ((x + y + id * 9) % 256).toInt
            (r << 16) | (g << 8) | b
          }, filterType = (id % 5).toInt)
          (id, "image", payload)
        }).toDF("media_id", "kind", "payload")
      Multimodal.imageStats(media)
        .toDF("media_id", "width", "height", "n_px", "sum_r", "sum_g",
          "sum_b")
    }),

    // CROSS-FORMAT perceptual dedup: the same closed-form pixels encoded
    // as a BMP (id) and as a PNG under a mirror id (-id - 1). The average
    // hash is computed from DECODED pixels, so the pair (-id-1, id) must
    // collide — format-independent near-dup detection, the property that
    // makes perceptual dedup useful on a mixed-format web corpus. The
    // oracle replays ALL hash-equal pairs over the doubled id space, so
    // incidental same-hash collisions between different images are
    // matched too, not assumed away
    "q_media_cross_format" -> ((s, d) => {
      import s.implicits._
      val media = graft.core.Spread.ifStarved(  // CPU-dense per-id encode below
          graft.sources.Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .filter((id: Long) => id % 3 == 0)
        .mapPartitions(_.flatMap { id =>
          val w = (8 + (id * 5) % 9).toInt
          val h = (8 + (id * 3) % 9).toInt
          val px = (x: Int, y: Int) => {
            val r = ((x * 7 + y * 13 + id) % 256).toInt
            val g = ((x * 11 + y * 3 + id * 5) % 256).toInt
            val b = ((x + y + id * 9) % 256).toInt
            (r << 16) | (g << 8) | b
          }
          Iterator(
            (id, "image", graft.multimodal.MediaCodecs.encodeBmp(w, h, px)),
            (-id - 1, "image",
              graft.multimodal.MediaCodecs.encodePng(w, h, px,
                filterType = (id % 5).toInt)))
        }).toDF("media_id", "kind", "payload")
      Multimodal.perceptualDupPairs(media)
    }),

    // REAL GIF decode (JDK-bundled ImageIO plugin): closed-form GRAY
    // pixels — <= 256 distinct colors, so the palette round trip is
    // LOSSLESS and the decoded sums are oracle-exact. The engine must
    // LZW-decode the actual GIF stream to match
    "q_media_gif" -> ((s, d) => {
      import s.implicits._
      val media = graft.core.Spread.ifStarved(  // CPU-dense per-id encode below
          graft.sources.Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .mapPartitions(_.map { id =>
          val w = (8 + (id * 5) % 9).toInt
          val h = (8 + (id * 3) % 9).toInt
          val payload = graft.multimodal.MediaCodecs.encodeGifGray(w, h,
            (x, y) => ((x * 7 + y * 13 + id) % 256).toInt)
          (id, "image", payload)
        }).toDF("media_id", "kind", "payload")
      Multimodal.imageStats(media)
        .toDF("media_id", "width", "height", "n_px", "sum_r", "sum_g",
          "sum_b")
    }),

    // perceptual NEAR-dup (stage 2): a twin image differing in ONE pixel
    // region hashes a few Hamming bits away from its source — exact-hash
    // stage-1 dedup misses it, the 64-bit pigeonhole band join finds it.
    // Pairs are EXACT (pigeonhole argument), so the oracle replays the
    // closed-form hashes and all pairs within the distance — incidental
    // cross-image near-collisions included
    "q_media_hamming_dup" -> ((s, d) =>
      Multimodal.perceptualNearDupPairs(hammingMedia(s, d), maxDist = 4)),

    // REAL COMPRESSED video: Motion-JPEG frames in a hand-rolled RIFF/AVI
    // container. Header truth (dims, per-frame micros, frame count) is
    // container-exact and oracle-matched; n_decoded requires every
    // sampled frame to ACTUALLY decode (real per-frame JPEG decode) at
    // the header dims — pixel truth stays spec-side (JPEG is lossy)
    "q_media_avi_frames" -> ((s, d) => {
      import s.implicits._
      val media = graft.core.Spread.ifStarved(  // CPU-dense per-id encode below
          graft.sources.Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .filter((id: Long) => id % 7 == 3)
        .mapPartitions(_.map { id =>
          val w = (8 + (id * 3) % 9).toInt
          val h = (8 + (id * 5) % 9).toInt
          val nf = (2 + id % 4).toInt
          val usf = (10000 + (id % 50) * 100).toInt
          def px(f: Int)(x: Int, y: Int): Int = {
            val v = ((x * 7 + y * 13 + f * 41 + id) % 200 + 28).toInt
            (v << 16) | (v << 8) | v
          }
          (id, "video",
            graft.multimodal.MediaCodecs.encodeAviMjpeg(w, h, nf, usf, px))
        }).toDF("media_id", "kind", "payload")
      Multimodal.aviStats(media, stride = 2)
        .toDF("media_id", "width", "height", "us_per_frame", "n_frames",
          "n_decoded")
    }),

    // SCENE-CUT detection over really-decoded Y4M frames: consecutive
    // Y-plane SADs (exact integers — Y4M decode is lossless) thresholded
    // at 50 SAD/pixel, the classic shot-boundary rule (the within-scene
    // floor includes the occasional 255->0 wrap, ~(wh+254)/wh per pixel,
    // so the rule sits between the wrap-inflated drift ceiling ~17/pixel
    // and the cut floor ~102/pixel). The fixture seeds
    // a cut every c(id) frames via a 101-offset plane rotation, so the
    // within-scene drift floor (~1/pixel) and the cut spike (~100/pixel)
    // separate cleanly, and every pixel is a closed-form integer
    // expression of (id, f, i) the oracle replays without decoding
    "q_media_scene_cuts" -> ((s, d) =>
      Multimodal.frameDeltas(Multimodal.sceneVideos(s, d))
        .toDF()
        .filter(col("sad") >= col("wh") * 50)
        .select(col("mediaId").as("media_id"),
          col("frameIdx").as("frame"), col("sad"))),

    // scene-based frame SAMPLING over the same seeded fixture: one
    // representative (first) frame per detected scene plus the scene
    // length — the per-shot sampler (a static shot contributes one frame
    // however long it runs). Detection runs on really-decoded frames;
    // the oracle replays the SEEDED segmentation (scene s spans
    // [s*c, min((s+1)*c, nf))) — the two agree exactly because the
    // fixture's margin law pins every frame pair to the right side of
    // the 50 SAD/pixel rule (SceneCutSpec)
    "q_media_scene_sample" -> ((s, d) =>
      Multimodal.sceneRepresentatives(Multimodal.sceneVideos(s, d),
          sadPerPixel = 50)
        .toDF()
        .select(col("mediaId").as("media_id"), col("sceneIdx").as("scene"),
          col("frameIdx").as("frame"), col("sceneFrames").as("n_frames"))),

    // the QUARANTINE side of the same band join: run with a tiny cap so
    // the fixture's dense band buckets overflow it, and surface the
    // over-cap (band, bits) keys with their member counts — the output a
    // 100 TB deployment routes to exact dedup. The band split is
    // deterministic bit arithmetic, so the oracle replays hash + banding
    // closed-form and re-derives the same over-cap histogram
    "q_media_hamming_quarantine" -> ((s, d) =>
      Multimodal.perceptualNearDupPairsWithDrops(hammingMedia(s, d),
        maxDist = 4, maxBucket = 8)
        .droppedBuckets
        .select(col("band").cast("long").as("band"), col("bits"),
          col("members"))),

    // frame sampling over a COMPRESSED container: animated gray GIFs
    // (closed-form pixels per frame, lossless palette) decoded by the
    // JDK's LZW reader, every 2nd frame's exact gray sum — the real-codec
    // counterpart of q_media_frames' uncompressed Y4M path
    "q_media_gif_frames" -> ((s, d) => {
      import s.implicits._
      val media = graft.core.Spread.ifStarved(  // CPU-dense per-id encode below
          graft.sources.Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .filter((id: Long) => id % 3 == 2)
        .mapPartitions(_.map { id =>
          val w = (4 + id % 5).toInt
          val h = (4 + (id * 7) % 5).toInt
          val nf = (3 + id % 4).toInt
          val payload = graft.multimodal.MediaCodecs.encodeGifAnim(w, h, nf,
            (f, x, y) => ((x * 7 + y * 13 + f * 31 + id) % 256).toInt)
          (id, "video", payload)
        }).toDF("media_id", "kind", "payload")
      Multimodal.gifFrameStats(media, stride = 2)
        .toDF("media_id", "frame_idx", "width", "height", "sum_gray")
    }),

    // REAL JPEG decode (JDK-bundled ImageIO): JPEG is lossy, so the
    // oracle checks the HEADER truth — dimensions recovered by actually
    // parsing the DCT container — plus the byte size being container-real
    // (> the raw header floor)
    "q_media_jpeg" -> ((s, d) => {
      import s.implicits._
      val media = graft.core.Spread.ifStarved(  // CPU-dense per-id encode below
          graft.sources.Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .mapPartitions(_.map { id =>
          val w = (8 + (id * 5) % 9).toInt
          val h = (8 + (id * 3) % 9).toInt
          val payload = graft.multimodal.MediaCodecs.encodeJpeg(w, h,
            (x, y) => {
              val r = ((x * 7 + y * 13 + id) % 256).toInt
              val g = ((x * 11 + y * 3 + id * 5) % 256).toInt
              val b = ((x + y + id * 9) % 256).toInt
              (r << 16) | (g << 8) | b
            })
          (id, "image", payload)
        }).toDF("media_id", "kind", "payload")
      Multimodal.decodeMeta(media, Multimodal.SniffCodec)
        .toDF().select(col("mediaId").as("media_id"),
          col("width"), col("height"), col("channels"))
    }),

    // perceptual dedup primitive: 64-bit average hash per decoded BMP
    // (8x8 NN downsample, integer luma, mean threshold) as two unsigned
    // 32-bit halves — all integer, oracle replays the closed-form pixels
    "q_media_ahash" -> ((s, d) =>
      Multimodal.imageAHash(Multimodal.syntheticMedia(s, d))
        .toDF("media_id", "ahash_hi", "ahash_lo")),

    // multimodal training-example assembly: one manifest row per doc
    // joining text metadata, the REAL-container media kind, and the
    // embedding's int8 scale — three same-keyed tables, co-partitioned
    // equi-joins (at 100 TB these bucket on the shared id; no broadcast
    // side exists, which is the point of the co-location story)
    "q_modal_manifest" -> ((s, d) => {
      val docs = graft.sources.Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val media = Multimodal.syntheticMedia(s, d)
        .select(col("media_id").as("doc_id"), col("kind"))
      val emb = graft.functions.EmbedQuant
        .quantize(graft.sources.Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id").as("doc_id"), col("scale_micro"))
      docs.join(media, "doc_id").join(emb, "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("kind"),
          col("scale_micro"))
    }),

    // perceptual near-dup detection: every 30th image gains a 2x
    // NN-resized byte-DIFFERENT copy under the NEGATIVE mirror id
    // -(media_id + 1) — real ids are >= 0, so the copy space cannot
    // collide at ANY corpus vintage (an additive offset would, once the
    // corpus outgrows it); exact-hash grouping must pair each copy with
    // its source (plus any organic collisions — the oracle replays both)
    "q_media_near_dup" -> ((s, d) => {
      val base = Multimodal.syntheticMedia(s, d)
      val copies = Multimodal.resizeImages(
        base.filter(col("kind") === "image" && col("media_id") % 30 === 0),
        num = 2, den = 1)
        .withColumn("media_id", -col("media_id") - 1L)
      Multimodal.perceptualDupPairs(base.unionByName(copies))
    }),

    // real PCM decode: |sample| sum and peak over the interleaved stream
    "q_media_audio_stats" -> ((s, d) =>
      Multimodal.audioStats(Multimodal.syntheticMedia(s, d))
        .toDF("media_id", "channels", "n_samples", "sum_abs", "peak_abs")),

    // REAL COMPRESSED audio: G.711 companded WAVs (mu-law fmt 7 / A-law
    // fmt 6, 2:1) — unlike DCT codecs the quantization is exact integer
    // arithmetic, so the oracle replays encode-then-decode closed-form
    // per sample and the decoded aggregates hash-match cross-engine
    "q_media_g711" -> ((s, d) => {
      import s.implicits._
      val media = graft.core.Spread.ifStarved(  // CPU-dense per-id encode below
          graft.sources.Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .filter((id: Long) => id % 4 == 1)
        .mapPartitions(_.map { id =>
          val ch = (1 + id % 2).toInt
          val frames = (100 + (id * 7) % 150).toInt
          val pcm = new Array[Short](frames * ch)
          var f = 0
          while (f < frames) {
            var c = 0
            while (c < ch) {
              pcm(f * ch + c) =
                ((f * 2654435761L + c * 97L + id * 31L) % 65536L - 32768L).toShort
              c += 1
            }
            f += 1
          }
          (id, "audio", graft.multimodal.MediaCodecs
            .encodeWavG711(ch, 8000, pcm, aLaw = id % 8 >= 4))
        }).toDF("media_id", "kind", "payload")
      Multimodal.audioStats(media)
        .toDF("media_id", "channels", "n_samples", "sum_abs", "peak_abs")
        .withColumn("law",
          when(col("media_id") % 8 >= 4, lit("alaw")).otherwise(lit("mulaw")))
    }),

    // REAL PREDICTIVE compressed audio: IMA ADPCM WAVs (fmt 0x11, 4:1) —
    // unlike memoryless G.711 the reconstruction chains a (predictor,
    // step-index) state machine per channel, still exact integer
    // arithmetic; the oracle replays the chain as a recursive CTE and the
    // decoded aggregates hash-match cross-engine. samplesPerBlock 65
    // spans 2-4 blocks per clip, so block-header predictor resets and the
    // cross-block step-index carry are both under the oracle
    "q_media_adpcm" -> ((s, d) => {
      import s.implicits._
      val media = graft.core.Spread.ifStarved(  // CPU-dense per-id encode below
          graft.sources.Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .filter((id: Long) => id % 5 == 2)
        .mapPartitions(_.map { id =>
          val ch = (1 + id % 2).toInt
          val frames = (80 + (id * 7) % 120).toInt
          val pcm = new Array[Short](frames * ch)
          var f = 0
          while (f < frames) {
            var c = 0
            while (c < ch) {
              pcm(f * ch + c) =
                ((f * 2654435761L + c * 97L + id * 31L) % 65536L - 32768L).toShort
              c += 1
            }
            f += 1
          }
          (id, "audio", graft.multimodal.MediaCodecs
            .encodeWavAdpcm(ch, 8000, pcm, samplesPerBlock = 65))
        }).toDF("media_id", "kind", "payload")
      Multimodal.audioStats(media)
        .toDF("media_id", "channels", "n_samples", "sum_abs", "peak_abs")
    }),

    // REAL entropy-coded LOSSLESS audio: FLAC (fixed prediction + rice
    // coding + CRC framing, FlacCodec). Lossless makes the cross-engine
    // truth total — decoded samples ARE the closed-form source, so the
    // oracle needs no quantizer or recurrence replay at all. Mixed
    // signal classes steer the encoder through its subframe choices:
    // sawtooth clips compress through the fixed predictors, hash-noise
    // clips (media_id % 4 = 1) fall back to verbatim
    "q_media_flac" -> ((s, d) => {
      import s.implicits._
      val media = graft.core.Spread.ifStarved(  // CPU-dense per-id encode below
          graft.sources.Tables.documents(s, d).select(col("doc_id")))
        .as[Long]
        .filter((id: Long) => id % 6 == 5)
        .mapPartitions(_.map { id =>
          val ch = (1 + id % 2).toInt
          val frames = (150 + (id * 13) % 300).toInt
          val pcm = new Array[Short](frames * ch)
          var f = 0
          while (f < frames) {
            var c = 0
            while (c < ch) {
              pcm(f * ch + c) =
                if (id % 4 == 1)
                  ((f * 2654435761L + c * 97L + id * 31L) % 65536L - 32768L).toShort
                else
                  ((f * (3 + id % 5) + c * 17L + id * 7L) % 4096L - 2048L).toShort
              c += 1
            }
            f += 1
          }
          (id, "audio", graft.multimodal.FlacCodec
            .encodeFlac(ch, 8000, pcm, blockSize = 192))
        }).toDF("media_id", "kind", "payload")
      Multimodal.audioStats(media)
        .toDF("media_id", "channels", "n_samples", "sum_abs", "peak_abs")
    }),

    // decode -> NN half-resample -> re-encode -> re-decode: the resized
    // stats must equal NN sampling of the closed-form source
    "q_media_resize" -> ((s, d) =>
      Multimodal.imageStats(Multimodal.resizeImages(
          Multimodal.syntheticMedia(s, d), 1, 2))
        .toDF("media_id", "width", "height", "n_px", "sum_r", "sum_g",
          "sum_b"))
  )


  // real-container generators (mirror Multimodal.syntheticMedia)
  private val imgSql =
    """SELECT doc_id AS media_id,
      |       8 + (doc_id * 5) % 9 AS w, 8 + (doc_id * 3) % 9 AS h
      |FROM documents WHERE doc_id % 3 = 0""".stripMargin
  /** The average-hash replay over `img(media_id, w, h)` — CTE chain
    * ending at `hsrc(media_id, ahash_hi, ahash_lo)`, shared by
    * q_media_ahash / q_media_near_dup.
    */
  private val ahashCtes =
    """cell AS (
      |  SELECT media_id, CAST(u.i AS BIGINT) AS i,
      |         ((CAST(u.i AS BIGINT) % 8) * w) // 8 AS sx,
      |         ((CAST(u.i AS BIGINT) // 8) * h) // 8 AS sy
      |  FROM img, unnest(generate_series(0, 63)) u(i)
      |), lum AS (
      |  SELECT media_id, i,
      |         (299 * ((sx * 7 + sy * 13 + media_id) % 256)
      |          + 587 * ((sx * 11 + sy * 3 + media_id * 5) % 256)
      |          + 114 * ((sx + sy + media_id * 9) % 256)) // 1000 AS l
      |  FROM cell
      |), m AS (
      |  SELECT media_id, sum(l) // 64 AS mean FROM lum GROUP BY 1
      |), hsrc AS (
      |  SELECT l.media_id,
      |         CAST(sum(CASE WHEN l.l > m.mean AND l.i >= 32
      |           THEN (CAST(1 AS BIGINT) << CAST(l.i - 32 AS INT))
      |           ELSE 0 END) AS BIGINT) AS ahash_hi,
      |         CAST(sum(CASE WHEN l.l > m.mean AND l.i < 32
      |           THEN (CAST(1 AS BIGINT) << CAST(l.i AS INT))
      |           ELSE 0 END) AS BIGINT) AS ahash_lo
      |  FROM lum l JOIN m USING (media_id)
      |  GROUP BY 1
      |)""".stripMargin

  private val audSql =
    """SELECT doc_id AS media_id, 1 + doc_id % 2 AS ch,
      |       64 + doc_id % 64 AS frames
      |FROM documents WHERE doc_id % 3 = 1""".stripMargin
  private val vidSql =
    """SELECT doc_id AS media_id, 4 + doc_id % 5 AS w,
      |       4 + (doc_id * 7) % 5 AS h, 6 + doc_id % 10 AS nf
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin

  /** Closed-form encoded byte size of each syntheticMedia container —
    * what the q_media_decode oracle derives from the generator formulas
    * (BMP: 54-byte headers + 4-aligned rows; WAV: 44-byte canonical
    * header + 2 bytes/sample; Y4M: stream header + per-frame FRAME\n +
    * 3·w·h C444 planes).
    */
  private val mediaBytesSql =
    s"""SELECT media_id, CAST(54 + ((w * 3 + 3) // 4 * 4) * h AS BIGINT) AS n
       |FROM ($imgSql)
       |UNION ALL
       |SELECT media_id, CAST(44 + frames * ch * 2 AS BIGINT) FROM ($audSql)
       |UNION ALL
       |SELECT media_id,
       |       CAST(length('YUV4MPEG2 W' || w || ' H' || h ||
       |              ' F25:1 Ip A1:1 C444') + 1
       |            + nf * (6 + 3 * w * h) AS BIGINT)
       |FROM ($vidSql)""".stripMargin

  val oracles: Map[String, String] = Map(
    // header truth per compressed family: PNG IHDR dims, FLAC STREAMINFO
    // duration/channels, GIF screen-descriptor dims
    "q_multimodal_meta" ->
      """WITH png AS (
        |  SELECT doc_id AS media_id,
        |         8 + (doc_id * 5) % 9 AS w, 8 + (doc_id * 3) % 9 AS h
        |  FROM documents WHERE doc_id % 3 = 0
        |), flac AS (
        |  SELECT doc_id AS media_id, 1 + doc_id % 2 AS ch,
        |         150 + (doc_id * 13) % 300 AS frames
        |  FROM documents WHERE doc_id % 3 = 1
        |), gif AS (
        |  SELECT doc_id AS media_id,
        |         8 + (doc_id * 5) % 9 AS w, 8 + (doc_id * 3) % 9 AS h
        |  FROM documents WHERE doc_id % 3 = 2
        |)
        |SELECT media_id, 'image' AS kind, CAST(w AS INT) AS width,
        |       CAST(h AS INT) AS height, CAST(0 AS BIGINT) AS duration_ms,
        |       3 AS channels
        |FROM png
        |UNION ALL
        |SELECT media_id, 'audio', 0, 0,
        |       CAST(frames * 1000 // 8000 AS BIGINT), CAST(ch AS INT)
        |FROM flac
        |UNION ALL
        |SELECT media_id, 'image', CAST(w AS INT), CAST(h AS INT),
        |       CAST(0 AS BIGINT), 3
        |FROM gif""".stripMargin,

    // chunking arithmetic over the REAL Y4M byte length: ceil(n/64)
    // 64-byte windows, every 3rd kept (last window may be short)
    "q_multimodal_frames" ->
      s"""WITH vid AS ($vidSql), m AS (
         |  SELECT media_id,
         |         CAST(length('YUV4MPEG2 W' || w || ' H' || h ||
         |                ' F25:1 Ip A1:1 C444') + 1
         |              + nf * (6 + 3 * w * h) AS BIGINT) AS n
         |  FROM vid
         |), f AS (
         |  SELECT media_id, i.i AS idx,
         |         least(64, n - i.i * 64) AS flen
         |  FROM m, LATERAL (SELECT unnest(range(CAST(ceil(n / 64.0) AS BIGINT))) AS i) i
         |  WHERE i.i % 3 = 0
         |)
         |SELECT media_id, count(*) AS n_frames,
         |       CAST(sum(flen) AS BIGINT) AS frame_bytes
         |FROM f GROUP BY media_id""".stripMargin,

    "q_multimodal_resize" ->
      s"""SELECT media_id, least(n, 1000) AS bytes
         |FROM ($mediaBytesSql)""".stripMargin,

    // the engine reads these from parsed BMP/WAV headers; the oracle
    // derives them from the generator formulas — incl. the exact encoded
    // file sizes (54-byte BMP headers + 4-byte-aligned rows; 44-byte
    // canonical WAV header + 2 bytes/sample)
    "q_media_decode" ->
      s"""WITH img AS ($imgSql), aud AS ($audSql), vid AS ($vidSql)
         |SELECT media_id, 'image' AS kind,
         |       CAST(54 + ((w * 3 + 3) // 4 * 4) * h AS BIGINT) AS bytes,
         |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |       CAST(0 AS BIGINT) AS duration_ms, 3 AS channels
         |FROM img
         |UNION ALL
         |SELECT media_id, 'audio', CAST(44 + frames * ch * 2 AS BIGINT),
         |       0, 0, CAST(frames * 1000 // 8000 AS BIGINT),
         |       CAST(ch AS INT)
         |FROM aud
         |UNION ALL
         |SELECT media_id, 'video',
         |       CAST(length('YUV4MPEG2 W' || w || ' H' || h ||
         |              ' F25:1 Ip A1:1 C444') + 1
         |            + nf * (6 + 3 * w * h) AS BIGINT),
         |       CAST(w AS INT), CAST(h AS INT),
         |       CAST(nf * 1000 // 25 AS BIGINT), 3
         |FROM vid""".stripMargin,

    // every 2nd frame; plane byte (p, i, f) = (p*97 + i*7 + f*11 + id) % 256
    "q_media_frames" ->
      s"""WITH vid AS ($vidSql), fr AS (
         |  SELECT media_id, w, h, CAST(uf.f AS BIGINT) AS f
         |  FROM vid, unnest(generate_series(0, CAST(nf AS INT) - 1)) uf(f)
         |  WHERE uf.f % 2 = 0
         |), px AS (
         |  SELECT media_id, f, CAST(ui.i AS BIGINT) AS i
         |  FROM fr, unnest(generate_series(0, CAST(w * h AS INT) - 1)) ui(i)
         |)
         |SELECT media_id, CAST(f AS INT) AS frame_idx,
         |       CAST(sum((i * 7 + f * 11 + media_id) % 256) AS BIGINT) AS sum_y,
         |       CAST(sum((97 + i * 7 + f * 11 + media_id) % 256) AS BIGINT) AS sum_u,
         |       CAST(sum((194 + i * 7 + f * 11 + media_id) % 256) AS BIGINT) AS sum_v
         |FROM px GROUP BY media_id, f""".stripMargin,

    // the PNG leg replays the SAME pixel formulas over EVERY doc id (the
    // BMP row is the doc_id % 3 = 0 subset) — what the engine must earn
    // by inflating the deflated, per-id-filtered IDAT stream
    "q_media_png" ->
      s"""WITH img AS (
         |  SELECT doc_id AS media_id,
         |         8 + (doc_id * 5) % 9 AS w, 8 + (doc_id * 3) % 9 AS h
         |  FROM documents
         |), px AS (
         |  SELECT media_id, w, h, CAST(ux.x AS BIGINT) AS x,
         |         CAST(uy.y AS BIGINT) AS y
         |  FROM img,
         |       unnest(generate_series(0, CAST(w AS INT) - 1)) ux(x),
         |       unnest(generate_series(0, CAST(h AS INT) - 1)) uy(y)
         |)
         |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |       CAST(count(*) AS BIGINT) AS n_px,
         |       CAST(sum((x * 7 + y * 13 + media_id) % 256) AS BIGINT) AS sum_r,
         |       CAST(sum((x * 11 + y * 3 + media_id * 5) % 256) AS BIGINT) AS sum_g,
         |       CAST(sum((x + y + media_id * 9) % 256) AS BIGINT) AS sum_b
         |FROM px GROUP BY media_id, w, h""".stripMargin,

    // the PNG mirror decodes to the SAME pixels, so its hash equals the
    // BMP's; all hash-equal pairs over the doubled id space replay any
    // incidental collisions too
    "q_media_cross_format" ->
      s"""WITH img AS ($imgSql), $ahashCtes, hall AS (
         |  SELECT media_id, ahash_hi, ahash_lo FROM hsrc
         |  UNION ALL
         |  SELECT -media_id - 1, ahash_hi, ahash_lo FROM hsrc
         |)
         |SELECT a.media_id AS a_id, b.media_id AS b_id,
         |       a.ahash_hi, a.ahash_lo
         |FROM hall a JOIN hall b
         |  ON a.ahash_hi = b.ahash_hi AND a.ahash_lo = b.ahash_lo
         | AND a.media_id < b.media_id""".stripMargin,

    // gray pixels: every channel sums the same formula
    "q_media_gif" ->
      s"""WITH img AS (
         |  SELECT doc_id AS media_id,
         |         8 + (doc_id * 5) % 9 AS w, 8 + (doc_id * 3) % 9 AS h
         |  FROM documents
         |), px AS (
         |  SELECT media_id, w, h, CAST(ux.x AS BIGINT) AS x,
         |         CAST(uy.y AS BIGINT) AS y
         |  FROM img,
         |       unnest(generate_series(0, CAST(w AS INT) - 1)) ux(x),
         |       unnest(generate_series(0, CAST(h AS INT) - 1)) uy(y)
         |)
         |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |       CAST(count(*) AS BIGINT) AS n_px,
         |       CAST(sum((x * 7 + y * 13 + media_id) % 256) AS BIGINT) AS sum_r,
         |       CAST(sum((x * 7 + y * 13 + media_id) % 256) AS BIGINT) AS sum_g,
         |       CAST(sum((x * 7 + y * 13 + media_id) % 256) AS BIGINT) AS sum_b
         |FROM px GROUP BY media_id, w, h""".stripMargin,

    // hashes replayed per (image, variant); twin differs only where the
    // bumped pixel's sample cell (sx=0, sy=0) changes the red channel —
    // the sf0.01 oracle can afford the all-pairs distance scan (engine
    // side stays banded at every sf)
    "q_media_hamming_dup" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |         8 + (doc_id * 5) % 9 AS w, 8 + (doc_id * 3) % 9 AS h
        |  FROM documents WHERE doc_id % 6 = 0
        |), var AS (
        |  SELECT media_id, w, h, CAST(uv.v AS BIGINT) AS v
        |  FROM img, unnest([0, 1]) uv(v)
        |), cell AS (
        |  SELECT media_id, v, CAST(u.i AS BIGINT) AS i,
        |         ((CAST(u.i AS BIGINT) % 8) * w) // 8 AS sx,
        |         ((CAST(u.i AS BIGINT) // 8) * h) // 8 AS sy
        |  FROM var, unnest(generate_series(0, 63)) u(i)
        |), lum AS (
        |  SELECT media_id, v, i,
        |         (299 * ((sx * 7 + sy * 13 + media_id
        |                  + CASE WHEN v = 1 AND sx = 0 AND sy = 0
        |                         THEN 96 ELSE 0 END) % 256)
        |          + 587 * ((sx * 11 + sy * 3 + media_id * 5) % 256)
        |          + 114 * ((sx + sy + media_id * 9) % 256)) // 1000 AS l
        |  FROM cell
        |), m AS (
        |  SELECT media_id, v, sum(l) // 64 AS mean FROM lum GROUP BY 1, 2
        |), hsrc AS (
        |  SELECT l.media_id, l.v,
        |         CAST(sum(CASE WHEN l.l > m.mean AND l.i >= 32
        |           THEN (CAST(1 AS BIGINT) << CAST(l.i - 32 AS INT))
        |           ELSE 0 END) AS BIGINT) AS hi,
        |         CAST(sum(CASE WHEN l.l > m.mean AND l.i < 32
        |           THEN (CAST(1 AS BIGINT) << CAST(l.i AS INT))
        |           ELSE 0 END) AS BIGINT) AS lo
        |  FROM lum l JOIN m USING (media_id, v)
        |  GROUP BY 1, 2
        |), hall AS (
        |  SELECT CASE WHEN v = 0 THEN media_id ELSE -media_id - 1 END AS id,
        |         hi, lo
        |  FROM hsrc
        |)
        |SELECT a.id AS a_id, b.id AS b_id,
        |       CAST(bit_count(xor(a.hi, b.hi))
        |            + bit_count(xor(a.lo, b.lo)) AS INT) AS dist
        |FROM hall a JOIN hall b ON a.id < b.id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 4""".stripMargin,

    // the seeded-cut fixture replayed closed-form: per (video, frame,
    // pixel) the Y value is ((i*7 + id + (f/c)*101 + f) % 256), so the
    // SAD sums — and therefore the thresholded cut frames — recompute
    // exactly without any decoder (sum cast back to BIGINT: DuckDB
    // sum(BIGINT) widens to HUGEINT)
    "q_media_scene_cuts" ->
      """WITH vids AS (
        |  SELECT doc_id AS id,
        |         (4 + doc_id % 5) AS w,
        |         (4 + (doc_id * 7) % 5) AS h,
        |         (8 + doc_id % 9) AS nf,
        |         (3 + doc_id % 4) AS c
        |  FROM documents WHERE doc_id % 7 = 0
        |), px AS (
        |  SELECT v.id, v.w * v.h AS wh, f.f AS frame,
        |         ((i.i * 7 + v.id + (f.f // v.c) * 101 + f.f) % 256) AS y,
        |         ((i.i * 7 + v.id + ((f.f - 1) // v.c) * 101 + (f.f - 1)) % 256) AS yp
        |  FROM vids v
        |  JOIN range(1, 17) f(f) ON f.f < v.nf
        |  JOIN range(0, 64) i(i) ON i.i < v.w * v.h
        |), sad AS (
        |  SELECT id AS media_id, frame, wh,
        |         CAST(sum(abs(y - yp)) AS BIGINT) AS sad
        |  FROM px GROUP BY 1, 2, 3
        |)
        |SELECT media_id, frame, sad FROM sad
        |WHERE sad >= wh * 50""".stripMargin,

    // the seeded segmentation replayed directly: videos cut every c
    // frames, so scene s starts at s*c and runs min(c, nf - s*c) frames
    "q_media_scene_sample" ->
      """WITH vids AS (
        |  SELECT doc_id AS id,
        |         (8 + doc_id % 9) AS nf,
        |         (3 + doc_id % 4) AS c
        |  FROM documents WHERE doc_id % 7 = 0
        |)
        |SELECT v.id AS media_id, CAST(s.s AS INT) AS scene,
        |       CAST(s.s * v.c AS INT) AS frame,
        |       CAST(least(v.c, v.nf - s.s * v.c) AS INT) AS n_frames
        |FROM vids v
        |JOIN range(0, 16) s(s) ON s.s * v.c < v.nf""".stripMargin,

    // container-exact AVI truth: every column closed-form; n_decoded =
    // ceil(n_frames / 2) presumes (and the engine asserts) every sampled
    // frame really decodes at the header dims
    "q_media_avi_frames" ->
      """SELECT doc_id AS media_id,
        |       CAST(8 + (doc_id * 3) % 9 AS INT) AS width,
        |       CAST(8 + (doc_id * 5) % 9 AS INT) AS height,
        |       CAST(10000 + (doc_id % 50) * 100 AS INT) AS us_per_frame,
        |       CAST(2 + doc_id % 4 AS INT) AS n_frames,
        |       CAST((2 + doc_id % 4 + 1) // 2 AS INT) AS n_decoded
        |FROM documents WHERE doc_id % 7 = 3""".stripMargin,

    // G.711 quantizer replayed closed-form per sample: mu-law (biased
    // segment/mantissa) for doc_id % 8 < 4, A-law (Sun variant) above —
    // exactly the integer law G711Spec pins exhaustively on the engine
    "q_media_g711" ->
      """WITH aud AS (
        |  SELECT doc_id AS media_id, 1 + doc_id % 2 AS ch,
        |         100 + (doc_id * 7) % 150 AS frames,
        |         CASE WHEN doc_id % 8 >= 4 THEN 1 ELSE 0 END AS alaw
        |  FROM documents WHERE doc_id % 4 = 1
        |), smp AS (
        |  SELECT media_id, ch, alaw,
        |         CAST((CAST(uf.f AS BIGINT) * 2654435761
        |               + CAST(uc.c AS BIGINT) * 97
        |               + media_id * 31) % 65536 - 32768 AS BIGINT) AS p
        |  FROM aud,
        |       unnest(generate_series(0, CAST(frames AS INT) - 1)) uf(f),
        |       unnest(generate_series(0, CAST(ch AS INT) - 1)) uc(c)
        |), mue AS (
        |  SELECT media_id, ch, p,
        |         least(CASE WHEN p < 0 THEN -p ELSE p END, 32635) + 132 AS v
        |  FROM smp WHERE alaw = 0
        |), muq AS (
        |  SELECT media_id, ch,
        |         (CASE WHEN p < 0 THEN -1 ELSE 1 END) *
        |         (((((v >> CAST(e + 3 AS INT)) & 15) * 8 + 132)
        |           << CAST(e AS INT)) - 132) AS q
        |  FROM (SELECT media_id, ch, p, v,
        |          CASE WHEN v < 256 THEN 0 WHEN v < 512 THEN 1
        |               WHEN v < 1024 THEN 2 WHEN v < 2048 THEN 3
        |               WHEN v < 4096 THEN 4 WHEN v < 8192 THEN 5
        |               WHEN v < 16384 THEN 6 ELSE 7 END AS e
        |        FROM mue)
        |), ae AS (
        |  SELECT media_id, ch, p,
        |         least(greatest(CASE WHEN p >= 0 THEN p ELSE -p - 8 END, 0),
        |               32635) AS m
        |  FROM smp WHERE alaw = 1
        |), aq AS (
        |  SELECT media_id, ch,
        |         (CASE WHEN p >= 0 THEN 1 ELSE -1 END) *
        |         (CASE WHEN seg = 0 THEN ((m >> 4) & 15) * 16 + 8
        |               WHEN seg = 1 THEN ((m >> 4) & 15) * 16 + 264
        |               ELSE ((((m >> CAST(seg + 3 AS INT)) & 15) * 16 + 264)
        |                     << CAST(seg - 1 AS INT)) END) AS q
        |  FROM (SELECT media_id, ch, p, m,
        |          CASE WHEN m < 256 THEN 0 WHEN m < 512 THEN 1
        |               WHEN m < 1024 THEN 2 WHEN m < 2048 THEN 3
        |               WHEN m < 4096 THEN 4 WHEN m < 8192 THEN 5
        |               WHEN m < 16384 THEN 6 ELSE 7 END AS seg
        |        FROM ae)
        |), allq AS (
        |  SELECT media_id, ch, q FROM muq
        |  UNION ALL SELECT media_id, ch, q FROM aq
        |)
        |SELECT media_id, CAST(ch AS INT) AS channels,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(abs(q)) AS BIGINT) AS sum_abs,
        |       CAST(max(abs(q)) AS BIGINT) AS peak_abs,
        |       CASE WHEN media_id % 8 >= 4 THEN 'alaw' ELSE 'mulaw' END AS law
        |FROM allq GROUP BY 1, 2""".stripMargin,

    // FLAC is LOSSLESS: decoded aggregates equal the closed-form source
    // directly — the whole codec (prediction, rice coding, CRCs) cancels
    // out of the oracle, which is exactly the cross-engine property a
    // lossless codec must have
    "q_media_flac" ->
      """WITH aud AS (
        |  SELECT doc_id AS media_id, CAST(1 + doc_id % 2 AS BIGINT) AS ch,
        |         CAST(150 + (doc_id * 13) % 300 AS BIGINT) AS frames
        |  FROM documents WHERE doc_id % 6 = 5
        |), smp AS (
        |  SELECT media_id, ch,
        |         CASE WHEN media_id % 4 = 1
        |           THEN (CAST(uf.f AS BIGINT) * 2654435761
        |                 + CAST(uc.c AS BIGINT) * 97
        |                 + media_id * 31) % 65536 - 32768
        |           ELSE (CAST(uf.f AS BIGINT) * (3 + media_id % 5)
        |                 + CAST(uc.c AS BIGINT) * 17
        |                 + media_id * 7) % 4096 - 2048
        |         END AS p
        |  FROM aud,
        |       unnest(generate_series(0, CAST(frames AS INT) - 1)) uf(f),
        |       unnest(generate_series(0, CAST(ch AS INT) - 1)) uc(c)
        |)
        |SELECT media_id, CAST(ch AS INT) AS channels,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(abs(p)) AS BIGINT) AS sum_abs,
        |       CAST(max(abs(p)) AS BIGINT) AS peak_abs
        |FROM smp GROUP BY 1, 2""".stripMargin,

    // IMA ADPCM replayed as a RECURSIVE CTE: the (predictor, step-index)
    // state machine chains per (clip, channel) sample-by-sample — the
    // public IMA recurrence with its 89-entry step table inline. Block
    // boundaries (every 65th sample) pin the predictor to the exact
    // source sample (stored verbatim in the block header) and carry the
    // step index across, exactly the container contract the engine
    // encodes. All integer ops; // is exact on the nonnegative operands
    "q_media_adpcm" ->
      """WITH RECURSIVE aud AS (
        |  SELECT doc_id AS media_id, CAST(1 + doc_id % 2 AS BIGINT) AS ch,
        |         CAST(80 + (doc_id * 7) % 120 AS BIGINT) AS frames
        |  FROM documents WHERE doc_id % 5 = 2
        |), chan AS (
        |  SELECT media_id, ch, frames, CAST(uc.c AS BIGINT) AS c
        |  FROM aud, unnest(generate_series(0, CAST(ch AS INT) - 1)) uc(c)
        |), steps AS (
        |  SELECT CAST(u.i AS BIGINT) AS si,
        |         CAST(([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,
        |                41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,
        |                173,190,209,230,253,279,307,337,371,408,449,494,544,
        |                598,658,724,796,876,963,1060,1166,1282,1411,1552,
        |                1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,
        |                4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,
        |                11487,12635,13899,15289,16818,18500,20350,22385,
        |                24623,27086,29794,32767])[CAST(u.i AS INT) + 1]
        |              AS BIGINT) AS step
        |  FROM unnest(generate_series(0, 88)) u(i)
        |), st AS (
        |  SELECT media_id, ch, frames, c, CAST(0 AS BIGINT) AS f,
        |         CAST((c * 97 + media_id * 31) % 65536 - 32768 AS BIGINT) AS pred,
        |         CAST(0 AS BIGINT) AS idx,
        |         CAST((c * 97 + media_id * 31) % 65536 - 32768 AS BIGINT) AS dec
        |  FROM chan
        |  UNION ALL
        |  SELECT media_id, ch, frames, c, f, npred, nidx, npred AS dec
        |  FROM (
        |    SELECT media_id, ch, frames, c, f,
        |      CASE WHEN f % 65 = 0 THEN pin
        |           ELSE greatest(-32768, least(32767,
        |             pred + CASE WHEN sgn = 1 THEN -diffq ELSE diffq END))
        |      END AS npred,
        |      CASE WHEN f % 65 = 0 THEN idx
        |           ELSE greatest(0, least(88,
        |             idx + ([-1,-1,-1,-1,2,4,6,8])[CAST(code3 AS INT) + 1]))
        |      END AS nidx
        |    FROM (
        |      SELECT media_id, ch, frames, c, f, pred, idx, pin, sgn,
        |        CASE WHEN b2 = 1 THEN 4 ELSE 0 END
        |          + CASE WHEN b1 = 1 THEN 2 ELSE 0 END + b0 AS code3,
        |        step // 8 + b2 * step + b1 * (step // 2)
        |          + b0 * (step // 4) AS diffq
        |      FROM (
        |        SELECT media_id, ch, frames, c, f, pred, idx, pin, sgn,
        |               step, b2, b1, r2,
        |               CASE WHEN r2 >= step // 4 THEN 1 ELSE 0 END AS b0
        |        FROM (
        |          SELECT media_id, ch, frames, c, f, pred, idx, pin, sgn,
        |                 step, b2,
        |                 CASE WHEN r1 >= step // 2 THEN 1 ELSE 0 END AS b1,
        |                 r1 - CASE WHEN r1 >= step // 2
        |                           THEN step // 2 ELSE 0 END AS r2
        |          FROM (
        |            SELECT media_id, ch, frames, c, f, pred, idx, pin, sgn,
        |                   step,
        |                   CASE WHEN ad >= step THEN 1 ELSE 0 END AS b2,
        |                   ad - CASE WHEN ad >= step
        |                             THEN step ELSE 0 END AS r1
        |            FROM (
        |              SELECT nx.media_id, nx.ch, nx.frames, nx.c, nx.f,
        |                     nx.pred, nx.idx, nx.pin, s.step,
        |                     CASE WHEN nx.pin < nx.pred THEN 1 ELSE 0 END AS sgn,
        |                     abs(nx.pin - nx.pred) AS ad
        |              FROM (
        |                SELECT media_id, ch, frames, c, f + 1 AS f, pred, idx,
        |                  CAST((CAST(f + 1 AS BIGINT) * 2654435761
        |                        + c * 97 + media_id * 31) % 65536
        |                       - 32768 AS BIGINT) AS pin
        |                FROM st WHERE f + 1 < frames
        |              ) nx JOIN steps s ON s.si = nx.idx
        |            )
        |          )
        |        )
        |      )
        |    )
        |  )
        |)
        |SELECT media_id, CAST(ch AS INT) AS channels,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(abs(dec)) AS BIGINT) AS sum_abs,
        |       CAST(max(abs(dec)) AS BIGINT) AS peak_abs
        |FROM st GROUP BY 1, 2""".stripMargin,

    // same closed-form hashes, then the engine's exact band split (maxDist
    // 4 -> 5 bands over the conceptual hi:lo word, lo64 = 64*b//5, width =
    // 64*(b+1)//5 - lo64, band value = those bits packed from bit 0) and
    // the over-cap histogram at cap 8
    "q_media_hamming_quarantine" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |         8 + (doc_id * 5) % 9 AS w, 8 + (doc_id * 3) % 9 AS h
        |  FROM documents WHERE doc_id % 6 = 0
        |), var AS (
        |  SELECT media_id, w, h, CAST(uv.v AS BIGINT) AS v
        |  FROM img, unnest([0, 1]) uv(v)
        |), cell AS (
        |  SELECT media_id, v, CAST(u.i AS BIGINT) AS i,
        |         ((CAST(u.i AS BIGINT) % 8) * w) // 8 AS sx,
        |         ((CAST(u.i AS BIGINT) // 8) * h) // 8 AS sy
        |  FROM var, unnest(generate_series(0, 63)) u(i)
        |), lum AS (
        |  SELECT media_id, v, i,
        |         (299 * ((sx * 7 + sy * 13 + media_id
        |                  + CASE WHEN v = 1 AND sx = 0 AND sy = 0
        |                         THEN 96 ELSE 0 END) % 256)
        |          + 587 * ((sx * 11 + sy * 3 + media_id * 5) % 256)
        |          + 114 * ((sx + sy + media_id * 9) % 256)) // 1000 AS l
        |  FROM cell
        |), m AS (
        |  SELECT media_id, v, sum(l) // 64 AS mean FROM lum GROUP BY 1, 2
        |), hsrc AS (
        |  SELECT l.media_id, l.v,
        |         CAST(sum(CASE WHEN l.l > m.mean AND l.i >= 32
        |           THEN (CAST(1 AS BIGINT) << CAST(l.i - 32 AS INT))
        |           ELSE 0 END) AS BIGINT) AS hi,
        |         CAST(sum(CASE WHEN l.l > m.mean AND l.i < 32
        |           THEN (CAST(1 AS BIGINT) << CAST(l.i AS INT))
        |           ELSE 0 END) AS BIGINT) AS lo
        |  FROM lum l JOIN m USING (media_id, v)
        |  GROUP BY 1, 2
        |), banddef AS (
        |  SELECT CAST(b.band AS BIGINT) AS band,
        |         (64 * CAST(b.band AS BIGINT)) // 5 AS lo64,
        |         (64 * (CAST(b.band AS BIGINT) + 1)) // 5
        |           - (64 * CAST(b.band AS BIGINT)) // 5 AS wdt
        |  FROM unnest(generate_series(0, 4)) b(band)
        |), bbits AS (
        |  SELECT h.media_id, h.v, d.band,
        |         CAST(sum(CASE WHEN
        |             (CASE WHEN d.lo64 + j.j < 32
        |                   THEN (h.lo >> CAST(d.lo64 + j.j AS INT))
        |                   ELSE (h.hi >> CAST(d.lo64 + j.j - 32 AS INT)) END)
        |               % 2 = 1
        |           THEN (CAST(1 AS BIGINT) << CAST(j.j AS INT)) ELSE 0 END)
        |           AS BIGINT) AS bits
        |  FROM hsrc h, banddef d, unnest(generate_series(0, 12)) j(j)
        |  WHERE CAST(j.j AS BIGINT) < d.wdt
        |  GROUP BY 1, 2, 3
        |)
        |SELECT band, bits, count(*) AS members
        |FROM bbits GROUP BY 1, 2 HAVING count(*) > 8""".stripMargin,

    "q_media_gif_frames" ->
      """WITH g AS (
        |  SELECT doc_id AS media_id, 4 + doc_id % 5 AS w,
        |         4 + (doc_id * 7) % 5 AS h, 3 + doc_id % 4 AS nf
        |  FROM documents WHERE doc_id % 3 = 2
        |), fr AS (
        |  SELECT media_id, w, h, CAST(uf.f AS BIGINT) AS f
        |  FROM g, unnest(generate_series(0, CAST(nf AS INT) - 1)) uf(f)
        |  WHERE uf.f % 2 = 0
        |), px AS (
        |  SELECT media_id, w, h, f, CAST(ux.x AS BIGINT) AS x,
        |         CAST(uy.y AS BIGINT) AS y
        |  FROM fr,
        |       unnest(generate_series(0, CAST(w AS INT) - 1)) ux(x),
        |       unnest(generate_series(0, CAST(h AS INT) - 1)) uy(y)
        |)
        |SELECT media_id, CAST(f AS INT) AS frame_idx,
        |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       CAST(sum((x * 7 + y * 13 + f * 31 + media_id) % 256) AS BIGINT)
        |         AS sum_gray
        |FROM px GROUP BY media_id, f, w, h""".stripMargin,

    "q_media_jpeg" ->
      """SELECT doc_id AS media_id,
        |       CAST(8 + (doc_id * 5) % 9 AS INT) AS width,
        |       CAST(8 + (doc_id * 3) % 9 AS INT) AS height,
        |       CAST(3 AS INT) AS channels
        |FROM documents""".stripMargin,

    "q_media_image_stats" ->
      s"""WITH img AS ($imgSql), px AS (
         |  SELECT media_id, w, h, CAST(ux.x AS BIGINT) AS x,
         |         CAST(uy.y AS BIGINT) AS y
         |  FROM img,
         |       unnest(generate_series(0, CAST(w AS INT) - 1)) ux(x),
         |       unnest(generate_series(0, CAST(h AS INT) - 1)) uy(y)
         |)
         |SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |       CAST(count(*) AS BIGINT) AS n_px,
         |       CAST(sum((x * 7 + y * 13 + media_id) % 256) AS BIGINT) AS sum_r,
         |       CAST(sum((x * 11 + y * 3 + media_id * 5) % 256) AS BIGINT) AS sum_g,
         |       CAST(sum((x + y + media_id * 9) % 256) AS BIGINT) AS sum_b
         |FROM px GROUP BY media_id, w, h""".stripMargin,

    "q_media_ahash" ->
      s"""WITH img AS ($imgSql), $ahashCtes
         |SELECT media_id, ahash_hi, ahash_lo FROM hsrc""".stripMargin,

    "q_modal_manifest" ->
      s"""SELECT d.doc_id, d.lang, d.n_chars,
         |       CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'image'
         |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |       CAST(floor(list_max(list_transform(e.embedding,
         |              x -> abs(CAST(x AS DOUBLE)))) * 1000000.0 + 0.5)
         |         AS BIGINT) AS scale_micro
         |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id""".stripMargin,

    // a 2x NN resize preserves the hash exactly ((x·2w div 8) div 2 =
    // x·w div 8), so the copy rows reuse the SOURCE's hash formula
    // under the negative mirror id
    "q_media_near_dup" ->
      s"""WITH img AS ($imgSql), $ahashCtes, hall AS (
         |  SELECT media_id, ahash_hi, ahash_lo FROM hsrc
         |  UNION ALL
         |  SELECT -media_id - 1, ahash_hi, ahash_lo FROM hsrc
         |  WHERE media_id % 30 = 0
         |)
         |SELECT a.media_id AS a_id, b.media_id AS b_id,
         |       a.ahash_hi, a.ahash_lo
         |FROM hall a JOIN hall b
         |  ON a.ahash_hi = b.ahash_hi AND a.ahash_lo = b.ahash_lo
         | AND a.media_id < b.media_id""".stripMargin,

    "q_media_audio_stats" ->
      s"""WITH aud AS ($audSql), smp AS (
         |  SELECT media_id, ch,
         |         abs((CAST(uf.f AS BIGINT) * 2654435761 +
         |              CAST(uc.c AS BIGINT) * 97 + media_id * 31) % 65536
         |             - 32768) AS a
         |  FROM aud,
         |       unnest(generate_series(0, CAST(frames AS INT) - 1)) uf(f),
         |       unnest(generate_series(0, CAST(ch AS INT) - 1)) uc(c)
         |)
         |SELECT media_id, CAST(ch AS INT) AS channels,
         |       CAST(count(*) AS BIGINT) AS n_samples,
         |       CAST(sum(a) AS BIGINT) AS sum_abs,
         |       CAST(max(a) AS BIGINT) AS peak_abs
         |FROM smp GROUP BY media_id, ch""".stripMargin,

    // NN half-resample law: out(x, y) = src((x*w) div ow, (y*h) div oh);
    // w, h >= 8 so ow = w div 2 >= 4 (no max(1, _) clamp fires)
    "q_media_resize" ->
      s"""WITH img AS ($imgSql), dims AS (
         |  SELECT media_id, w, h, w // 2 AS ow, h // 2 AS oh FROM img
         |), px AS (
         |  SELECT media_id, ow, oh,
         |         (CAST(ux.x AS BIGINT) * w) // ow AS sx,
         |         (CAST(uy.y AS BIGINT) * h) // oh AS sy
         |  FROM dims,
         |       unnest(generate_series(0, CAST(ow AS INT) - 1)) ux(x),
         |       unnest(generate_series(0, CAST(oh AS INT) - 1)) uy(y)
         |)
         |SELECT media_id, CAST(ow AS INT) AS width, CAST(oh AS INT) AS height,
         |       CAST(count(*) AS BIGINT) AS n_px,
         |       CAST(sum((sx * 7 + sy * 13 + media_id) % 256) AS BIGINT) AS sum_r,
         |       CAST(sum((sx * 11 + sy * 3 + media_id * 5) % 256) AS BIGINT) AS sum_g,
         |       CAST(sum((sx + sy + media_id * 9) % 256) AS BIGINT) AS sum_b
         |FROM px GROUP BY media_id, ow, oh""".stripMargin
  )
}
