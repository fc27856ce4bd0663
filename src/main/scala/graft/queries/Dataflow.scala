package graft.queries

import org.apache.spark.sql.functions._

import graft.batch.ChunkPipeline
import Core._

/** Declared queries that drive the real binary dataflow (chunker → msgpack
  * wire codec → shuffle/duplication → hash-verified reassembly) rather than
  * its SQL mirror. The oracle is the identity: every document must come back
  * byte-identical (code 3 = whole-content sha512 verified).
  */
object Dataflow {

  /** End-to-end roundtrip of the reference's core dataflow over `documents`
    * at chunk size 64: chunk → pack → duplicate a slice (at-least-once
    * delivery) → repartition by key (broker shuffle) → unpack → reassemble.
    * The aggregator's merge dedups map-side; code 3 proves content hash. */
  val x01 = DQ("x01_binary_roundtrip", Some(
    """SELECT doc_id, CAST(1 AS INT) AS ok FROM documents ORDER BY doc_id""")) {
    (spark, dir) =>
      import spark.implicits._
      // spread: the chunk+sha512+msgpack stage before the key repartition
      // otherwise runs on the compact scan's 1-2 partitions
      val files = spread(table(spark, dir, "documents").select("doc_id", "text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          (id.toString, "docs", text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            Some(1.0e9): Option[Double])
        }
      val wire = ChunkPipeline.encode(ChunkPipeline.chunkFiles(files, 64))
      val dup = wire.filter(xxhash64(col("key")) % 3 === 0)
      val shuffled = wire.union(dup).repartition(col("key"))
      val assembled = ChunkPipeline.assemble(ChunkPipeline.decode(shuffled))
      assembled.select(col("filename").cast("long").as("doc_id"),
          when(col("code") === Assembly.Code.Complete, 1).otherwise(0).cast("int").as("ok"))
        .orderBy("doc_id")
  }
  private val Assembly = graft.core.Assembly

  /** x11: multimodal decode plumbing — documents' UTF-8 bytes stand in for
    * media payloads (binary column + kind tag), run through the batched
    * per-partition decode stage ([[graft.multimodal.Multimodal]]); the
    * oracle recomputes the deterministic metadata in SQL. The header-parse
    * fields come back NULL here by design — text payloads are NOT image
    * containers, and the parser correctly says so (x102 feeds it real
    * containers). */
  val x11 = DQ("x11_multimodal_meta", Some(
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      |                               WHEN 1 THEN 'audio'
      |                               ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(ascii(text) AS INT) AS first_cp,
      |  substring(md5(text), 1, 8) AS sig,
      |  CAST(NULL AS VARCHAR) AS format,
      |  CAST(NULL AS INT) AS width,
      |  CAST(NULL AS INT) AS height,
      |  CAST(NULL AS BIGINT) AS luma_sum,
      |  CAST(NULL AS BIGINT) AS pcm_sum_sq
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      val media = table(spark, dir, "documents")
        .select(col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          encode(col("text"), "UTF-8").as("media"))
      graft.multimodal.Multimodal.decodeStage(media, 32)
        .toDF().orderBy("media_id")
  }

  /** x102: REAL image-header decode — each document's bytes are wrapped in
    * a syntactically valid container (PNG/GIF/BMP/JPEG round-robin by
    * doc_id, dims derived from the row), then the native `image_header`
    * expression ([[graft.functions.ImageHeader]], whole-stage codegen)
    * reads format and pixel dimensions back out of the raw bytes — the
    * part of the multimodal pillar that needs no codec library and so is
    * NOT stubbed. The oracle recomputes the dims arithmetically: parse
    * must invert build exactly, for every row, in SQL. At 100 TB this is
    * the media-triage scan: schema/dims/format classification straight off
    * binary columns, no decode, no UDF boxing. */
  val x102 = DQ("x102_image_dims", Some(
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
      |                               WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
      |  CAST(n_chars % 640 + 1 AS INT) AS width,
      |  CAST(doc_id % 480 + 1 AS INT) AS height
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{ImageHeader, ImageHeaders}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text"), col("n_chars")))
        .as[(Long, String, Long)]
        .map { case (id, text, n) =>
          val w = (n % 640 + 1).toInt
          val h = (id % 480 + 1).toInt
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val payload = (id % 4) match {
            case 0 => ImageHeaders.buildPng(w, h, body)
            case 1 => ImageHeaders.buildGif(w, h, body)
            case 2 => ImageHeaders.buildBmp(w, h, body)
            case _ => ImageHeaders.buildJpeg(w, h, body)
          }
          (id, payload)
        }.toDF("media_id", "media")
      media.select(col("media_id"), ImageHeader.imageHeader(col("media")).as("ih"))
        .select(col("media_id"), col("ih.format").as("format"),
          col("ih.width").as("width"), col("ih.height").as("height"))
        .orderBy("media_id")
  }

  /** x103: REAL audio-header decode, x102's contract for WAV — each
    * document's bytes become the PCM body of a valid RIFF/WAVE container
    * (channels/rate/bits derived from the row), and the native
    * `audio_header` expression ([[graft.functions.AudioHeader]]) walks the
    * chunk chain to read codec, layout, and EXACT integer-micros duration
    * back out. The oracle recomputes everything arithmetically — including
    * duration_us = bytes·8e6 div (rate·channels·bits) — so the parse must
    * invert the build bit-for-bit in SQL. */
  val x103 = DQ("x103_audio_meta", Some(
    """SELECT doc_id AS media_id, 'pcm' AS codec,
      |  CAST(1 + doc_id % 2 AS INT) AS channels,
      |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |                               WHEN 2 THEN 22050 ELSE 44100 END AS sample_rate,
      |  CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
      |  CAST(octet_length(encode(text)) * 8000000
      |       // (CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |                 WHEN 2 THEN 22050 ELSE 44100 END AS BIGINT)
      |          * (1 + doc_id % 2) * (CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END))
      |       AS BIGINT) AS duration_us
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{AudioHeader, AudioHeaders}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val channels = (1 + id % 2).toInt
          val rate = (id % 4) match {
            case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100
          }
          val bits = if (id % 3 == 0) 8 else 16
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (id, AudioHeaders.buildWav(channels, rate, bits, body))
        }.toDF("media_id", "media")
      media.select(col("media_id"), AudioHeader.audioHeader(col("media")).as("ah"))
        .select(col("media_id"), col("ah.codec").as("codec"),
          col("ah.channels").as("channels"), col("ah.sample_rate").as("sample_rate"),
          col("ah.bits").as("bits"), col("ah.duration_us").as("duration_us"))
        .orderBy("media_id")
  }

  /** x104: REAL video-header decode, completing the container trio — each
    * document's bytes become the `mdat` payload of a valid ISO-BMFF (MP4)
    * file with row-derived movie timescale/duration, and the native
    * `video_header` expression ([[graft.functions.VideoHeader]]) walks the
    * box chain (ftyp brand, moov→mvhd) to read them back as exact integer
    * micros. Oracle recomputes arithmetically: parse inverts build in SQL. */
  val x104 = DQ("x104_video_meta", Some(
    """SELECT doc_id AS media_id, 'isom' AS brand,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 600 WHEN 1 THEN 1000
      |                               ELSE 90000 END AS timescale,
      |  CAST(CAST(n_chars * 37 AS BIGINT) * 1000000
      |       // CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 600 WHEN 1 THEN 1000
      |               ELSE 90000 END AS BIGINT) AS BIGINT) AS duration_us
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{VideoHeader, VideoHeaders}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text"), col("n_chars")))
        .as[(Long, String, Long)]
        .map { case (id, text, n) =>
          val timescale = (id % 3) match {
            case 0 => 600; case 1 => 1000; case _ => 90000
          }
          val durTicks = (n * 37).toInt
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (id, VideoHeaders.buildMp4("isom", timescale, durTicks, body))
        }.toDF("media_id", "media")
      media.select(col("media_id"), VideoHeader.videoHeader(col("media")).as("vh"))
        .select(col("media_id"), col("vh.brand").as("brand"),
          col("vh.timescale").as("timescale"),
          col("vh.duration_us").as("duration_us"))
        .orderBy("media_id")
  }

  /** x107: REAL pixel decode — the step past x102's header parse for the
    * one image format that needs no codec library. Each row becomes a
    * complete uncompressed 24-bit BI_RGB BMP with row-derived dimensions
    * and a deterministic per-pixel color ramp, alternating bottom-up and
    * top-down storage by doc_id; the native `bmp_pixels` expression
    * ([[graft.functions.BmpPixels]], whole-stage codegen) walks the padded
    * pixel rows and reduces them to exact integer channel sums, a luma
    * energy, and the TOP-LEFT pixel's luma (orientation-sensitive: a
    * parser that ignores biHeight's sign gets first_luma wrong on half the
    * rows). The oracle recomputes every field arithmetically from the
    * build inputs — decode must invert build per pixel, in SQL. */
  val x107 = DQ("x107_bmp_pixel_stats", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 7 + 1 AS INT) AS w,
      |                  CAST(doc_id % 5 + 1 AS INT) AS h FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, ux.x AS x, uy.y AS y,
      |    (doc_id * 3 + ux.x + 2 * uy.y) % 256 AS r,
      |    (doc_id * 2 + ux.x + uy.y) % 256 AS g,
      |    (doc_id + 2 * ux.x + 3 * uy.y) % 256 AS b
      |  FROM d, unnest(generate_series(0, w - 1)) AS ux(x),
      |       unnest(generate_series(0, h - 1)) AS uy(y))
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(w AS BIGINT) * h AS n_px,
      |  CAST(sum(r) AS BIGINT) AS sum_r,
      |  CAST(sum(g) AS BIGINT) AS sum_g,
      |  CAST(sum(b) AS BIGINT) AS sum_b,
      |  CAST(sum((77 * r + 150 * g + 29 * b) // 256) AS BIGINT) AS luma_sum,
      |  CAST(max(CASE WHEN x = 0 AND y = 0
      |           THEN (77 * r + 150 * g + 29 * b) // 256 END) AS BIGINT) AS first_luma
      |FROM px GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{BmpPixels, ImageHeaders}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val w = (id % 7 + 1).toInt
          val h = (id % 5 + 1).toInt
          val payload = ImageHeaders.buildBmp24(w, h, topDown = id % 2 == 1) {
            (x, y) =>
              (((id * 3 + x + 2 * y) % 256).toInt,
               ((id * 2 + x + y) % 256).toInt,
               ((id + 2 * x + 3 * y) % 256).toInt)
          }
          (id, payload)
        }.toDF("media_id", "media")
      media.select(col("media_id"), BmpPixels.bmpPixels(col("media")).as("p"))
        .select(col("media_id"),
          col("p.width").as("width"), col("p.height").as("height"),
          col("p.n_px").as("n_px"), col("p.sum_r").as("sum_r"),
          col("p.sum_g").as("sum_g"), col("p.sum_b").as("sum_b"),
          col("p.luma_sum").as("luma_sum"), col("p.first_luma").as("first_luma"))
        .orderBy("media_id")
  }

  /** x108: REAL sample decode — x107's contract for audio. Each row
    * becomes a PCM WAV whose body is a deterministic sample ramp (8-bit
    * unsigned or 16-bit signed LE by doc_id), and the native `pcm_stats`
    * expression ([[graft.functions.PcmStats]]) decodes the samples back
    * into exact integer statistics: count, peak amplitude, energy Σa²,
    * and full-scale clip count. Oracle recomputes all four from the
    * generator formula — decode must invert build per sample, in SQL. */
  val x108 = DQ("x108_pcm_sample_stats", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 50 + 10 AS INT) AS n,
      |                  (doc_id % 3 = 0) AS is8 FROM documents),
      |s AS (
      |  SELECT doc_id, is8,
      |    CASE WHEN is8 THEN (doc_id * 13 + u.i * 101) % 256 - 128
      |         ELSE ((doc_id * 31 + u.i * 7919) % 65536 + 32768) % 65536 - 32768
      |    END AS a
      |  FROM d, unnest(generate_series(0, n - 1)) AS u(i))
      |SELECT doc_id AS media_id,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(max(abs(a)) AS INT) AS peak,
      |  CAST(sum(a * a) AS BIGINT) AS sum_sq,
      |  CAST(sum(CASE WHEN (is8 AND a IN (-128, 127))
      |                  OR (NOT is8 AND a IN (-32768, 32767))
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_clip
      |FROM s GROUP BY doc_id ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{AudioHeaders, PcmStats}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val n = (id % 50 + 10).toInt
          val bits8 = id % 3 == 0
          val body = new Array[Byte](if (bits8) n else 2 * n)
          var i = 0
          while (i < n) {
            if (bits8) body(i) = ((id * 13 + i * 101) % 256).toByte
            else {
              val m = ((id * 31 + i * 7919L) % 65536L).toInt
              body(2 * i) = (m & 0xff).toByte
              body(2 * i + 1) = ((m >> 8) & 0xff).toByte
            }
            i += 1
          }
          (id, AudioHeaders.buildWav((1 + id % 2).toInt, 8000,
            if (bits8) 8 else 16, body))
        }.toDF("media_id", "media")
      media.select(col("media_id"), PcmStats.pcmStats(col("media")).as("p"))
        .select(col("media_id"),
          col("p.n_samples").as("n_samples"), col("p.peak").as("peak"),
          col("p.sum_sq").as("sum_sq"), col("p.n_clip").as("n_clip"))
        .orderBy("media_id")
  }

  /** x123: REAL compressed-image decode — x107's contract pushed through an
    * actual entropy-coded container. Each row becomes a spec-conformant
    * 8-bit RGB PNG (zlib-DEFLATE IDAT, real CRCs, scanline filter rotating
    * through none/sub/up/average/paeth by row), and the native `png_pixels`
    * expression ([[graft.functions.PngPixels]], whole-stage codegen, JDK
    * Inflater — no codec library) must invert compression AND filtering to
    * recover exact integer channel sums. The oracle recomputes every field
    * arithmetically from the ramp — it never sees the PNG, so a decoder
    * that mis-unfilters any row fails the hash. */
  val x123 = DQ("x123_png_pixel_stats", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 6 + 2 AS INT) AS w,
      |                  CAST(doc_id % 4 + 2 AS INT) AS h FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, ux.x AS x, uy.y AS y,
      |    (doc_id * 5 + 7 * ux.x + 13 * uy.y) % 256 AS r,
      |    (doc_id * 3 + 11 * ux.x + 3 * uy.y) % 256 AS g,
      |    (doc_id * 7 + 2 * ux.x * uy.y + 5) % 256 AS b
      |  FROM d, unnest(generate_series(0, w - 1)) AS ux(x),
      |       unnest(generate_series(0, h - 1)) AS uy(y))
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(w AS BIGINT) * h AS n_px,
      |  CAST(sum(r) AS BIGINT) AS sum_r,
      |  CAST(sum(g) AS BIGINT) AS sum_g,
      |  CAST(sum(b) AS BIGINT) AS sum_b,
      |  CAST(sum((77 * r + 150 * g + 29 * b) // 256) AS BIGINT) AS luma_sum,
      |  CAST(max(CASE WHEN x = 0 AND y = 0
      |           THEN (77 * r + 150 * g + 29 * b) // 256 END) AS BIGINT) AS first_luma
      |FROM px GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{ImageHeaders, PngPixels}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val w = (id % 6 + 2).toInt
          val h = (id % 4 + 2).toInt
          // filter varies by (id + row): every filter type appears across
          // the corpus, most images mix several
          val payload = ImageHeaders.buildPngRgb(w, h, y => ((id + y) % 5).toInt) {
            (x, y) =>
              (((id * 5 + 7 * x + 13 * y) % 256).toInt,
               ((id * 3 + 11 * x + 3 * y) % 256).toInt,
               ((id * 7 + 2 * x * y + 5) % 256).toInt)
          }
          (id, payload)
        }.toDF("media_id", "media")
      media.select(col("media_id"), PngPixels.pngPixels(col("media")).as("p"))
        .select(col("media_id"),
          col("p.width").as("width"), col("p.height").as("height"),
          col("p.n_px").as("n_px"), col("p.sum_r").as("sum_r"),
          col("p.sum_g").as("sum_g"), col("p.sum_b").as("sum_b"),
          col("p.luma_sum").as("luma_sum"), col("p.first_luma").as("first_luma"))
        .orderBy("media_id")
  }

  /** x125: REAL entropy-coded decode #2 — the GIF/LZW pass of x123's
    * contract. Each row becomes a complete GIF89a (4-color global palette
    * derived from the row, full-frame image, REAL greedy-LZW-compressed
    * data — `functions/GifCodec.lzwCompress`, variable code width with
    * growth aligned to the decoder, CLEAR resets) and the native
    * `gif_pixels` expression must run the actual LZW decoder (Welch 1984,
    * no library) to recover exact channel sums through the palette. The
    * oracle recomputes all fields from the palette/index formulas — it
    * never sees the GIF bytes. */
  val x125 = DQ("x125_gif_pixel_stats", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 9 + 2 AS INT) AS w,
      |                  CAST(doc_id % 6 + 2 AS INT) AS h FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, ux.x AS x, uy.y AS y,
      |         (doc_id + 3 * ux.x + 5 * uy.y) % 4 AS k
      |  FROM d, unnest(generate_series(0, w - 1)) AS ux(x),
      |       unnest(generate_series(0, h - 1)) AS uy(y)),
      |rgb AS (
      |  SELECT doc_id, w, h, x, y,
      |         (doc_id * 11 + 37 * k) % 256 AS r,
      |         (doc_id * 7 + 59 * k) % 256 AS g,
      |         (doc_id * 13 + 83 * k) % 256 AS b
      |  FROM px)
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(w AS BIGINT) * h AS n_px,
      |  CAST(sum(r) AS BIGINT) AS sum_r,
      |  CAST(sum(g) AS BIGINT) AS sum_g,
      |  CAST(sum(b) AS BIGINT) AS sum_b,
      |  CAST(sum((77 * r + 150 * g + 29 * b) // 256) AS BIGINT) AS luma_sum,
      |  CAST(max(CASE WHEN x = 0 AND y = 0
      |           THEN (77 * r + 150 * g + 29 * b) // 256 END) AS BIGINT) AS first_luma
      |FROM rgb GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{GifCodec, GifPixels}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val w = (id % 9 + 2).toInt
          val h = (id % 6 + 2).toInt
          val palette = Array.tabulate(4)(k =>
            (((id * 11 + 37 * k) % 256).toInt,
             ((id * 7 + 59 * k) % 256).toInt,
             ((id * 13 + 83 * k) % 256).toInt))
          val idx = Array.tabulate(w * h) { i =>
            val x = i % w; val y = i / w
            ((id + 3 * x + 5 * y) % 4).toInt
          }
          (id, GifCodec.buildGif(w, h, palette, idx))
        }.toDF("media_id", "media")
      media.select(col("media_id"), GifPixels.gifPixels(col("media")).as("p"))
        .select(col("media_id"),
          col("p.width").as("width"), col("p.height").as("height"),
          col("p.n_px").as("n_px"), col("p.sum_r").as("sum_r"),
          col("p.sum_g").as("sum_g"), col("p.sum_b").as("sum_b"),
          col("p.luma_sum").as("luma_sum"), col("p.first_luma").as("first_luma"))
        .orderBy("media_id")
  }

  /** x126: REAL entropy-coded decode #3 — baseline JPEG (ITU-T T.81).
    * Each row becomes a spec-conformant grayscale baseline JPEG whose 8×8
    * blocks are CONSTANT — a constant block is DC-only, and with DC quant
    * step 8 the DCT→quantize→Huffman→decode path is EXACTLY invertible
    * (DC = 8·(c−128), 8/8 divides evenly; AC coefficients are analytic
    * zeros) — so the native `jpeg_pixels` expression must run real
    * canonical-Huffman entropy decode + dequantize + IDCT and still land
    * integer-exact. The oracle recomputes stats from the per-block gray
    * formula; it never sees the JPEG bytes. Non-flat content is covered
    * by JpegCodecSpec's bounded-error gates (lossy ⇒ not oracle-exact,
    * by design). */
  val x126 = DQ("x126_jpeg_pixel_stats", Some(
    """WITH d AS (SELECT doc_id, CAST(8 * (doc_id % 3 + 1) AS INT) AS w,
      |                  CAST(8 * (doc_id % 2 + 1) AS INT) AS h FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, ux.x AS x, uy.y AS y,
      |         (doc_id * 17 + 41 * (ux.x // 8) + 97 * (uy.y // 8)) % 256 AS g
      |  FROM d, unnest(generate_series(0, w - 1)) AS ux(x),
      |       unnest(generate_series(0, h - 1)) AS uy(y))
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(w AS BIGINT) * h AS n_px,
      |  CAST(sum(g) AS BIGINT) AS sum_r,
      |  CAST(sum(g) AS BIGINT) AS sum_g,
      |  CAST(sum(g) AS BIGINT) AS sum_b,
      |  CAST(sum((77 * g + 150 * g + 29 * g) // 256) AS BIGINT) AS luma_sum,
      |  CAST(max(CASE WHEN x = 0 AND y = 0
      |           THEN (77 * g + 150 * g + 29 * g) // 256 END) AS BIGINT) AS first_luma
      |FROM px GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{JpegCodec, JpegPixels}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val w = (8 * (id % 3 + 1)).toInt
          val h = (8 * (id % 2 + 1)).toInt
          val payload = JpegCodec.buildJpegGray(w, h) { (x, y) =>
            ((id * 17 + 41 * (x / 8) + 97 * (y / 8)) % 256).toInt
          }
          (id, payload)
        }.toDF("media_id", "media")
      media.select(col("media_id"), JpegPixels.jpegPixels(col("media")).as("p"))
        .select(col("media_id"),
          col("p.width").as("width"), col("p.height").as("height"),
          col("p.n_px").as("n_px"), col("p.sum_r").as("sum_r"),
          col("p.sum_g").as("sum_g"), col("p.sum_b").as("sum_b"),
          col("p.luma_sum").as("luma_sum"), col("p.first_luma").as("first_luma"))
        .orderBy("media_id")
  }

  /** x127: the 4:2:0 SUBSAMPLED JPEG path — the dominant real-world JPEG
    * layout (luma 2×2, chroma 1×1; interleaved MCUs of four Y blocks plus
    * one Cb and one Cr). Rows become color 4:2:0 JPEGs whose 16×16
    * macroblocks are constant with r=g=b: Y is exactly the gray value,
    * Cb=Cr are exactly 128 (BT.601 coefficients sum to 0), chroma
    * averaging over a constant macroblock is the identity — so the FULL
    * color pipeline (subsampled MCU interleave, nearest-neighbor chroma
    * upsample, fixed-point YCbCr→RGB) must land integer-exact for
    * `jpeg_pixels` to hash-match the oracle's per-macroblock formula.
    * Lossy non-flat content is JpegCodecSpec territory, by design. */
  val x127 = DQ("x127_jpeg420_pixel_stats", Some(
    """WITH d AS (SELECT doc_id, CAST(16 * (doc_id % 2 + 1) AS INT) AS w,
      |                  CAST(16 * (doc_id % 3 + 1) AS INT) AS h FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, ux.x AS x, uy.y AS y,
      |         (doc_id * 23 + 53 * (ux.x // 16) + 71 * (uy.y // 16)) % 256 AS g
      |  FROM d, unnest(generate_series(0, w - 1)) AS ux(x),
      |       unnest(generate_series(0, h - 1)) AS uy(y))
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(w AS BIGINT) * h AS n_px,
      |  CAST(sum(g) AS BIGINT) AS sum_r,
      |  CAST(sum(g) AS BIGINT) AS sum_g,
      |  CAST(sum(g) AS BIGINT) AS sum_b,
      |  CAST(sum((77 * g + 150 * g + 29 * g) // 256) AS BIGINT) AS luma_sum,
      |  CAST(max(CASE WHEN x = 0 AND y = 0
      |           THEN (77 * g + 150 * g + 29 * g) // 256 END) AS BIGINT) AS first_luma
      |FROM px GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{JpegCodec, JpegPixels}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val w = (16 * (id % 2 + 1)).toInt
          val h = (16 * (id % 3 + 1)).toInt
          val payload = JpegCodec.buildJpegRgb420(w, h) { (x, y) =>
            val v = ((id * 23 + 53 * (x / 16) + 71 * (y / 16)) % 256).toInt
            (v, v, v)
          }
          (id, payload)
        }.toDF("media_id", "media")
      media.select(col("media_id"), JpegPixels.jpegPixels(col("media")).as("p"))
        .select(col("media_id"),
          col("p.width").as("width"), col("p.height").as("height"),
          col("p.n_px").as("n_px"), col("p.sum_r").as("sum_r"),
          col("p.sum_g").as("sum_g"), col("p.sum_b").as("sum_b"),
          col("p.luma_sum").as("luma_sum"), col("p.first_luma").as("first_luma"))
        .orderBy("media_id")
  }

  /** x132: REAL telephony-codec decode — G.711 µ-law/A-law (ITU-T G.711,
    * the 8 kHz voice standard; WAV format codes 7 and 6). Each row becomes
    * a G.711 WAV whose body is a deterministic code-byte ramp (µ-law for
    * even doc_ids, A-law for odd), and the native `pcm_stats` expression
    * must run the actual logarithmic expansion (segment + mantissa →
    * 13/14-bit linear) to land the exact integer energy. The oracle
    * re-derives the expansion FORMULA in SQL (shifts/xor — the x62
    * bit-op parity surface) and aggregates the same stats; `audio_header`
    * surfaces the codec name. */
  val x132 = DQ("x132_g711_sample_stats", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 40 + 20 AS INT) AS n,
      |                  (doc_id % 2 = 0) AS isu FROM documents),
      |c AS (
      |  SELECT doc_id, isu, CAST((doc_id * 13 + u.i * 41) % 256 AS INT) AS code
      |  FROM d, unnest(generate_series(0, n - 1)) AS u(i)),
      |lin AS (
      |  SELECT doc_id, isu,
      |    CASE WHEN isu THEN
      |      -- mu-law: invert, split sign/exponent/mantissa, expand
      |      (CASE WHEN (255 - code) >= 128 THEN -1 ELSE 1 END) *
      |      ((132 << (((255 - code) // 16) % 8)) - 132 +
      |       ((255 - code) % 16) * (1 << ((((255 - code) // 16) % 8) + 3)))
      |    ELSE
      |      -- A-law: xor 0x55; sign bit SET means positive
      |      (CASE WHEN xor(code, 85) >= 128 THEN 1 ELSE -1 END) *
      |      (CASE WHEN (xor(code, 85) // 16) % 8 = 0
      |            THEN (xor(code, 85) % 16) * 16 + 8
      |            ELSE ((xor(code, 85) % 16) * 16 + 264)
      |                 << ((xor(code, 85) // 16) % 8 - 1) END)
      |    END AS a
      |  FROM c)
      |SELECT doc_id AS media_id,
      |  CASE WHEN isu THEN 'ulaw' ELSE 'alaw' END AS codec,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(max(abs(a)) AS INT) AS peak,
      |  CAST(sum(a * a) AS BIGINT) AS sum_sq,
      |  CAST(count(*) FILTER (abs(a) = CASE WHEN isu THEN 32124 ELSE 32256 END)
      |       AS BIGINT) AS n_clip
      |FROM lin GROUP BY doc_id, isu ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{AudioHeader, AudioHeaders, PcmStats}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val n = (id % 40 + 20).toInt
          val body = Array.tabulate(n)(i => ((id * 13 + i * 41) % 256).toByte)
          val fmt = if (id % 2 == 0) 7 else 6
          (id, AudioHeaders.buildWav(1, 8000, 8, body, fmt))
        }.toDF("media_id", "media")
      media.select(col("media_id"),
          AudioHeader.audioHeader(col("media")).as("h"),
          PcmStats.pcmStats(col("media")).as("p"))
        .select(col("media_id"), col("h.codec").as("codec"),
          col("p.n_samples").as("n_samples"), col("p.peak").as("peak"),
          col("p.sum_sq").as("sum_sq"), col("p.n_clip").as("n_clip"))
        .orderBy("media_id")
  }

  /** x133: ISO-BMFF SAMPLE TABLES — the step past x104's mvhd header. Each
    * document becomes a full MP4 with two tracks (avc1 video + mp4a audio)
    * whose stsd/stts/stsz/stsc/stco tables are row-derived, including a
    * PER-SAMPLE stsz size table; the native `video_tracks` expression
    * ([[graft.functions.VideoTracks]]) walks
    * moov→trak→{tkhd,mdia→{mdhd,hdlr,minf→stbl}} and surfaces per-track
    * sample counts, exact byte totals, integer-micros durations and the
    * duration-weighted bitrate — everything a triage pipeline needs from
    * video at 100 TB with no codec library (only the H.264/H.265 sample
    * PAYLOAD needs one, and that stays stubbed). The oracle recomputes
    * every field — including the Σ-over-samples byte total via
    * generate_series — so the parse must invert the build per track, per
    * sample, in SQL. */
  val x133 = DQ("x133_video_tracks", Some(
    """WITH d AS (SELECT doc_id, n_chars,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 600 WHEN 1 THEN 1000
      |                                 ELSE 90000 END AS vts,
      |    CAST(doc_id % 50 + 1 AS INT) AS nv,
      |    CAST(100 + doc_id % 40 AS INT) AS dv,
      |    CAST(n_chars % 80 + 1 AS INT) AS na
      |  FROM documents),
      |vsz AS (
      |  SELECT doc_id, (doc_id * 31 + k.k * 7) % 2000 + 100 AS sz
      |  FROM d, unnest(generate_series(0, nv - 1)) AS k(k)),
      |vtot AS (SELECT doc_id, CAST(sum(sz) AS BIGINT) AS total_bytes
      |         FROM vsz GROUP BY doc_id),
      |asz AS (
      |  SELECT doc_id, (doc_id + k.k * 13) % 500 + 50 AS sz
      |  FROM d, unnest(generate_series(0, na - 1)) AS k(k)),
      |atot AS (SELECT doc_id, CAST(sum(sz) AS BIGINT) AS total_bytes
      |         FROM asz GROUP BY doc_id),
      |u AS (
      |  SELECT d.doc_id AS media_id, CAST(1 AS INT) AS track_id,
      |    'vide' AS handler, 'avc1' AS codec,
      |    CAST(d.n_chars % 640 + 16 AS INT) AS width,
      |    CAST(d.doc_id % 480 + 16 AS INT) AS height,
      |    CAST(d.vts AS INT) AS timescale,
      |    CAST(d.nv AS BIGINT) AS sample_count,
      |    CAST(CAST(d.nv AS BIGINT) * d.dv * 1000000 // d.vts AS BIGINT) AS duration_us,
      |    vtot.total_bytes,
      |    CAST(d.doc_id % 7 + 1 AS INT) AS chunk_count
      |  FROM d JOIN vtot ON d.doc_id = vtot.doc_id
      |  UNION ALL
      |  SELECT d.doc_id, CAST(2 AS INT), 'soun', 'mp4a',
      |    CAST(0 AS INT), CAST(0 AS INT), CAST(44100 AS INT),
      |    CAST(d.na AS BIGINT),
      |    CAST(CAST(d.na AS BIGINT) * 1024 * 1000000 // 44100 AS BIGINT),
      |    atot.total_bytes,
      |    CAST(d.doc_id % 5 + 1 AS INT)
      |  FROM d JOIN atot ON d.doc_id = atot.doc_id)
      |SELECT media_id, track_id, handler, codec, width, height, timescale,
      |  sample_count, duration_us, total_bytes,
      |  CAST(total_bytes * 8 * 1000000 // duration_us AS BIGINT) AS bitrate_bps,
      |  chunk_count
      |FROM u ORDER BY media_id, track_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{VideoHeaders, VideoTracks}
      import graft.functions.VideoHeaders.TrackSpec
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, n) =>
          val vts = (id % 3) match { case 0 => 600; case 1 => 1000; case _ => 90000 }
          val nv = (id % 50 + 1).toInt
          val dv = (100 + id % 40).toInt
          val na = (n % 80 + 1).toInt
          val vid = TrackSpec(1, "vide", "avc1",
            (n % 640 + 16).toInt, (id % 480 + 16).toInt, vts,
            Array.tabulate(nv)(k => ((id * 31 + k * 7) % 2000 + 100).toInt),
            dv, (id % 7 + 1).toInt)
          val aud = TrackSpec(2, "soun", "mp4a", 0, 0, 44100,
            Array.tabulate(na)(k => ((id + k * 13) % 500 + 50).toInt),
            1024, (id % 5 + 1).toInt)
          (id, VideoHeaders.buildMp4Tracks("isom", 1000, Seq(vid, aud),
            Array.fill[Byte](64)(id.toByte)))
        }.toDF("media_id", "media")
      media.select(col("media_id"),
          explode(VideoTracks.videoTracks(col("media"))).as("t"))
        .select(col("media_id"), col("t.track_id").as("track_id"),
          col("t.handler").as("handler"), col("t.codec").as("codec"),
          col("t.width").as("width"), col("t.height").as("height"),
          col("t.timescale").as("timescale"),
          col("t.sample_count").as("sample_count"),
          col("t.duration_us").as("duration_us"),
          col("t.total_bytes").as("total_bytes"),
          expr("CAST(t.total_bytes * 8 * 1000000 DIV t.duration_us AS BIGINT)")
            .as("bitrate_bps"),
          col("t.chunk_count").as("chunk_count"))
        .orderBy("media_id", "track_id")
  }

  /** x134: PROGRESSIVE JPEG (SOF2) decode — x126's gate for the variant
    * that dominates real crawl corpora. Each row becomes a progressive
    * stream whose coefficients arrive across SEVEN scans (interleaved DC
    * first pass at Al=1, per-band AC passes at Al=1, then DC and AC
    * successive-approximation refinements with §G.2.2.3 correction bits);
    * block-constant pixels make the image DC-only, so the multi-scan
    * reconstruction must be BIT-exact for the oracle to hash-match — any
    * error in EOB-run handling, refinement sign logic, or the
    * point-transform arithmetic shifts the sums. Same formula family as
    * x126 with different constants, so the two gates cannot share a
    * cached answer. */
  val x134 = DQ("x134_progressive_jpeg_stats", Some(
    """WITH d AS (SELECT doc_id, CAST(8 * (doc_id % 4 + 1) AS INT) AS w,
      |                  CAST(8 * (doc_id % 3 + 1) AS INT) AS h FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, ux.x AS x, uy.y AS y,
      |         (doc_id * 23 + 59 * (ux.x // 8) + 101 * (uy.y // 8)) % 256 AS g
      |  FROM d, unnest(generate_series(0, w - 1)) AS ux(x),
      |       unnest(generate_series(0, h - 1)) AS uy(y))
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(w AS BIGINT) * h AS n_px,
      |  CAST(sum(g) AS BIGINT) AS sum_r,
      |  CAST(sum(g) AS BIGINT) AS sum_g,
      |  CAST(sum(g) AS BIGINT) AS sum_b,
      |  CAST(sum((77 * g + 150 * g + 29 * g) // 256) AS BIGINT) AS luma_sum,
      |  CAST(max(CASE WHEN x = 0 AND y = 0
      |           THEN (77 * g + 150 * g + 29 * g) // 256 END) AS BIGINT) AS first_luma
      |FROM px GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{JpegCodec, JpegPixels}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val w = (8 * (id % 4 + 1)).toInt
          val h = (8 * (id % 3 + 1)).toInt
          val payload = JpegCodec.buildJpegProgressiveGray(w, h) { (x, y) =>
            ((id * 23 + 59 * (x / 8) + 101 * (y / 8)) % 256).toInt
          }
          (id, payload)
        }.toDF("media_id", "media")
      media.select(col("media_id"), JpegPixels.jpegPixels(col("media")).as("p"))
        .select(col("media_id"),
          col("p.width").as("width"), col("p.height").as("height"),
          col("p.n_px").as("n_px"), col("p.sum_r").as("sum_r"),
          col("p.sum_g").as("sum_g"), col("p.sum_b").as("sum_b"),
          col("p.luma_sum").as("luma_sum"), col("p.first_luma").as("first_luma"))
        .orderBy("media_id")
  }

  /** x135: SAMPLE EXTRACTION — the step past x133's sample-table stats:
    * `video_samples` resolves the stsc/stco/stsz chunk walk into absolute
    * per-sample byte ranges and the query SLICES the actual payload bytes
    * out of the binary column (`substring(media, offset+1, size)`), no
    * codec, no temp files — the multimodal "frame-sample" op as one
    * declarative plan. The fixture packs deterministic ASCII sample bytes
    * into a real mdat layout (true stco offsets); the oracle regenerates
    * every sample's bytes character by character in SQL and md5s them, so
    * ONE byte mis-sliced anywhere (offset arithmetic, chunk boundaries,
    * tail chunks with fewer samples) flips a digest and fails the hash
    * gate. */
  val x135 = DQ("x135_video_sample_slices", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 12 + 2 AS INT) AS nv FROM documents),
      |s AS (
      |  SELECT doc_id, u.s AS s,
      |         CAST((doc_id + u.s * 11) % 40 + 10 AS INT) AS size
      |  FROM d, unnest(generate_series(0, nv - 1)) AS u(s)),
      |bytes AS (
      |  SELECT doc_id, s, size, i.i AS i,
      |         chr(CAST(32 + (doc_id * 7 + s * 3 + i.i) % 64 AS INT)) AS ch
      |  FROM s, unnest(generate_series(0, size - 1)) AS i(i)),
      |agg AS (
      |  SELECT doc_id, s, size,
      |         md5(string_agg(ch, '' ORDER BY i)) AS digest
      |  FROM bytes GROUP BY doc_id, s, size)
      |SELECT doc_id AS media_id, CAST(1 AS INT) AS track_id,
      |  CAST(s AS INT) AS sample_idx, size, digest
      |FROM agg ORDER BY media_id, sample_idx""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{VideoHeaders, VideoSamples}
      import graft.functions.VideoHeaders.TrackSpec
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nv = (id % 12 + 2).toInt
          val sizes = Array.tabulate(nv)(s => ((id + s * 11) % 40 + 10).toInt)
          val data = Array.tabulate(nv)(s =>
            Array.tabulate(sizes(s))(i => (32 + (id * 7 + s * 3 + i) % 64).toByte))
          val spec = TrackSpec(1, "vide", "avc1", 64, 48, 90000, sizes, 100,
            (id % 3 + 1).toInt)
          (id, VideoHeaders.buildMp4TracksWithData("isom", 1000, Seq(spec), Seq(data)))
        }.toDF("media_id", "media")
      media
        .select(col("media_id"), col("media"),
          explode(VideoSamples.videoSamples(col("media"))).as("s"))
        .select(col("media_id"), col("s.track_id").as("track_id"),
          col("s.sample_idx").as("sample_idx"), col("s.size").as("size"),
          md5(expr("substring(media, CAST(s.offset AS INT) + 1, s.size)"))
            .as("digest"))
        .orderBy("media_id", "sample_idx")
  }

  /** x136: H.264 CODEC CONFIG — real coded dimensions out of the SPS's
    * Exp-Golomb bit syntax (ITU-T H.264 §7.3.2.1.1) via the avcC record in
    * a full visual sample entry (ISO 14496-15). Each row's SPS encodes a
    * row-derived macroblock grid and crop window; `h264_meta` must replay
    * the bit-level parse — ue/se codes, crop-unit arithmetic, emulation
    * prevention — to recover profile/level/width/height the oracle
    * computes arithmetically. The container's tkhd says nothing here: the
    * dimensions only exist inside the codec config, which is exactly why
    * a triage pipeline needs this parse (presentation size lies; the SPS
    * doesn't). */
  val x136 = DQ("x136_h264_sps_meta", Some(
    """SELECT doc_id AS media_id,
      |  CAST(66 AS INT) AS profile,
      |  CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 10 WHEN 1 THEN 30
      |                                    WHEN 2 THEN 31 ELSE 51 END AS INT) AS level,
      |  CAST(16 * (doc_id % 20 + 1) - 2 * (doc_id % 4) AS INT) AS width,
      |  CAST(16 * (doc_id % 12 + 1) - 2 * (doc_id % 3) AS INT) AS height,
      |  CAST(4 AS INT) AS length_size,
      |  CAST(1 AS INT) AS n_sps, CAST(1 AS INT) AS n_pps
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{H264, H264Meta, VideoHeaders}
      import graft.functions.VideoHeaders.TrackSpec
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val wMbs = (id % 20 + 1).toInt
          val hMap = (id % 12 + 1).toInt
          val cr = (id % 4).toInt
          val cb = (id % 3).toInt
          val level = (id % 4) match {
            case 0 => 10; case 1 => 30; case 2 => 31; case _ => 51
          }
          val sps = H264.buildSps(level, wMbs, hMap, cr, cb)
          val spec = TrackSpec(1, "vide", "avc1",
            16 * wMbs - 2 * cr, 16 * hMap - 2 * cb, 90000,
            Array(64, 64), 3000, 1, H264.buildAvcC(sps))
          (id, VideoHeaders.buildMp4Tracks("isom", 1000, Seq(spec), Array[Byte](7)))
        }.toDF("media_id", "media")
      media.select(col("media_id"), H264Meta.h264Meta(col("media")).as("m"))
        .select(col("media_id"), col("m.profile").as("profile"),
          col("m.level").as("level"), col("m.width").as("width"),
          col("m.height").as("height"), col("m.length_size").as("length_size"),
          col("m.n_sps").as("n_sps"), col("m.n_pps").as("n_pps"))
        .orderBy("media_id")
  }

  /** x137: H.265/HEVC codec config — x136's contract for the other codec
    * that matters in a crawl corpus: hvcC record walk (ISO 14496-15
    * §8.3.3.1 parameter-set arrays) + H.265 SPS parse (ITU-T H.265
    * §7.3.2.2: profile_tier_level, conformance-window crop in chroma
    * units). Dimensions here are LUMA samples directly (not macroblocks),
    * so the arithmetic differs from H.264 — a copy-paste parser fails this
    * gate. */
  val x137 = DQ("x137_hevc_sps_meta", Some(
    """SELECT doc_id AS media_id,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT) AS profile,
      |  CAST(doc_id % 2 AS INT) AS tier,
      |  CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 93 WHEN 1 THEN 120
      |                                    ELSE 153 END AS INT) AS level,
      |  CAST(64 * (doc_id % 30 + 2) - 2 * (doc_id % 5) AS INT) AS width,
      |  CAST(64 * (doc_id % 17 + 1) - 2 * (doc_id % 4) AS INT) AS height,
      |  CAST(1 AS INT) AS chroma_format,
      |  CAST(4 AS INT) AS length_size, CAST(1 AS INT) AS n_arrays
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{H265, HevcMeta, VideoHeaders}
      import graft.functions.VideoHeaders.TrackSpec
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val pw = (64 * (id % 30 + 2)).toInt
          val ph = (64 * (id % 17 + 1)).toInt
          val cr = (id % 5).toInt
          val cb = (id % 4).toInt
          val prof = if (id % 2 == 0) 1 else 2
          val tier = (id % 2).toInt
          val lvl = (id % 3) match { case 0 => 93; case 1 => 120; case _ => 153 }
          val sps = H265.buildSps(prof, tier, lvl, pw, ph, cr, cb)
          val spec = TrackSpec(1, "vide", "hvc1", pw - 2 * cr, ph - 2 * cb,
            90000, Array(64, 64), 3000, 1, H265.buildHvcC(sps))
          (id, VideoHeaders.buildMp4Tracks("isom", 1000, Seq(spec), Array[Byte](3)))
        }.toDF("media_id", "media")
      media.select(col("media_id"), HevcMeta.hevcMeta(col("media")).as("m"))
        .select(col("media_id"), col("m.profile").as("profile"),
          col("m.tier").as("tier"), col("m.level").as("level"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.chroma_format").as("chroma_format"),
          col("m.length_size").as("length_size"),
          col("m.n_arrays").as("n_arrays"))
        .orderBy("media_id")
  }

  /** x138: AV1 codec config — the third codec family of a modern crawl
    * corpus (after x136 H.264, x137 H.265): av1C record (AOM ISO-BMFF
    * binding §2.3) + sequence-header OBU bit syntax (AV1 spec §5.5 —
    * explicit frame-dimension bit WIDTHS precede the dimensions, so the
    * parse must read a variable-width field whose width was itself just
    * parsed; per-operating-point level/tier with tier coded only above
    * level 7). Oracle recomputes arithmetically. */
  val x138 = DQ("x138_av1_seq_meta", Some(
    """SELECT doc_id AS media_id,
      |  CAST(doc_id % 3 AS INT) AS profile,
      |  CAST(8 + doc_id % 16 AS INT) AS level,
      |  CAST(doc_id % 2 AS INT) AS tier,
      |  CAST(16 * (doc_id % 240 + 1) AS INT) AS width,
      |  CAST(16 * (doc_id % 135 + 1) AS INT) AS height,
      |  CAST(0 AS INT) AS monochrome,
      |  CAST(1 AS INT) AS sub_x, CAST(1 AS INT) AS sub_y
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Av1, Av1Meta, VideoHeaders}
      import graft.functions.VideoHeaders.TrackSpec
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val pf = (id % 3).toInt
          val lv = (8 + id % 16).toInt // > 7 so tier is coded
          val tr = (id % 2).toInt
          val w = (16 * (id % 240 + 1)).toInt
          val h = (16 * (id % 135 + 1)).toInt
          val obu = Av1.buildSeqHeaderObu(pf, lv, tr, w, h)
          val spec = TrackSpec(1, "vide", "av01", w, h, 90000,
            Array(48, 48), 3000, 1, Av1.buildAv1C(obu))
          (id, VideoHeaders.buildMp4Tracks("isom", 1000, Seq(spec), Array[Byte](6)))
        }.toDF("media_id", "media")
      media.select(col("media_id"), Av1Meta.av1Meta(col("media")).as("m"))
        .select(col("media_id"), col("m.profile").as("profile"),
          col("m.level").as("level"), col("m.tier").as("tier"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.monochrome").as("monochrome"),
          col("m.sub_x").as("sub_x"), col("m.sub_y").as("sub_y"))
        .orderBy("media_id")
  }

  /** x139: FLAC + MP3 audio triage — x103's contract for the two formats
    * that dominate a real audio crawl: FLAC's packed 20/3/5/36-bit
    * STREAMINFO fields (exact duration from total samples, no frame
    * decode) and MPEG-1 Layer III by FRAME WALK (ID3v2 syncsafe skip, per-
    * frame length arithmetic 144·bitrate/rate, 1152 samples/frame — exact
    * for CBR and VBR alike). One `audio_header` dispatch covers all three
    * audio containers; the oracle recomputes both arithmetics. */
  val x139 = DQ("x139_flac_mp3_meta", Some(
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'flac' ELSE 'mp3' END AS codec,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 7 + 1
      |            WHEN doc_id % 4 = 1 THEN 1 ELSE 2 END AS INT) AS channels,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN
      |         CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 32000 WHEN 1 THEN 44100
      |              WHEN 2 THEN 48000 WHEN 3 THEN 88200 ELSE 96000 END
      |       ELSE CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 44100
      |                 WHEN 1 THEN 48000 ELSE 32000 END END AS INT) AS sample_rate,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN
      |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 16 WHEN 1 THEN 20 ELSE 24 END
      |       ELSE 0 END AS INT) AS bits,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN
      |         (n_chars * 441 + doc_id) * 1000000 //
      |           CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 32000 WHEN 1 THEN 44100
      |                WHEN 2 THEN 48000 WHEN 3 THEN 88200 ELSE 96000 END
      |       ELSE (n_chars % 50 + 1) * 1152 * 1000000 //
      |           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 44100
      |                WHEN 1 THEN 48000 ELSE 32000 END END AS BIGINT) AS duration_us
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{AudioHeader, AudioHeaders}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, n) =>
          val payload =
            if (id % 2 == 0) {
              val ch = (id % 7 + 1).toInt
              val rate = (id % 5) match {
                case 0 => 32000; case 1 => 44100; case 2 => 48000
                case 3 => 88200; case _ => 96000
              }
              val bits = (id % 3) match { case 0 => 16; case 1 => 20; case _ => 24 }
              AudioHeaders.buildFlac(ch, rate, bits, n * 441 + id,
                Array.fill[Byte](32)(id.toByte))
            } else {
              val brIdx = (id % 14 + 1).toInt
              val srIdx = (id % 3).toInt
              AudioHeaders.buildMp3(brIdx, srIdx, (n % 50 + 1).toInt,
                mono = id % 4 == 1, id3Bytes = (id % 100).toInt)
            }
          (id, payload)
        }.toDF("media_id", "media")
      media.select(col("media_id"), AudioHeader.audioHeader(col("media")).as("a"))
        .select(col("media_id"), col("a.codec").as("codec"),
          col("a.channels").as("channels"),
          col("a.sample_rate").as("sample_rate"), col("a.bits").as("bits"),
          col("a.duration_us").as("duration_us"))
        .orderBy("media_id")
  }

  /** x140: Ogg/Opus triage — the fourth audio container (RFC 3533 page
    * layout + RFC 7845 OpusHead): channels/pre-skip/input-rate from the
    * BOS page's first packet, exact duration from the LAST page's 48 kHz
    * granule position minus pre-skip (found by backward OggS scan). The
    * fixture pages carry real RFC 3533 CRCs. */
  val x140 = DQ("x140_opus_meta", Some(
    """SELECT doc_id AS media_id, 'opus' AS codec,
      |  CAST(doc_id % 2 + 1 AS INT) AS channels,
      |  CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 48000 WHEN 1 THEN 16000
      |            ELSE 44100 END AS INT) AS sample_rate,
      |  CAST(0 AS INT) AS bits,
      |  CAST((n_chars * 48 + doc_id % 1000) * 1000000 // 48000 AS BIGINT)
      |    AS duration_us
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{AudioHeader, AudioHeaders}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, n) =>
          val rate = (id % 3) match {
            case 0 => 48000; case 1 => 16000; case _ => 44100
          }
          (id, AudioHeaders.buildOpus((id % 2 + 1).toInt, (312 + id % 100).toInt,
            rate, n * 48 + id % 1000, Array.fill[Byte](40)(id.toByte)))
        }.toDF("media_id", "media")
      media.select(col("media_id"), AudioHeader.audioHeader(col("media")).as("a"))
        .select(col("media_id"), col("a.codec").as("codec"),
          col("a.channels").as("channels"),
          col("a.sample_rate").as("sample_rate"), col("a.bits").as("bits"),
          col("a.duration_us").as("duration_us"))
        .orderBy("media_id")
  }

  /** x141: WebP + TIFF header triage — x102's contract for the two image
    * containers a crawl actually serves most after JPEG/PNG: WebP's three
    * coding variants (VP8X 24-bit canvas, lossy VP8 frame header with its
    * 9D 01 2A sync, VP8L's packed 14-bit fields) and TIFF's endianness-
    * dispatched IFD walk (II and MM, SHORT and LONG dim values). Five
    * layouts round-robin by row; the oracle recomputes dims
    * arithmetically, so each variant's bit/byte layout must parse
    * exactly. */
  val x141 = DQ("x141_webp_tiff_dims", Some(
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 5 <= 2 THEN 'webp' ELSE 'tiff' END AS format,
      |  CAST(n_chars % 9000 + 1 AS INT) AS width,
      |  CAST(doc_id % 9000 + 1 AS INT) AS height
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{ImageHeader, ImageHeaders}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, n) =>
          val w = (n % 9000 + 1).toInt
          val h = (id % 9000 + 1).toInt
          val payload = (id % 5) match {
            case 0 => ImageHeaders.buildWebpVp8x(w, h)
            case 1 => ImageHeaders.buildWebpVp8(w, h)
            case 2 => ImageHeaders.buildWebpVp8l(w, h)
            case 3 => ImageHeaders.buildTiff(w, h, bigEndian = false,
              longValues = id % 2 == 1)
            case _ => ImageHeaders.buildTiff(w, h, bigEndian = true,
              longValues = id % 2 == 0)
          }
          (id, payload)
        }.toDF("media_id", "media")
      media.select(col("media_id"), ImageHeader.imageHeader(col("media")).as("ih"))
        .select(col("media_id"), col("ih.format").as("format"),
          col("ih.width").as("width"), col("ih.height").as("height"))
        .orderBy("media_id")
  }

  /** x143: AAC-in-ADTS triage — the fifth audio container (ISO 14496-3
    * §1.A.2): 7-byte header frame walk (syncword 0xFFF + layer 00 — the
    * bits that keep ADTS and MP3 sync mutually exclusive), duration exact
    * from `raw_data_blocks·1024` samples per frame with no decode. Half
    * the fixtures carry an ID3v2 prefix (syncsafe skip) and half an ID3v1
    * `TAG` trailer (the walk must end cleanly at it, not reject the
    * stream). Oracle recomputes the 13-entry sampling-frequency table
    * arithmetic. */
  val x143 = DQ("x143_aac_adts_meta", Some(
    """SELECT doc_id AS media_id, 'aac' AS codec,
      |  CAST(CASE WHEN doc_id % 7 + 1 = 7 THEN 8
      |       ELSE doc_id % 7 + 1 END AS INT) AS channels,
      |  CAST(CASE CAST(doc_id % 13 AS INT)
      |       WHEN 0 THEN 96000 WHEN 1 THEN 88200 WHEN 2 THEN 64000
      |       WHEN 3 THEN 48000 WHEN 4 THEN 44100 WHEN 5 THEN 32000
      |       WHEN 6 THEN 24000 WHEN 7 THEN 22050 WHEN 8 THEN 16000
      |       WHEN 9 THEN 12000 WHEN 10 THEN 11025 WHEN 11 THEN 8000
      |       ELSE 7350 END AS INT) AS sample_rate,
      |  CAST(0 AS INT) AS bits,
      |  CAST((n_chars % 40 + 1) * (doc_id % 4 + 1) * 1024 * 1000000 //
      |       CASE CAST(doc_id % 13 AS INT)
      |       WHEN 0 THEN 96000 WHEN 1 THEN 88200 WHEN 2 THEN 64000
      |       WHEN 3 THEN 48000 WHEN 4 THEN 44100 WHEN 5 THEN 32000
      |       WHEN 6 THEN 24000 WHEN 7 THEN 22050 WHEN 8 THEN 16000
      |       WHEN 9 THEN 12000 WHEN 10 THEN 11025 WHEN 11 THEN 8000
      |       ELSE 7350 END AS BIGINT) AS duration_us
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{AudioHeader, AudioHeaders}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, n) =>
          (id, AudioHeaders.buildAdts(
            srIdx = (id % 13).toInt,
            channels = (id % 7 + 1).toInt,
            nFrames = (n % 40 + 1).toInt,
            bodyBytes = (id % 200 + 16).toInt,
            blocksPerFrame = (id % 4 + 1).toInt,
            id3Bytes = if (id % 2 == 1) (id % 80).toInt else 0,
            id3v1 = id % 2 == 0))
        }.toDF("media_id", "media")
      media.select(col("media_id"), AudioHeader.audioHeader(col("media")).as("a"))
        .select(col("media_id"), col("a.codec").as("codec"),
          col("a.channels").as("channels"),
          col("a.sample_rate").as("sample_rate"), col("a.bits").as("bits"),
          col("a.duration_us").as("duration_us"))
        .orderBy("media_id")
  }

  /** x144: Matroska/WebM container walk — x133's contract for the OTHER
    * big crawl container (RFC 8794 EBML varints + public Matroska element
    * IDs, no codec): each document becomes a two-track WebM skeleton
    * (VP8/VP9/AV1 video + Opus/Vorbis audio) and the native `mkv_tracks`
    * expression ([[graft.functions.MkvTracks]]) walks EBML-header →
    * Segment → {Info, Tracks} and surfaces per-track type/codec/dims/
    * audio params plus the segment's exact integer-micros duration
    * (Duration float ticks × TimestampScale ns / 1000 — the fixture
    * varies the scale so the arithmetic is load-bearing). The oracle
    * recomputes every field. */
  val x144 = DQ("x144_mkv_tracks", Some(
    """WITH d AS (SELECT doc_id, n_chars,
      |    CAST((n_chars % 90000 + 10) *
      |         (CASE WHEN doc_id % 2 = 0 THEN 1000 ELSE 2000 END)
      |      AS BIGINT) AS dur_us
      |  FROM documents)
      |SELECT doc_id AS media_id, CAST(1 AS INT) AS track_id,
      |  'video' AS kind,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'V_VP8'
      |       WHEN 1 THEN 'V_VP9' ELSE 'V_AV1' END AS codec,
      |  CAST(n_chars % 4000 + 16 AS INT) AS width,
      |  CAST(doc_id % 2000 + 16 AS INT) AS height,
      |  CAST(0 AS INT) AS channels, CAST(0 AS INT) AS sample_rate,
      |  dur_us AS duration_us
      |FROM d
      |UNION ALL
      |SELECT doc_id, CAST(2 AS INT), 'audio',
      |  CASE WHEN doc_id % 2 = 0 THEN 'A_OPUS' ELSE 'A_VORBIS' END,
      |  CAST(0 AS INT), CAST(0 AS INT),
      |  CAST(doc_id % 8 + 1 AS INT),
      |  CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 48000
      |       WHEN 1 THEN 44100 ELSE 24000 END AS INT),
      |  dur_us
      |FROM d
      |ORDER BY media_id, track_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Mkv, MkvTracks}
      import graft.functions.Mkv.MkvTrackSpec
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, n) =>
          val scale = if (id % 2 == 0) 1000000L else 2000000L
          val ticks = n % 90000 + 10
          val vCodec = (id % 3) match {
            case 0 => "V_VP8"; case 1 => "V_VP9"; case _ => "V_AV1"
          }
          val aCodec = if (id % 2 == 0) "A_OPUS" else "A_VORBIS"
          val rate = (id % 3) match {
            case 0 => 48000; case 1 => 44100; case _ => 24000
          }
          val docType = if (id % 3 == 2) "matroska" else "webm"
          (id, Mkv.buildMkv(docType, scale, ticks, Seq(
            MkvTrackSpec(1, "video", vCodec,
              width = (n % 4000 + 16).toInt, height = (id % 2000 + 16).toInt),
            MkvTrackSpec(2, "audio", aCodec,
              channels = (id % 8 + 1).toInt, rate = rate)),
            voidBytes = (id % 100 + 8).toInt))
        }.toDF("media_id", "media")
      media.select(col("media_id"),
          explode(MkvTracks.mkvTracks(col("media"))).as("t"))
        .select(col("media_id"), col("t.track_id").as("track_id"),
          col("t.kind").as("kind"), col("t.codec").as("codec"),
          col("t.width").as("width"), col("t.height").as("height"),
          col("t.channels").as("channels"),
          col("t.sample_rate").as("sample_rate"),
          col("t.duration_us").as("duration_us"))
        .orderBy("media_id", "track_id")
  }

  /** x142: REAL VIDEO FRAME DECODE — x135's sample slicing composed with
    * x126's baseline-JPEG entropy decode, zero new codec code. Each
    * document becomes an MJPEG-shaped MP4 (every track sample IS a
    * spec-conformant grayscale baseline JPEG; `jpeg` sample-entry fourcc),
    * and the plan `video_samples → substring → jpeg_pixels` surfaces
    * per-FRAME pixel statistics straight off the container — the
    * multimodal "frame-sample" op made real end to end (container walk,
    * byte slice, canonical-Huffman decode + IDCT, all inside one
    * declarative plan; reference anchor: the datafile_type processing
    * hook, data_file_stream_processor.py:207-224). Block-constant frames
    * keep the DC-only decode integer-exact, so the oracle recomputes every
    * frame's sums from the generator formula — one mis-sliced byte or one
    * wrong coefficient anywhere flips a sum and fails the gate. */
  val x142 = DQ("x142_mjpeg_frame_stats", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 6 + 2 AS INT) AS nv,
      |                CAST(8 * (doc_id % 3 + 1) AS INT) AS w,
      |                CAST(8 * (doc_id % 2 + 1) AS INT) AS h FROM documents),
      |s AS (SELECT doc_id, w, h, u.s AS s
      |      FROM d, unnest(generate_series(0, nv - 1)) AS u(s)),
      |px AS (
      |  SELECT doc_id, s, w, h, ux.x AS x, uy.y AS y,
      |         (doc_id * 23 + s * 17 + 41 * (ux.x // 8) + 97 * (uy.y // 8))
      |           % 256 AS g
      |  FROM s, unnest(generate_series(0, w - 1)) AS ux(x),
      |       unnest(generate_series(0, h - 1)) AS uy(y))
      |SELECT doc_id AS media_id, CAST(s AS INT) AS sample_idx,
      |  w AS width, h AS height,
      |  CAST(w AS BIGINT) * h AS n_px,
      |  CAST(sum(g) AS BIGINT) AS gray_sum,
      |  CAST(sum((77 * g + 150 * g + 29 * g) // 256) AS BIGINT) AS luma_sum
      |FROM px GROUP BY doc_id, s, w, h
      |ORDER BY media_id, sample_idx""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{JpegCodec, JpegPixels, VideoHeaders, VideoSamples}
      import graft.functions.VideoHeaders.TrackSpec
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nv = (id % 6 + 2).toInt
          val w = (8 * (id % 3 + 1)).toInt
          val h = (8 * (id % 2 + 1)).toInt
          val frames = Array.tabulate(nv)(s =>
            JpegCodec.buildJpegGray(w, h) { (x, y) =>
              ((id * 23 + s * 17 + 41 * (x / 8) + 97 * (y / 8)) % 256).toInt
            })
          val spec = TrackSpec(1, "vide", "jpeg", w, h, 90000,
            frames.map(_.length), 3000, (id % 3 + 1).toInt)
          (id, VideoHeaders.buildMp4TracksWithData("isom", 1000,
            Seq(spec), Seq(frames)))
        }.toDF("media_id", "media")
      media
        .select(col("media_id"), col("media"),
          explode(VideoSamples.videoSamples(col("media"))).as("s"))
        .select(col("media_id"), col("s.sample_idx").as("sample_idx"),
          JpegPixels.jpegPixels(
            expr("substring(media, CAST(s.offset AS INT) + 1, s.size)")).as("p"))
        .select(col("media_id"), col("sample_idx"),
          col("p.width").as("width"), col("p.height").as("height"),
          col("p.n_px").as("n_px"), col("p.sum_g").as("gray_sum"),
          col("p.luma_sum").as("luma_sum"))
        .orderBy("media_id", "sample_idx")
  }

  /** x145: WebM FRAME DECODE — x144's container walk carried to the media
    * data itself, mirroring what x142 does for ISO-BMFF: each document
    * becomes a WebM whose Cluster/SimpleBlock frames ARE baseline JPEGs
    * (MJPEG-in-Matroska, `V_MJPEG`), and the plan `mkv_blocks → substring
    * → jpeg_pixels` surfaces per-frame pixel statistics plus each block's
    * absolute timestamp (cluster timestamp + the signed 16-bit relative
    * offset — the oracle recomputes the 2-frames-per-cluster arithmetic,
    * so the SimpleBlock header walk must be byte-exact). Zero new codec
    * code; block-constant frames keep the decode integer-exact. */
  val x145 = DQ("x145_webm_frame_stats", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 5 + 2 AS INT) AS nv,
      |                CAST(8 * (doc_id % 3 + 1) AS INT) AS w,
      |                CAST(8 * (doc_id % 2 + 1) AS INT) AS h FROM documents),
      |s AS (SELECT doc_id, w, h, u.s AS s
      |      FROM d, unnest(generate_series(0, nv - 1)) AS u(s)),
      |px AS (
      |  SELECT doc_id, s, w, h, ux.x AS x, uy.y AS y,
      |         (doc_id * 29 + s * 13 + 41 * (ux.x // 8) + 97 * (uy.y // 8))
      |           % 256 AS g
      |  FROM s, unnest(generate_series(0, w - 1)) AS ux(x),
      |       unnest(generate_series(0, h - 1)) AS uy(y))
      |SELECT doc_id AS media_id,
      |  CAST((s // 2) * 1000 + (s % 2) * 40 AS BIGINT) AS ts_ticks,
      |  w AS width, h AS height,
      |  CAST(sum(g) AS BIGINT) AS gray_sum,
      |  CAST(sum((77 * g + 150 * g + 29 * g) // 256) AS BIGINT) AS luma_sum
      |FROM px GROUP BY doc_id, s, w, h
      |ORDER BY media_id, ts_ticks""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{JpegCodec, JpegPixels, Mkv, MkvBlocks}
      import graft.functions.Mkv.{MkvClusterSpec, MkvTrackSpec}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nv = (id % 5 + 2).toInt
          val w = (8 * (id % 3 + 1)).toInt
          val h = (8 * (id % 2 + 1)).toInt
          val frames = Array.tabulate(nv)(s =>
            JpegCodec.buildJpegGray(w, h) { (x, y) =>
              ((id * 29 + s * 13 + 41 * (x / 8) + 97 * (y / 8)) % 256).toInt
            })
          val clusters = (0 until (nv + 1) / 2).map { c =>
            MkvClusterSpec(c.toLong * 1000,
              (0 until 2).filter(j => c * 2 + j < nv)
                .map(j => (1, j * 40, frames(c * 2 + j))))
          }
          (id, Mkv.buildMkvBlocks("matroska", 1000000L, nv.toLong * 40,
            Seq(MkvTrackSpec(1, "video", "V_MJPEG", width = w, height = h)),
            clusters))
        }.toDF("media_id", "media")
      media
        .select(col("media_id"), col("media"),
          explode(MkvBlocks.mkvBlocks(col("media"))).as("b"))
        .select(col("media_id"), col("b.ts_ticks").as("ts_ticks"),
          JpegPixels.jpegPixels(
            expr("substring(media, CAST(b.offset AS INT) + 1, b.size)")).as("p"))
        .select(col("media_id"), col("ts_ticks"),
          col("p.width").as("width"), col("p.height").as("height"),
          col("p.sum_g").as("gray_sum"), col("p.luma_sum").as("luma_sum"))
        .orderBy("media_id", "ts_ticks")
  }

  /** x146: ID3 tag provenance + codec facts from ONE binary column — the
    * text-metadata face of audio triage: half the fixtures lead with a
    * full ID3v2 tag (v2.3/v2.4 round-robin, frame text in Latin-1,
    * UTF-16-with-BOM and UTF-8 — `id3_tags` must dispatch the per-frame
    * encoding byte and the version-dependent size field/year frame), half
    * trail with an ID3v1 `TAG` block; `audio_header` reads the SAME bytes
    * for the frame-walk duration (skipping the v2 tag / stopping at the
    * v1 trailer). The oracle recomputes every field, so the syncsafe vs
    * big-endian frame-size split and the three text encodings are all
    * load-bearing. */
  val x146 = DQ("x146_id3_provenance", Some(
    """SELECT doc_id AS media_id,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN
      |         CASE WHEN doc_id % 4 = 0 THEN 3 ELSE 4 END
      |       ELSE 1 END AS INT) AS tag_version,
      |  't' || CAST(doc_id AS VARCHAR) AS title,
      |  'artist' || CAST(doc_id % 50 AS VARCHAR) AS artist,
      |  'al' || CAST(doc_id % 20 AS VARCHAR) AS album,
      |  CAST(1970 + doc_id % 55 AS VARCHAR) AS year,
      |  'mp3' AS codec,
      |  CAST((n_chars % 30 + 1) * 1152 * 1000000 //
      |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 44100
      |            WHEN 1 THEN 48000 ELSE 32000 END AS BIGINT) AS duration_us
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{AudioHeader, AudioHeaders, Id3, Id3Tags}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars")))
        .as[(Long, Long)]
        .map { case (id, n) =>
          val music = AudioHeaders.buildMp3((id % 14 + 1).toInt, (id % 3).toInt,
            (n % 30 + 1).toInt, mono = id % 4 == 1)
          val title = s"t$id"; val artist = s"artist${id % 50}"
          val album = s"al${id % 20}"; val year = (1970 + id % 55).toString
          val payload =
            if (id % 2 == 0)
              Id3.buildV2(major = if (id % 4 == 0) 3 else 4,
                enc = (id % 3) match { case 0 => 0; case 1 => 1; case _ => 3 },
                title, artist, album, year, pad = (id % 40).toInt) ++ music
            else music ++ Id3.buildV1(title, artist, album, year)
          (id, payload)
        }.toDF("media_id", "media")
      media.select(col("media_id"),
          Id3Tags.id3Tags(col("media")).as("t"),
          AudioHeader.audioHeader(col("media")).as("a"))
        .select(col("media_id"),
          col("t.tag_version").as("tag_version"), col("t.title").as("title"),
          col("t.artist").as("artist"), col("t.album").as("album"),
          col("t.year").as("year"),
          col("a.codec").as("codec"), col("a.duration_us").as("duration_us"))
        .orderBy("media_id")
  }

  /** x147: SUBTITLE TEXT out of the container — a WebM with a video track
    * plus an `S_TEXT/UTF8` subtitle track whose SimpleBlocks carry real
    * UTF-8 cue text (multibyte characters included, so the byte-range
    * slice → string decode must be exact, not just ASCII-lucky). The plan
    * `mkv_blocks → filter(track 2) → substring → cast(string)` hands the
    * extracted cues straight to the TEXT pipeline (here: exact char
    * counts; in production: language-ID, quality scoring, dedup — the
    * same operators the documents table gets). Container walk and text
    * analytics in ONE declarative plan, zero temp files. */
  val x147 = DQ("x147_webm_subtitles", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS nc
      |           FROM documents),
      |s AS (SELECT doc_id, u.s AS s
      |      FROM d, unnest(generate_series(0, nc - 1)) AS u(s))
      |SELECT doc_id AS media_id,
      |  CAST(s * 2000 AS BIGINT) AS ts_ticks,
      |  'café ' || CAST(doc_id AS VARCHAR) || ' — cue ' || CAST(s AS VARCHAR)
      |    AS cue,
      |  CAST(length('café ' || CAST(doc_id AS VARCHAR) || ' — cue '
      |    || CAST(s AS VARCHAR)) AS INT) AS n_cue_chars
      |FROM s ORDER BY media_id, ts_ticks""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Mkv, MkvBlocks}
      import graft.functions.Mkv.{MkvClusterSpec, MkvTrackSpec}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nc = (id % 4 + 1).toInt
          val cues = (0 until nc).map(s =>
            s"café $id — cue $s".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // one cluster per cue at 2-second spacing; a tiny opaque video
          // block rides along in track 1 (subtitles never travel alone)
          val clusters = (0 until nc).map(s =>
            MkvClusterSpec(s.toLong * 2000, Seq(
              (1, 0, Array[Byte](9, 9, 9)),
              (2, 0, cues(s)))))
          (id, Mkv.buildMkvBlocks("webm", 1000000L, nc.toLong * 2000, Seq(
            MkvTrackSpec(1, "video", "V_VP9", width = 320, height = 180),
            MkvTrackSpec(2, "subtitle", "S_TEXT/UTF8")),
            clusters))
        }.toDF("media_id", "media")
      media
        .select(col("media_id"), col("media"),
          explode(MkvBlocks.mkvBlocks(col("media"))).as("b"))
        .filter(col("b.track_id") === 2)
        .select(col("media_id"), col("b.ts_ticks").as("ts_ticks"),
          expr("CAST(substring(media, CAST(b.offset AS INT) + 1, b.size) AS STRING)")
            .as("cue"))
        .select(col("media_id"), col("ts_ticks"), col("cue"),
          length(col("cue")).cast("int").as("n_cue_chars"))
        .orderBy("media_id", "ts_ticks")
  }

  /** x148: the ADMISSION STEP as a batch gate — the exact
    * [[graft.streaming.Pipelines.mediaTriage]] projection the streaming
    * ingest uses (one shared function, so the logic cannot drift between
    * modes), hash-gated over a mixed-container column: MP4 / WebM / JPEG /
    * WAV / tagged MP3 / plain text / ZIP / WARC (plain and member-gz)
    * round-robin by row, classified to kind/format/dims/duration/
    * provenance in one codegen'd pass — archives route by cheap magic
    * (`kind = 'archive'`) without paying for a full walk. At
    * 100 TB this is the first thing that touches a mixed media crawl —
    * partitioning it by modality before any codec runs — and here every
    * routing decision is oracle-recomputed, not just spec-asserted. */
  val x148 = DQ("x148_media_admission", Some(
    """SELECT doc_id AS media_id,
      |  CASE CAST(doc_id % 8 AS INT)
      |    WHEN 0 THEN 'video' WHEN 1 THEN 'video' WHEN 2 THEN 'image'
      |    WHEN 3 THEN 'audio' WHEN 4 THEN 'audio'
      |    WHEN 6 THEN 'archive' WHEN 7 THEN 'archive'
      |    ELSE 'unknown' END AS kind,
      |  CASE CAST(doc_id % 8 AS INT)
      |    WHEN 0 THEN 'isom' WHEN 1 THEN 'mkv' WHEN 2 THEN 'jpeg'
      |    WHEN 3 THEN 'wav' WHEN 4 THEN 'mp3'
      |    WHEN 6 THEN 'zip'
      |    WHEN 7 THEN CASE WHEN doc_id % 16 = 7 THEN 'warc' ELSE 'gz' END
      |    ELSE NULL END AS format,
      |  CAST(CASE WHEN doc_id % 8 = 2 THEN doc_id % 3000 + 1
      |       WHEN doc_id % 8 = 1 THEN doc_id % 640 + 16 END AS INT)
      |    AS width,
      |  CAST(CASE WHEN doc_id % 8 = 2 THEN doc_id % 2000 + 1
      |       WHEN doc_id % 8 = 1 THEN doc_id % 360 + 16 END AS INT)
      |    AS height,
      |  CAST(CASE CAST(doc_id % 8 AS INT)
      |    WHEN 0 THEN (doc_id % 5000 + 1) * 1000
      |    WHEN 1 THEN (doc_id % 5000 + 1) * 1000
      |    WHEN 3 THEN ((doc_id % 1000 + 1) * 4 * 8000000) // 256000
      |    WHEN 4 THEN (doc_id % 40 + 1) * 1152 * 1000000 //
      |      CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 44100
      |           WHEN 1 THEN 48000 ELSE 32000 END
      |    END AS BIGINT) AS duration_us,
      |  CASE WHEN doc_id % 8 = 4 THEN 'song' || CAST(doc_id AS VARCHAR) END
      |    AS title
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, AudioHeaders, Id3, ImageHeaders, Mkv, VideoHeaders, Warc}
      import graft.functions.Mkv.MkvTrackSpec
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val payload = (id % 8) match {
            case 0 => VideoHeaders.buildMp4("isom", 1000, (id % 5000 + 1).toInt,
              Array.fill[Byte](32)(id.toByte))
            case 1 => Mkv.buildMkv("webm", 1000000L, id % 5000 + 1, Seq(
              MkvTrackSpec(1, "video", "V_VP9",
                width = (id % 640 + 16).toInt, height = (id % 360 + 16).toInt)))
            case 2 => ImageHeaders.buildJpeg((id % 3000 + 1).toInt,
              (id % 2000 + 1).toInt, Array.fill[Byte](24)(3))
            case 3 => AudioHeaders.buildWav(2, 8000, 16,
              Array.tabulate(((id % 1000 + 1) * 4).toInt)(k => (k * 7).toByte))
            case 4 => Id3.buildV2(4, 3, s"song$id", s"who$id", "lp", "2010") ++
              AudioHeaders.buildMp3(9, (id % 3).toInt, (id % 40 + 1).toInt)
            case 6 => Archives.buildZip(Seq(
              ("a.txt", s"zip member $id".getBytes, id % 2 == 1)))
            case 7 =>
              val recs = Seq(("response", s"http://s$id.example/", null: String,
                s"warc body $id".getBytes))
              if (id % 16 == 7) Warc.build(recs) else Warc.buildGz(recs)
            case _ => s"just text, not a container $id".getBytes
          }
          (s"mem://$id", payload.length.toLong, payload)
        }.toDF("path", "length", "content")
      graft.streaming.Pipelines.mediaTriage(media)
        .withColumn("media_id",
          split(col("path"), "//").getItem(1).cast("long"))
        .select(col("media_id"), col("kind"), col("format"),
          col("width"), col("height"), col("duration_us"), col("title"))
        .orderBy("media_id")
  }

  /** x149: AUDIO SEGMENTATION — `pcm_frames` cuts each WAV's sample
    * stream into fixed 160-sample (20 ms @ 8 kHz) windows with
    * integer-exact per-window peak/energy, and a plain SQL threshold over
    * the exploded rows yields the VAD-style activity mask — silence
    * trimming / speech segmentation as a declarative plan over exact
    * integers (the oracle recomputes every window from the sample
    * formula, tail windows included, so the window arithmetic and the
    * 8-bit amplitude decode are both load-bearing). */
  val x149 = DQ("x149_pcm_segmentation", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 900 + 100 AS INT) AS nb
      |           FROM documents),
      |s AS (SELECT doc_id, u.j AS j,
      |        ((doc_id * 13 + u.j * 7) % 256) - 128 AS a
      |      FROM d, unnest(generate_series(0, nb - 1)) AS u(j)),
      |f AS (SELECT doc_id, CAST(j // 160 AS INT) AS frame_idx,
      |        CAST(count(*) AS BIGINT) AS n,
      |        CAST(max(abs(a)) AS INT) AS peak,
      |        CAST(sum(a * a) AS BIGINT) AS sum_sq
      |      FROM s GROUP BY 1, 2)
      |SELECT doc_id AS media_id, frame_idx, n, peak, sum_sq,
      |  (sum_sq >= n * 2000) AS active
      |FROM f ORDER BY media_id, frame_idx""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{AudioHeaders, PcmFrames}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nb = (id % 900 + 100).toInt
          (id, AudioHeaders.buildWav(1, 8000, 8,
            Array.tabulate(nb)(j => ((id * 13 + j * 7) % 256).toByte)))
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          explode(PcmFrames.pcmFrames(col("media"), lit(160))).as("f"))
        .select(col("media_id"), col("f.frame_idx").as("frame_idx"),
          col("f.n").as("n"), col("f.peak").as("peak"),
          col("f.sum_sq").as("sum_sq"),
          (col("f.sum_sq") >= col("f.n") * 2000).as("active"))
        .orderBy("media_id", "frame_idx")
  }

  /** x151: EXIF provenance extraction — the image-side twin of x146's ID3
    * provenance. Each document becomes a real baseline JPEG (x126's
    * invertible flat-gray construction) with an APP1 EXIF block built to
    * the TIFF 6.0 / EXIF 2.3 layouts: camera make/model, orientation,
    * capture timestamp, ISO in the Exif sub-IFD, and (for most rows) a
    * GPS IFD with degree/minute/second RATIONAL coordinates. Byte order
    * alternates II/MM by parity so both endiannesses stay exercised;
    * every 17th row has no EXIF at all (null struct) and every 13th has
    * EXIF but no GPS. The oracle recomputes every field from the
    * generator formulas — `exif_tags` must walk JPEG markers → APP1 →
    * IFD chain and land string/integer-exact (GPS as signed
    * centi-arcseconds, 1° = 360 000). Reference anchor: metadata
    * extraction hook, metadata_json_reproducer.py:74-93. */
  val x151 = DQ("x151_exif_provenance", Some(
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL
      |       WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL
      |       ELSE CAST(doc_id % 8 + 1 AS INT) END AS orientation,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL
      |       ELSE 'maker_' || CAST(doc_id % 5 AS VARCHAR) END AS make,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL
      |       ELSE 'model_' || CAST(doc_id % 11 AS VARCHAR) END AS model,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL
      |       ELSE printf('2024:%02d:%02d 08:30:%02d',
      |                   doc_id % 12 + 1, doc_id % 28 + 1, doc_id % 60)
      |  END AS datetime,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL
      |       ELSE CAST(100 * (doc_id % 7 + 1) AS INT) END AS iso,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL
      |       ELSE doc_id % 13 <> 0 END AS has_gps,
      |  CASE WHEN doc_id % 17 = 0 OR doc_id % 13 = 0 THEN NULL
      |       ELSE (CASE WHEN doc_id % 4 < 2 THEN 1 ELSE -1 END) *
      |            ((doc_id % 90) * 360000 + (doc_id % 60) * 6000
      |             + (doc_id * 37) % 6000) END AS lat_csec,
      |  CASE WHEN doc_id % 17 = 0 OR doc_id % 13 = 0 THEN NULL
      |       ELSE (CASE WHEN doc_id % 6 < 3 THEN 1 ELSE -1 END) *
      |            ((doc_id % 180) * 360000 + ((doc_id * 7) % 60) * 6000
      |             + (doc_id * 53) % 6000) END AS lon_csec
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Exif, ExifTags, JpegCodec}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val jpeg = JpegCodec.buildJpegGray(8, 8) { (_, _) =>
            ((id * 29 + 13) % 256).toInt
          }
          val payload =
            if (id % 17 == 0) jpeg // no EXIF at all
            else {
              val lat =
                if (id % 13 == 0) null
                else Exif.Dms(id % 4 < 2, (id % 90).toInt, (id % 60).toInt,
                  ((id * 37) % 6000).toInt, 100)
              val lon =
                if (id % 13 == 0) null
                else Exif.Dms(id % 6 < 3, (id % 180).toInt, ((id * 7) % 60).toInt,
                  ((id * 53) % 6000).toInt, 100)
              val tiff = Exif.buildTiff(littleEndian = id % 2 == 0,
                orientation = (id % 8 + 1).toInt,
                make = s"maker_${id % 5}", model = s"model_${id % 11}",
                datetime = f"2024:${id % 12 + 1}%02d:${id % 28 + 1}%02d 08:30:${id % 60}%02d",
                iso = (100 * (id % 7 + 1)).toInt, lat = lat, lon = lon)
              Exif.spliceApp1(jpeg, Exif.app1(tiff))
            }
          (id, payload)
        }.toDF("media_id", "media")
      media.select(col("media_id"), ExifTags.exifTags(col("media")).as("e"))
        .select(col("media_id"),
          col("e.byte_order").as("byte_order"),
          col("e.orientation").as("orientation"),
          col("e.make").as("make"), col("e.model").as("model"),
          col("e.datetime").as("datetime"), col("e.iso").as("iso"),
          col("e.has_gps").as("has_gps"),
          col("e.lat_csec").as("lat_csec"), col("e.lon_csec").as("lon_csec"))
        .orderBy("media_id")
  }

  /** x152: GPS REDACTION — image-side PII scrub, the multimodal twin of
    * x115's text PII pass. The x151 fixtures are scrubbed with
    * `exif_scrub_gps` (GPS-bearing JPEGs get their APP1 rebuilt as a
    * canonical allow-list TIFF: provenance tags kept, GPS and unknown
    * tags dropped, entropy-coded image data untouched), then AUDITED by
    * re-parsing the scrubbed bytes and re-decoding the pixels:
    * `gps_after` must be gone, orientation/make/ISO must survive
    * verbatim, the payload must shrink exactly when GPS was present, and
    * `jpeg_pixels` on the scrubbed image must still land the exact
    * flat-block luma sum (proof the redaction never touched image data).
    * Every routing decision is recomputed by the oracle from the
    * generator formulas. */
  val x152 = DQ("x152_exif_gps_scrub", Some(
    """SELECT doc_id AS media_id,
      |  (doc_id % 17 <> 0 AND doc_id % 13 <> 0) AS had_gps,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL ELSE FALSE END AS gps_after,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL
      |       ELSE CAST(doc_id % 8 + 1 AS INT) END AS orientation_after,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL
      |       ELSE 'maker_' || CAST(doc_id % 5 AS VARCHAR) END AS make_after,
      |  CASE WHEN doc_id % 17 = 0 THEN NULL
      |       ELSE CAST(100 * (doc_id % 7 + 1) AS INT) END AS iso_after,
      |  (doc_id % 17 <> 0 AND doc_id % 13 <> 0) AS shrunk,
      |  64 * ((doc_id * 29 + 13) % 256) AS luma_sum
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Exif, ExifScrubGps, ExifTags, JpegCodec, JpegPixels}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val jpeg = JpegCodec.buildJpegGray(8, 8) { (_, _) =>
            ((id * 29 + 13) % 256).toInt
          }
          val payload =
            if (id % 17 == 0) jpeg
            else {
              val lat =
                if (id % 13 == 0) null
                else Exif.Dms(id % 4 < 2, (id % 90).toInt, (id % 60).toInt,
                  ((id * 37) % 6000).toInt, 100)
              val lon =
                if (id % 13 == 0) null
                else Exif.Dms(id % 6 < 3, (id % 180).toInt, ((id * 7) % 60).toInt,
                  ((id * 53) % 6000).toInt, 100)
              val tiff = Exif.buildTiff(littleEndian = id % 2 == 0,
                orientation = (id % 8 + 1).toInt,
                make = s"maker_${id % 5}", model = s"model_${id % 11}",
                datetime = f"2024:${id % 12 + 1}%02d:${id % 28 + 1}%02d 08:30:${id % 60}%02d",
                iso = (100 * (id % 7 + 1)).toInt, lat = lat, lon = lon)
              Exif.spliceApp1(jpeg, Exif.app1(tiff))
            }
          (id, payload)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"), col("media"),
          ExifScrubGps.exifScrubGps(col("media")).as("clean"))
        .select(col("media_id"),
          coalesce(ExifTags.exifTags(col("media")).getField("has_gps"),
            lit(false)).as("had_gps"),
          ExifTags.exifTags(col("clean")).getField("has_gps").as("gps_after"),
          ExifTags.exifTags(col("clean")).getField("orientation")
            .as("orientation_after"),
          ExifTags.exifTags(col("clean")).getField("make").as("make_after"),
          ExifTags.exifTags(col("clean")).getField("iso").as("iso_after"),
          (length(col("media")) > length(col("clean"))).as("shrunk"),
          JpegPixels.jpegPixels(col("clean")).getField("luma_sum")
            .as("luma_sum"))
        .orderBy("media_id")
  }

  /** x153: IMAGE NEAR-DUP — perceptual aHash + banded Hamming join, the
    * picture-side twin of the text MinHash/SimHash family (x02/x03).
    * Documents become 64×64 images whose 8×8 grid cells follow a
    * per-group bit pattern (group = doc_id % 97) with 0–2 per-doc cell
    * flips — and every 5th document is a BMP rather than a JPEG of the
    * same picture, so the hash must be container-independent (defined on
    * decoded luma, not bytes). `image_ahash` → four 16-bit bands →
    * equi-join on (band, key) → Hamming ≤ 6 via bit_count(xor). The pair
    * space is Σbucket² over band buckets — the same no-all-pairs scaling
    * argument as the text near-dup family; the oracle replays the cell
    * formula bit-by-bit and applies the identical shared-band +
    * Hamming-threshold rule. */
  /** Shared x153/x153s fixture + signature stage: per-group cell
    * patterns rendered as JPEG (or BMP on every 5th doc), hashed with
    * `image_ahash`, exploded into four 16-bit bands. */
  private def ahashBands(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import graft.functions.{ImageAHash, ImageHeaders, JpegCodec}
    val media = spread(table(spark, dir, "documents").select(col("doc_id")))
      .as[Long]
      .map { id =>
        val gid = id % 97
        def on(k: Int): Boolean =
          (((gid * 131 + k * 31) % 101) < 43) ^ (k < id % 3)
        def gray(x: Int, y: Int): Int = {
          val k = (y / 8) * 8 + (x / 8)
          if (on(k)) 200 else 60
        }
        val payload =
          if (id % 5 == 0)
            ImageHeaders.buildBmp24(64, 64, topDown = id % 10 == 0) {
              (x, y) => val g = gray(x, y); (g, g, g)
            }
          else JpegCodec.buildJpegGray(64, 64)(gray)
        (id, payload)
      }.toDF("doc_id", "media")
    media
      .select(col("doc_id"), ImageAHash.imageAhash(col("media")).as("h"))
      .select(col("doc_id"), col("h"),
        explode(array((0 until 4).map(bd => struct(lit(bd).as("band"),
          shiftrightunsigned(col("h"), 16 * bd).bitwiseAND(lit(0xffffL))
            .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("h"), col("bk.band").as("band"),
        col("bk.key").as("key"))
  }

  val x153 = DQ("x153_image_neardup", Some(
    """WITH bits AS (
      |  SELECT doc_id, u.k AS k,
      |    CASE WHEN ((((doc_id % 97) * 131 + u.k * 31) % 101) < 43)
      |              <> (u.k < doc_id % 3) THEN 1 ELSE 0 END AS bit
      |  FROM documents, unnest(generate_series(0, 63)) AS u(k)),
      |agg AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.k // 16 AS band,
      |         sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS d
      |  FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3),
      |p AS (
      |  SELECT a_id, b_id, CAST(sum(d) AS INT) AS hamming,
      |         max(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS shared
      |  FROM agg GROUP BY 1, 2)
      |SELECT a_id, b_id, hamming FROM p WHERE shared = 1 AND hamming <= 6
      |ORDER BY a_id, b_id""".stripMargin)) {
    (spark, dir) =>
      val bands = ahashBands(spark, dir)
      bands.as("l")
        .join(bands.as("r"),
          col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
          bit_count(col("l.h").bitwiseXOR(col("r.h"))).cast("int").as("hamming"))
        .filter(col("hamming") <= 6)
        .distinct()
        .orderBy("a_id", "b_id")
  }

  /** x154: AUDIO FINGERPRINT DEDUP — the sound-side member of the
    * near-dup family (x02 text, x153 image), composed ENTIRELY from
    * x149's `pcm_frames` expression plus higher-order array functions:
    * zero new codec code. The fingerprint is the classic
    * energy-difference sign vector (the robust-hash shape used by
    * audio-matching systems): 33 windows of 160 samples → bit w set iff
    * energy(w) > energy(w+1), packed to a 32-bit key IN-ROW
    * (`aggregate(transform(...))` — no explode, no shuffle until the
    * cluster groupBy). Fixtures share a per-group base signal scaled by
    * a per-doc amplitude 1–4: energies scale by amp² so the sign vector
    * is VOLUME-INVARIANT and group members collide exactly — the audio
    * analog of x153's brightness invariance. Clustering is one groupBy
    * on the key (map-side combinable, no pair space at all); the oracle
    * replays windows, energies, sign bits and cluster stats from the
    * generator formulas. */
  val x154 = DQ("x154_audio_fingerprint", Some(
    """WITH d AS (SELECT doc_id, doc_id % 61 AS gid, doc_id % 4 + 1 AS amp
      |           FROM documents),
      |s AS (SELECT doc_id, amp, u.j // 160 AS w,
      |        ((gid * 17 + (u.j // 160) * 29 + u.j * 13) % 21) - 10 AS base
      |      FROM d, unnest(generate_series(0, 5279)) AS u(j)),
      |e AS (SELECT doc_id, w, sum((amp * base) * (amp * base)) AS energy
      |      FROM s GROUP BY 1, 2),
      |b AS (SELECT a.doc_id, a.w,
      |        CASE WHEN a.energy > n.energy THEN 1 ELSE 0 END AS bit
      |      FROM e a JOIN e n ON a.doc_id = n.doc_id AND n.w = a.w + 1
      |      WHERE a.w < 32),
      |f AS (SELECT doc_id,
      |        CAST(sum(bit * (CAST(1 AS BIGINT) << w)) AS BIGINT) AS fp
      |      FROM b GROUP BY 1),
      |c AS (SELECT fp AS fpv, count(*) AS n, min(doc_id) AS canon
      |      FROM f GROUP BY 1)
      |SELECT f.doc_id, f.fp, CAST(c.n AS BIGINT) AS cluster_size,
      |       (f.doc_id = c.canon) AS is_canonical
      |FROM f JOIN c ON f.fp = c.fpv ORDER BY f.doc_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{AudioHeaders, PcmFrames}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val gid = id % 61
          val amp = (id % 4 + 1).toInt
          val body = Array.tabulate(33 * 160) { j =>
            val base = ((gid * 17 + (j / 160) * 29 + j.toLong * 13) % 21 - 10).toInt
            (128 + amp * base).toByte
          }
          (id, AudioHeaders.buildWav(1, 8000, 8, body))
        }.toDF("doc_id", "media")
      val fps = media
        .select(col("doc_id"),
          PcmFrames.pcmFrames(col("media"), lit(160)).as("f"))
        .select(col("doc_id"), expr(
          """aggregate(
            |  transform(sequence(0, 31),
            |    w -> IF(f[w].sum_sq > f[w + 1].sum_sq,
            |            shiftleft(CAST(1 AS BIGINT), w), CAST(0 AS BIGINT))),
            |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin).as("fp"))
      val clusters = fps.groupBy("fp")
        .agg(count(lit(1)).as("cluster_size"), min("doc_id").as("canon"))
      fps.join(clusters, "fp")
        .select(col("doc_id"), col("fp"), col("cluster_size"),
          (col("doc_id") === col("canon")).as("is_canonical"))
        .orderBy("doc_id")
  }

  /** x155: MPEG-TS CONTAINER WALK — the broadcast/HLS container joins
    * the triage family (ISO-BMFF x133, Matroska x144). Documents become
    * genuine 188-byte-packet transport streams: a CRC_32/MPEG-protected
    * PAT (PID 0) pointing at a PMT (PID 32) that maps an H.264 PID
    * (0x100, type 0x1B) and an AAC PID (0x101, type 0x0F); per-doc
    * packet counts, PUSI cadence (every 4th packet), an injected
    * continuity-counter gap on every 9th doc, and every 11th doc is
    * non-TS junk that must route to zero rows. `ts_packets` must verify
    * the PSI CRCs, resolve PAT→PMT→stream types, and account per-PID
    * packets / payload starts / CC errors exactly as the oracle
    * recomputes them from the generator formulas. */
  val x155 = DQ("x155_mpegts_walk", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 7 + 3 AS BIGINT) AS nv,
      |                  CAST(doc_id % 5 + 2 AS BIGINT) AS na
      |           FROM documents WHERE doc_id % 11 <> 0),
      |r AS (
      |  SELECT doc_id, 0 AS pid, NULL AS stream_type, CAST(1 AS BIGINT) AS packets,
      |         CAST(1 AS BIGINT) AS payload_starts, CAST(0 AS BIGINT) AS cc_errors
      |  FROM d
      |  UNION ALL
      |  SELECT doc_id, 32, NULL, 1, 1, 0 FROM d
      |  UNION ALL
      |  SELECT doc_id, 256, 27, nv, (nv - 1) // 4 + 1,
      |         CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END
      |  FROM d
      |  UNION ALL
      |  SELECT doc_id, 257, 15, na, (na - 1) // 4 + 1, 0 FROM d)
      |SELECT doc_id AS media_id, CAST(pid AS INT) AS pid,
      |  CAST(stream_type AS INT) AS stream_type,
      |  CAST(packets AS BIGINT) AS packets,
      |  CAST(payload_starts AS BIGINT) AS payload_starts,
      |  CAST(cc_errors AS BIGINT) AS cc_errors
      |FROM r ORDER BY media_id, pid""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{MpegTs, TsPackets}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val payload: Array[Byte] =
            if (id % 11 == 0) s"not a transport stream $id".getBytes
            else {
              val nv = (id % 7 + 3).toInt
              val na = (id % 5 + 2).toInt
              val out = new java.io.ByteArrayOutputStream()
              out.write(MpegTs.patPacket(progNum = 1, pmtPid = 32))
              out.write(MpegTs.pmtPacket(pmtPid = 32, progNum = 1,
                streams = Seq((0x1b, 0x100), (0x0f, 0x101))))
              var j = 0
              while (j < nv) {
                // every 9th doc skips one continuity step at packet 2
                val cc = (if (id % 9 == 0 && j >= 2) j + 1 else j) & 0x0f
                out.write(MpegTs.packet(0x100, pusi = j % 4 == 0, cc,
                  Array.tabulate(32)(k => ((id + j + k) % 256).toByte)))
                j += 1
              }
              j = 0
              while (j < na) {
                out.write(MpegTs.packet(0x101, pusi = j % 4 == 0, j,
                  Array.tabulate(16)(k => ((id * 3 + j + k) % 256).toByte)))
                j += 1
              }
              out.toByteArray
            }
          (id, payload)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          explode(TsPackets.tsPackets(col("media"))).as("p"))
        .select(col("media_id"), col("p.pid").as("pid"),
          col("p.stream_type").as("stream_type"),
          col("p.packets").as("packets"),
          col("p.payload_starts").as("payload_starts"),
          col("p.cc_errors").as("cc_errors"))
        .orderBy("media_id", "pid")
  }

  /** x156: TS PES DEMUX — x155's packet walk carried to the media data,
    * the transport-stream twin of x135's ISO-BMFF sample slicing. Each
    * stream's PES units (start-code detection on payload-unit-start
    * packets, 33-bit 90 kHz PTS headers, adaptation-field stuffing on
    * the final short packet) are reassembled per PID into the
    * elementary-stream bytes; md5 over the reassembled ES proves the
    * demux byte-exact, and the PTS envelope (first/last across units,
    * video on a 3003-tick cadence ≈ 29.97 fps, audio on 1920) proves
    * the header parse. Video unit 0 deliberately spans two packets so
    * continuation reassembly is on the hook; every 11th doc is non-TS
    * junk routing to zero rows. Oracle recomputes unit payloads, PTS
    * endpoints, byte counts and md5 from the generator formulas. */
  val x156 = DQ("x156_ts_pes_demux", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 4 + 2 AS INT) AS nuv,
      |                  CAST(doc_id % 3 + 1 AS INT) AS nua
      |           FROM documents WHERE doc_id % 11 <> 0),
      |vu AS (SELECT doc_id, u.u AS u,
      |         CASE WHEN u.u = 0 THEN repeat('v', CAST(200 + doc_id % 50 AS INT))
      |              ELSE 'v' || CAST(doc_id AS VARCHAR) || ':' ||
      |                   CAST(u.u AS VARCHAR) ||
      |                   repeat('y', CAST(u.u + doc_id % 7 AS INT)) END AS pl
      |       FROM d, unnest(generate_series(0, nuv - 1)) AS u(u)),
      |au AS (SELECT doc_id, u.u AS u,
      |         'a' || CAST(doc_id AS VARCHAR) || ':' || CAST(u.u AS VARCHAR) AS pl
      |       FROM d, unnest(generate_series(0, nua - 1)) AS u(u)),
      |r AS (
      |  SELECT d.doc_id, 256 AS pid, nuv AS n_units,
      |         (d.doc_id % 1000) * 90 AS first_pts,
      |         (d.doc_id % 1000) * 90 + (nuv - 1) * 3003 AS last_pts,
      |         s.bytes AS es_bytes, s.m AS es_md5
      |  FROM d JOIN (SELECT doc_id, CAST(sum(length(pl)) AS BIGINT) AS bytes,
      |                      md5(string_agg(pl, '' ORDER BY u)) AS m
      |               FROM vu GROUP BY doc_id) s USING (doc_id)
      |  UNION ALL
      |  SELECT d.doc_id, 257, nua,
      |         (d.doc_id % 800) * 90,
      |         (d.doc_id % 800) * 90 + (nua - 1) * 1920,
      |         s.bytes, s.m
      |  FROM d JOIN (SELECT doc_id, CAST(sum(length(pl)) AS BIGINT) AS bytes,
      |                      md5(string_agg(pl, '' ORDER BY u)) AS m
      |               FROM au GROUP BY doc_id) s USING (doc_id))
      |SELECT doc_id AS media_id, CAST(pid AS INT) AS pid,
      |  CAST(n_units AS INT) AS n_units, CAST(first_pts AS BIGINT) AS first_pts,
      |  CAST(last_pts AS BIGINT) AS last_pts, es_bytes, es_md5
      |FROM r ORDER BY media_id, pid""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{MpegTs, TsPes}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val payload: Array[Byte] =
            if (id % 11 == 0) s"still not a transport stream $id".getBytes
            else {
              val nuV = (id % 4 + 2).toInt
              val nuA = (id % 3 + 1).toInt
              val out = new java.io.ByteArrayOutputStream()
              out.write(MpegTs.patPacket(progNum = 1, pmtPid = 32))
              out.write(MpegTs.pmtPacket(pmtPid = 32, progNum = 1,
                streams = Seq((0x1b, 0x100), (0x0f, 0x101))))
              var cc = 0
              for (u <- 0 until nuV) {
                val pl: Array[Byte] =
                  if (u == 0) Array.fill((200 + id % 50).toInt)('v'.toByte)
                  else (s"v$id:$u" + "y" * (u + id % 7).toInt).getBytes
                val (pk, cc2) = MpegTs.pesPackets(0x100, cc,
                  MpegTs.pesBytes(0xe0, (id % 1000) * 90 + u * 3003L, pl))
                out.write(pk); cc = cc2
              }
              cc = 0
              for (u <- 0 until nuA) {
                val (pk, cc2) = MpegTs.pesPackets(0x101, cc,
                  MpegTs.pesBytes(0xc0, (id % 800) * 90 + u * 1920L,
                    s"a$id:$u".getBytes))
                out.write(pk); cc = cc2
              }
              out.toByteArray
            }
          (id, payload)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"), explode(TsPes.tsPes(col("media"))).as("p"))
        .select(col("media_id"), col("p.pid").as("pid"),
          col("p.n_units").as("n_units"),
          col("p.first_pts").as("first_pts"), col("p.last_pts").as("last_pts"),
          length(col("p.es")).cast("long").as("es_bytes"),
          md5(col("p.es")).as("es_md5"))
        .orderBy("media_id", "pid")
  }

  /** x157: TS → ANNEX-B → SPS, the full broadcast-video interrogation
    * chain composed from three expressions with no new codec code:
    * `ts_pes` demuxes the elementary stream, `annexb_nals` splits the
    * H.264 Annex-B framing (start codes, framing-zero trim — the layout
    * TS carries, vs MP4's length prefixes), and `h264_sps_meta` runs the
    * Exp-Golomb SPS parse (x136's machinery) on the bare SPS NAL. The
    * SPS uses the same level/crop formulas as x136 so the coded-dims
    * arithmetic is cross-checked between the avcC and Annex-B paths;
    * every 13th doc carries a non-Annex-B elementary stream that must
    * route every derived column to null. */
  val x157 = DQ("x157_ts_h264_chain", Some(
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 13 = 0 THEN NULL
      |       ELSE CAST(doc_id % 6 + 3 AS INT) END AS n_nals,
      |  CASE WHEN doc_id % 13 = 0 THEN NULL
      |       ELSE CAST(doc_id % 6 + 1 AS INT) END AS n_slices,
      |  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(66 AS INT) END AS profile,
      |  CASE WHEN doc_id % 13 = 0 THEN NULL
      |       ELSE CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 10 WHEN 1 THEN 30
      |                 WHEN 2 THEN 31 ELSE 51 END AS INT) END AS level,
      |  CASE WHEN doc_id % 13 = 0 THEN NULL
      |       ELSE CAST(16 * (doc_id % 20 + 1) - 2 * (doc_id % 4) AS INT)
      |  END AS width,
      |  CASE WHEN doc_id % 13 = 0 THEN NULL
      |       ELSE CAST(16 * (doc_id % 12 + 1) - 2 * (doc_id % 3) AS INT)
      |  END AS height
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{AnnexbNals, H264, H264SpsMeta, MpegTs, TsPes}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val sc3 = Array[Byte](0, 0, 1)
          val sc4 = Array[Byte](0, 0, 0, 1)
          val es: Array[Byte] =
            if (id % 13 == 0) s"rawvideo$id with no start codes".getBytes
            else {
              val level = (id % 4) match {
                case 0 => 10; case 1 => 30; case 2 => 31; case _ => 51
              }
              val sps = H264.buildSps(level, (id % 20 + 1).toInt,
                (id % 12 + 1).toInt, (id % 4).toInt, (id % 3).toInt)
              val pps = 0x68.toByte +: Array.tabulate((id % 5 + 1).toInt)(
                k => ((id + k) % 200 + 30).toByte)
              val slices = (0 until (id % 6 + 1).toInt).map { s =>
                0x21.toByte +: Array.tabulate((id % 9 + 4).toInt)(
                  k => ((id * 3 + s + k) % 200 + 30).toByte)
              }
              (sc4 ++ sps ++ sc3 ++ pps ++
                slices.flatMap(s => sc3 ++ s)).toArray
            }
          val out = new java.io.ByteArrayOutputStream()
          out.write(MpegTs.patPacket(progNum = 1, pmtPid = 32))
          out.write(MpegTs.pmtPacket(pmtPid = 32, progNum = 1,
            streams = Seq((0x1b, 0x100))))
          val (pk, _) = MpegTs.pesPackets(0x100, 0,
            MpegTs.pesBytes(0xe0, (id % 1000) * 90, es))
          out.write(pk)
          (id, out.toByteArray)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"), TsPes.tsPes(col("media")).as("pes"))
        .select(col("media_id"),
          AnnexbNals.annexbNals(expr("filter(pes, p -> p.pid = 256)[0].es"))
            .as("nals"))
        .select(col("media_id"),
          when(col("nals").isNotNull, size(col("nals"))).as("n_nals"),
          when(col("nals").isNotNull,
            size(expr("filter(nals, n -> n.nal_type = 1)"))).as("n_slices"),
          H264SpsMeta.h264SpsMeta(
            expr("filter(nals, n -> n.nal_type = 7)[0].payload")).as("m"))
        .select(col("media_id"), col("n_nals"), col("n_slices"),
          col("m.profile").as("profile"), col("m.level").as("level"),
          col("m.width").as("width"), col("m.height").as("height"))
        .orderBy("media_id")
  }

  /** x158: PRIVACY GATE AS A SHARED PROJECTION — x152's scrub logic
    * promoted to ingest: the SAME `Pipelines.privacyScrub` function runs
    * under `readStream` (PrivacyScrubStreamSpec) and here as the batch
    * gate, so the two modes cannot drift (the x148 pattern applied to
    * PII). The fixture matrix adds the quarantine path: every 23rd doc
    * is a GPS-bearing bare TIFF the scrubber cannot rewrite safely —
    * content must come back null with the flag set (absence, never
    * silently retained coordinates); JPEGs with GPS shrink, without GPS
    * pass through, and `gps_after` re-parses the emitted bytes in-plan.
    * Oracle recomputes every routing decision from the fixture
    * formulas. */
  val x158 = DQ("x158_privacy_gate", Some(
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 23 = 0 THEN TRUE
      |       WHEN doc_id % 17 = 0 THEN FALSE
      |       WHEN doc_id % 13 = 0 THEN FALSE ELSE TRUE END AS had_gps,
      |  (doc_id % 23 = 0) AS quarantined,
      |  CASE WHEN doc_id % 23 = 0 THEN NULL ELSE FALSE END AS gps_after,
      |  CASE WHEN doc_id % 23 = 0 THEN NULL
      |       WHEN doc_id % 17 = 0 OR doc_id % 13 = 0 THEN FALSE
      |       ELSE TRUE END AS shrunk
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Exif, JpegCodec}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          def lat = Exif.Dms(id % 4 < 2, (id % 90).toInt, (id % 60).toInt,
            ((id * 37) % 6000).toInt, 100)
          def lon = Exif.Dms(id % 6 < 3, (id % 180).toInt, ((id * 7) % 60).toInt,
            ((id * 53) % 6000).toInt, 100)
          def tiff(withGps: Boolean) = Exif.buildTiff(
            littleEndian = id % 2 == 0, orientation = (id % 8 + 1).toInt,
            make = s"maker_${id % 5}", model = s"model_${id % 11}",
            datetime = f"2024:${id % 12 + 1}%02d:${id % 28 + 1}%02d 08:30:${id % 60}%02d",
            iso = (100 * (id % 7 + 1)).toInt,
            lat = if (withGps) lat else null, lon = if (withGps) lon else null)
          val jpeg = JpegCodec.buildJpegGray(8, 8) { (_, _) =>
            ((id * 29 + 13) % 256).toInt
          }
          val payload: Array[Byte] =
            if (id % 23 == 0) tiff(withGps = true) // quarantine path
            else if (id % 17 == 0) jpeg // no EXIF
            else if (id % 13 == 0) Exif.spliceApp1(jpeg, Exif.app1(tiff(withGps = false)))
            else Exif.spliceApp1(jpeg, Exif.app1(tiff(withGps = true)))
          (s"mem://$id", payload.length.toLong, payload)
        }.toDF("path", "length", "content")
      graft.streaming.Pipelines.privacyScrub(media)
        .withColumn("media_id",
          split(col("path"), "//").getItem(1).cast("long"))
        .select(col("media_id"), col("had_gps"), col("quarantined"),
          col("gps_after"),
          (col("length") > length(col("content"))).as("shrunk"))
        .orderBy("media_id")
  }

  /** x153s: IMAGE DEDUP, THE SCALE PATH — x153 emits every near-dup
    * PAIR, which is inherently quadratic in duplicate-cluster size (a
    * corpus whose clusters grow with corpus size makes any pair list
    * superlinear, regardless of algorithm). The survivors form replaces
    * pairs with STAR EDGES: each LSH bucket contributes one edge per
    * member to the bucket minimum (≤ 4 edges/doc — linear), and
    * `Components.minLabelFixpoint` (x37's machinery) closes the bucket
    * graph so chained duplicates (A~B, B~C, A∦C) land one canonical.
    * Bucket collisions define candidate clusters (recall side); x153's
    * Hamming residual remains the precision check. The oracle replays
    * the same star edges and closes them with a recursive CTE. Same
    * x110 → x110s precedent: the measured-scale variant of the operator
    * family. */
  val x153s = DQ("x153s_image_dedup_scale", Some(
    """WITH RECURSIVE
      |bits AS (
      |  SELECT doc_id, u.k AS k,
      |    CASE WHEN ((((doc_id % 97) * 131 + u.k * 31) % 101) < 43)
      |              <> (u.k < doc_id % 3) THEN 1 ELSE 0 END AS bit
      |  FROM documents, unnest(generate_series(0, 63)) AS u(k)),
      |bands AS (
      |  SELECT doc_id, k // 16 AS band,
      |         CAST(sum(bit * (1 << (k % 16))) AS BIGINT) AS bkey
      |  FROM bits GROUP BY 1, 2),
      |bmin AS (SELECT band, bkey, min(doc_id) AS root
      |         FROM bands GROUP BY 1, 2),
      |e0 AS (SELECT DISTINCT b.doc_id AS src, m.root AS dst
      |       FROM bands b JOIN bmin m USING (band, bkey)
      |       WHERE b.doc_id <> m.root),
      |edges AS (SELECT src, dst FROM e0
      |          UNION SELECT dst AS src, src AS dst FROM e0),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM documents
      |  UNION
      |  SELECT reach.id, e.dst AS r FROM reach, edges e WHERE e.src = reach.r),
      |lab AS (SELECT id, min(r) AS rep FROM reach GROUP BY id),
      |cs AS (SELECT rep, count(*) AS n FROM lab GROUP BY rep)
      |SELECT lab.id AS doc_id, lab.rep AS canon,
      |       CAST(cs.n AS BIGINT) AS cluster_size,
      |       (lab.id = lab.rep) AS is_canonical
      |FROM lab JOIN cs USING (rep) ORDER BY doc_id""".stripMargin)) {
    (spark, dir) =>
      // one materialization of the (doc, band, key) table: its lineage is
      // the full JPEG/BMP body decode, and it feeds the bucket minima,
      // the star-edge join AND the node set — localCheckpoint keeps the
      // decode to a single pass (per-invocation; recomputed every run)
      val bands = ahashBands(spark, dir).localCheckpoint()
      val bucketMin = bands.groupBy("band", "key")
        .agg(min("doc_id").as("root"))
      val e0 = bands.join(bucketMin, Seq("band", "key"))
        .filter(col("doc_id") =!= col("root"))
        .select(col("doc_id").as("src"), col("root").as("dst"))
        .distinct()
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      val nodes = bands.select(col("doc_id").as("id")).distinct()
      // cross-group band aliasing chains buckets into long paths, so the
      // bucket graph's diameter can exceed the default 20 rounds
      val labels = graft.batch.Components.minLabelFixpoint(nodes, edges,
        maxIter = 100)
      val clusters = labels.groupBy("rep").agg(count(lit(1)).as("cluster_size"))
      labels.join(clusters, "rep")
        .select(col("id").as("doc_id"), col("rep").as("canon"),
          col("cluster_size"), (col("id") === col("rep")).as("is_canonical"))
        .orderBy("doc_id")
  }

  /** x159: WARC INGEST — the actual container a crawl corpus arrives in
    * (ISO 28500): version line, CRLF headers, Content-Length-framed
    * payload, CRLF CRLF trailer; `.warc.gz` ships one gzip member per
    * record and the JDK's GZIPInputStream consumes the concatenation
    * natively, so every third doc's archive is member-gzipped and must
    * parse identically to its plain twin. Each doc becomes a warcinfo +
    * request/response conversation; `warc_records` must recover type,
    * target URI, date and the EXACT payload bytes (md5-proven) from the
    * declared-length framing. One corrupt length poisons everything
    * after it, so malformed streams route to null whole. */
  /** Shared x159/x161 fixture: each doc becomes a WARC archive whose
    * target URIs are `site{doc_id%50}.example/p{r}` — deliberately
    * SHARED across docs in the same site group, so URL-level dedup has
    * real duplicates to find. Every third doc is member-gzipped. */
  private def warcFixture(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import graft.functions.Warc
    spread(table(spark, dir, "documents").select(col("doc_id")))
      .as[Long]
      .map { id =>
        val dt = f"2024-${id % 12 + 1}%02d-01T00:00:00Z"
        val recs = Seq(("warcinfo", null: String, dt,
          s"software: graft $id".getBytes)) ++
          (0 until (id % 4 + 1).toInt).flatMap { r =>
            val uri = s"http://site${id % 50}.example/p$r"
            Seq(
              ("request", uri, dt, s"GET /p$r HTTP/1.1".getBytes),
              ("response", uri, dt,
                s"<html><body>doc $id page $r</body></html>".getBytes))
          }
        val payload =
          if (id % 3 == 0) Warc.buildGz(recs) else Warc.build(recs)
        (id, payload)
      }.toDF("media_id", "media")
  }

  val x159 = DQ("x159_warc_ingest", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS nr,
      |                  printf('2024-%02d-01T00:00:00Z', doc_id % 12 + 1) AS dt
      |           FROM documents),
      |recs AS (
      |  SELECT doc_id, 0 AS rec_idx, 'warcinfo' AS rec_type,
      |         CAST(NULL AS VARCHAR) AS uri, dt,
      |         'software: graft ' || CAST(doc_id AS VARCHAR) AS pl
      |  FROM d
      |  UNION ALL
      |  SELECT doc_id, 2 * u.r + 1, 'request',
      |         'http://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/p'
      |           || CAST(u.r AS VARCHAR),
      |         dt, 'GET /p' || CAST(u.r AS VARCHAR) || ' HTTP/1.1'
      |  FROM d, unnest(generate_series(0, nr - 1)) AS u(r)
      |  UNION ALL
      |  SELECT doc_id, 2 * u.r + 2, 'response',
      |         'http://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/p'
      |           || CAST(u.r AS VARCHAR),
      |         dt, '<html><body>doc ' || CAST(doc_id AS VARCHAR) || ' page '
      |           || CAST(u.r AS VARCHAR) || '</body></html>'
      |  FROM d, unnest(generate_series(0, nr - 1)) AS u(r))
      |SELECT doc_id AS media_id, CAST(rec_idx AS INT) AS rec_idx, rec_type,
      |  uri, dt AS date, CAST(length(pl) AS BIGINT) AS content_length,
      |  md5(pl) AS payload_md5
      |FROM recs ORDER BY media_id, rec_idx""".stripMargin)) {
    (spark, dir) =>
      import graft.functions.WarcRecords
      warcFixture(spark, dir)
        .select(col("media_id"),
          posexplode(WarcRecords.warcRecords(col("media"))).as(Seq("rec_idx", "p")))
        .select(col("media_id"), col("rec_idx").cast("int").as("rec_idx"),
          col("p.rec_type").as("rec_type"), col("p.uri").as("uri"),
          col("p.date").as("date"),
          col("p.content_length").as("content_length"),
          md5(col("p.payload")).as("payload_md5"))
        .orderBy("media_id", "rec_idx")
  }

  /** x160: WARC → HTML → MAIN TEXT — the crawl text front door composed
    * end-to-end: `warc_records` opens the archive, the response
    * payloads are real HTML pages, and a declarative strip chain
    * (script/style removal, tag→space, entity decode, whitespace
    * collapse — all codegen'd regexp/string builtins, no UDF; the
    * `Pipelines.htmlMainText` projection, shared verbatim with the
    * streaming `warcTextStream` ingest) yields
    * the text the rest of the pipeline (dedup, language-ID, quality)
    * consumes, plus the classic quality signals: title, text length,
    * link count, text-to-markup ratio. The oracle states the EXPECTED
    * text by construction (it never runs a regex), so the Spark chain
    * must land string-exact — boilerplate removal as a verified
    * operator, not a heuristic. */
  val x160 = DQ("x160_warc_html_text", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 5 AS INT) AS nl,
      |                  CAST(doc_id % 7 AS INT) AS hd FROM documents),
      |l AS (SELECT doc_id,
      |        string_agg('link' || CAST(u.r AS VARCHAR), ' ' ORDER BY u.r) AS links,
      |        string_agg('<a href="/l' || CAST(u.r AS VARCHAR) || '">link'
      |          || CAST(u.r AS VARCHAR) || '</a>', ' ' ORDER BY u.r) AS links_html
      |      FROM d, unnest(generate_series(0, nl - 1)) AS u(r) GROUP BY doc_id),
      |h AS (SELECT d.doc_id, d.nl, d.hd,
      |        'Doc ' || CAST(d.doc_id AS VARCHAR) AS title,
      |        'Doc ' || CAST(d.doc_id AS VARCHAR) || ' Heading '
      |          || CAST(d.hd AS VARCHAR) || ' Paragraph for document '
      |          || CAST(d.doc_id AS VARCHAR) || ' & more <stuff>.'
      |          || CASE WHEN d.nl = 0 THEN '' ELSE ' ' || l.links END AS text,
      |        '<html><head><title>Doc ' || CAST(d.doc_id AS VARCHAR)
      |          || '</title><style>body{color:red}</style></head><body>'
      |          || '<script>var x = ' || CAST(d.doc_id AS VARCHAR)
      |          || ';</script><h1>Heading ' || CAST(d.hd AS VARCHAR)
      |          || '</h1><p>Paragraph   for document ' || CAST(d.doc_id AS VARCHAR)
      |          || ' &amp; more &lt;stuff&gt;.</p>'
      |          || COALESCE(l.links_html, '') || '</body></html>' AS html
      |      FROM d LEFT JOIN l ON d.doc_id = l.doc_id)
      |SELECT doc_id AS media_id, title, text,
      |  CAST(length(text) AS INT) AS text_len,
      |  CAST(nl AS INT) AS link_count,
      |  CAST((100 * length(text)) // length(html) AS INT) AS text_ratio_pct
      |FROM h ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Warc, WarcRecords}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nl = (id % 5).toInt
          val links = (0 until nl)
            .map(r => s"""<a href="/l$r">link$r</a>""").mkString(" ")
          val html = "<html><head><title>Doc " + id +
            "</title><style>body{color:red}</style></head><body>" +
            "<script>var x = " + id + ";</script><h1>Heading " + (id % 7) +
            "</h1><p>Paragraph   for document " + id +
            " &amp; more &lt;stuff&gt;.</p>" + links + "</body></html>"
          val uri = s"http://site${id % 50}.example/page"
          (id, Warc.build(Seq(
            ("warcinfo", null, "2024-06-01T00:00:00Z", s"graft $id".getBytes),
            ("response", uri, "2024-06-01T00:00:00Z", html.getBytes))))
        }.toDF("media_id", "media")
      graft.streaming.Pipelines.htmlMainText(media
          .select(col("media_id"),
            explode(WarcRecords.warcRecords(col("media"))).as("p"))
          .filter(col("p.rec_type") === "response")
          .select(col("media_id"), col("p.payload").cast("string").as("html")))
        .select(col("media_id"), col("title"), col("text"), col("text_len"),
          col("link_count"),
          expr("(100 * length(text)) div length(html)").cast("int")
            .as("text_ratio_pct"))
        .orderBy("media_id")
  }

  /** x161: URL-LEVEL DEDUP — the curation step that runs BEFORE content
    * dedup in every crawl pipeline: many docs re-crawl the same target
    * URI (the fixture shares `site{gid}/p{r}` across the docs of a
    * site group), so the first exact-key pass groups by URI and keeps
    * the earliest capture as canonical. Composed from `warc_records` +
    * Spark's built-in `parse_url` (HOST extraction, codegen'd — no
    * UDF); one map-side-combinable groupBy, no pair space. The oracle
    * recomputes copies/canonical per (site, page) from the fixture
    * formulas. */
  val x161 = DQ("x161_url_dedup", Some(
    """WITH d AS (SELECT doc_id, doc_id % 50 AS gid,
      |                  CAST(doc_id % 4 + 1 AS INT) AS nr FROM documents),
      |p AS (SELECT doc_id, gid, u.r AS r
      |      FROM d, unnest(generate_series(0, nr - 1)) AS u(r)),
      |a AS (SELECT gid, r, count(*) AS n, min(doc_id) AS canonical
      |      FROM p GROUP BY 1, 2)
      |SELECT 'http://site' || CAST(gid AS VARCHAR) || '.example/p'
      |         || CAST(r AS VARCHAR) AS uri,
      |       'site' || CAST(gid AS VARCHAR) || '.example' AS domain,
      |       CAST(n AS BIGINT) AS n_copies, canonical
      |FROM a ORDER BY uri""".stripMargin)) {
    (spark, dir) =>
      import graft.functions.WarcRecords
      warcFixture(spark, dir)
        .select(col("media_id"),
          explode(WarcRecords.warcRecords(col("media"))).as("p"))
        .filter(col("p.rec_type") === "response")
        .select(col("media_id"), col("p.uri").as("uri"))
        .groupBy("uri")
        .agg(count(lit(1)).as("n_copies"), min("media_id").as("canonical"))
        .select(col("uri"), expr("parse_url(uri, 'HOST')").as("domain"),
          col("n_copies"), col("canonical"))
        .orderBy("uri")
  }

  /** x162: ZIP ARCHIVE TRIAGE — central-directory-driven walk
    * (EOCD-first, the APPNOTE discipline; local-header scans false-sync
    * on self-extracting/embedded zips), each entry decompressed (raw
    * Inflate for method 8, store for 0) and verified against the
    * recorded CRC-32 and size. Every 19th doc has its first entry's
    * data corrupted post-build: accounting survives, `crc_ok` drops to
    * false, and the payload is withheld (null md5) — never wrong bytes
    * downstream. The oracle recomputes names, methods, sizes, routing
    * and payload md5s from the generator formulas. */
  val x162 = DQ("x162_zip_triage", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS nz
      |           FROM documents),
      |e AS (SELECT doc_id, u.e AS e,
      |        'payload ' || CAST(doc_id AS VARCHAR) || ':' || CAST(u.e AS VARCHAR)
      |          || ':' || repeat('z', CAST(doc_id % 40 + u.e AS INT)) AS pl,
      |        (doc_id % 19 = 0 AND u.e = 0) AS corrupt
      |      FROM d, unnest(generate_series(0, nz - 1)) AS u(e))
      |SELECT doc_id AS media_id, CAST(e AS INT) AS idx,
      |  'f' || CAST(e AS VARCHAR) || '.txt' AS name,
      |  CAST(CASE WHEN (doc_id + e) % 2 = 0 THEN 8 ELSE 0 END AS INT) AS method,
      |  CAST(length(pl) AS BIGINT) AS usize,
      |  NOT corrupt AS crc_ok,
      |  CASE WHEN corrupt THEN NULL ELSE md5(pl) END AS payload_md5
      |FROM e ORDER BY media_id, idx""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, ZipEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nz = (id % 4 + 1).toInt
          val entries = (0 until nz).map { e =>
            (s"f$e.txt",
              (s"payload $id:$e:" + "z" * ((id % 40).toInt + e)).getBytes,
              (id + e) % 2 == 0)
          }
          val zip = Archives.buildZip(entries)
          if (id % 19 == 0) {
            // entry 0's local header sits at offset 0; name "f0.txt" is 6
            // bytes, so its data starts at 30 + 6 = 36. XOR the BTYPE
            // bits (0x06), not BFINAL (0x01): flipping BFINAL on a
            // single-block deflate stream decodes to identical bytes, so
            // the CRC would still verify
            zip(36) = (zip(36) ^ 0x06).toByte
          }
          (id, zip)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          posexplode(ZipEntries.zipEntries(col("media"))).as(Seq("idx", "p")))
        .select(col("media_id"), col("idx").cast("int").as("idx"),
          col("p.name").as("name"), col("p.method").as("method"),
          col("p.usize").as("usize"), col("p.crc_ok").as("crc_ok"),
          md5(col("p.payload")).as("payload_md5"))
        .orderBy("media_id", "idx")
  }

  /** x163: TAR (ustar) TRIAGE — 512-byte headers with their own
    * checksums (byte sum, checksum field blanked), octal sizes, 512
    * rounding, directory typeflags, two-zero-block terminator. Each
    * archive carries a directory entry plus its files; payload md5s
    * prove byte-exact slicing (a directory's empty payload hashes to
    * the canonical empty-string md5 on both sides). */
  val x163 = DQ("x163_tar_triage", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS nf
      |           FROM documents),
      |r AS (
      |  SELECT doc_id, 0 AS idx, 'docs/' AS name, '5' AS typeflag,
      |         CAST(0 AS BIGINT) AS sz, md5('') AS payload_md5
      |  FROM d
      |  UNION ALL
      |  SELECT doc_id, u.e + 1, 'docs/d' || CAST(u.e AS VARCHAR) || '.txt', '0',
      |         CAST(length('tar ' || CAST(doc_id AS VARCHAR) || ' file '
      |           || CAST(u.e AS VARCHAR)
      |           || repeat('t', CAST(doc_id % 25 AS INT))) AS BIGINT),
      |         md5('tar ' || CAST(doc_id AS VARCHAR) || ' file '
      |           || CAST(u.e AS VARCHAR) || repeat('t', CAST(doc_id % 25 AS INT)))
      |  FROM d, unnest(generate_series(0, nf - 1)) AS u(e))
      |SELECT doc_id AS media_id, CAST(idx AS INT) AS idx, name, typeflag,
      |  sz AS size, payload_md5
      |FROM r ORDER BY media_id, idx""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, TarEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nf = (id % 3 + 1).toInt
          val entries = Seq(("docs/", "5", Array.emptyByteArray)) ++
            (0 until nf).map { e =>
              (s"docs/d$e.txt", "0",
                (s"tar $id file $e" + "t" * (id % 25).toInt).getBytes)
            }
          (id, Archives.buildTar(entries))
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          posexplode(TarEntries.tarEntries(col("media"))).as(Seq("idx", "p")))
        .select(col("media_id"), col("idx").cast("int").as("idx"),
          col("p.name").as("name"), col("p.typeflag").as("typeflag"),
          col("p.size").as("size"), md5(col("p.payload")).as("payload_md5"))
        .orderBy("media_id", "idx")
  }

  /** x164: CRAWL → TRAINING CORPUS, end to end — the x130 composition
    * idea applied to the real front door: WARC archives → response
    * payloads → `Pipelines.htmlMainText` (the shared strip chain) →
    * quality gate (minimum text length) → URL-level dedup (earliest
    * capture per URI) → CONTENT-level exact dedup (fixture pages
    * deliberately collide across site groups, so the two dedup stages
    * do different work) → corpus summary. Two map-side-combinable
    * groupBys, zero joins, zero pair space; the oracle replays text
    * construction, the quality threshold and both dedup stages from
    * the generator formulas. */
  val x164 = DQ("x164_crawl_corpus", Some(
    """WITH d AS (SELECT doc_id, doc_id % 50 AS gid,
      |                  CAST(doc_id % 4 + 1 AS INT) AS nr FROM documents),
      |p AS (SELECT doc_id, gid, gid % 25 AS c, u.r AS r
      |      FROM d, unnest(generate_series(0, nr - 1)) AS u(r)),
      |t AS (SELECT *,
      |        'p' || CAST(r AS VARCHAR) || ' content ' || CAST(c AS VARCHAR)
      |          || ':' || CAST(r AS VARCHAR)
      |          || CASE WHEN (c * 7 + r * 13) % 60 = 0 THEN ''
      |             ELSE ' ' || repeat('w', CAST((c * 7 + r * 13) % 60 AS INT))
      |             END AS text
      |      FROM p),
      |q AS (SELECT * FROM t WHERE length(text) >= 25),
      |urls AS (SELECT c, r, gid, min(doc_id) AS url_canon, min(text) AS text
      |         FROM q GROUP BY 1, 2, 3),
      |content AS (SELECT c, r, count(*) AS n_urls, min(url_canon) AS canonical,
      |                   min(text) AS text
      |            FROM urls GROUP BY 1, 2)
      |SELECT md5(text) AS text_md5, CAST(length(text) AS INT) AS text_len,
      |       CAST(n_urls AS BIGINT) AS n_urls, canonical
      |FROM content ORDER BY text_md5""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Warc, WarcRecords}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val gid = (id % 50).toInt
          val c = gid % 25
          val recs = (0 until (id % 4 + 1).toInt).map { r =>
            val k = (c * 7 + r * 13) % 60
            val html = s"<html><head><title>p$r</title></head><body>" +
              s"<p>content $c:$r " + "w" * k + "</p></body></html>"
            ("response", s"http://site$gid.example/p$r",
              "2024-07-01T00:00:00Z", html.getBytes)
          }
          (id, Warc.build(recs))
        }.toDF("media_id", "media")
      val responses = media
        .select(col("media_id"),
          explode(WarcRecords.warcRecords(col("media"))).as("p"))
        .select(col("media_id"), col("p.uri").as("uri"),
          col("p.payload").cast("string").as("html"))
      graft.streaming.Pipelines.htmlMainText(responses)
        .filter(col("text_len") >= 25)
        .groupBy("uri")
        .agg(min("media_id").as("url_canon"), min("text").as("text"))
        .groupBy("text")
        .agg(count(lit(1)).as("n_urls"), min("url_canon").as("canonical"))
        .select(md5(col("text")).as("text_md5"),
          length(col("text")).as("text_len"), col("n_urls"), col("canonical"))
        .orderBy("text_md5")
  }

  /** x167: URL CANONICALIZATION — the normalization pass that makes
    * URL-level dedup (x161) actually collapse re-crawls: mixed-case
    * scheme/host lowered, default :80 stripped (a non-default port would
    * survive), trailing slash trimmed off non-root paths, tracking
    * params (`utm_*`, `fbclid`) dropped, the surviving query params
    * SORTED, and the fragment discarded (RFC 3986 §6 syntax-based
    * normalization plus the tracking-param scrub every crawl pipeline
    * adds). The messy input URLs are built by formula; Spark must then
    * genuinely PARSE them — `parse_url` (codegen'd) for
    * scheme/host/path/query, regexp for the port, higher-order
    * filter/sort for the params — while the oracle states the expected
    * canonical form straight from the generator formulas. Pure per-row
    * map: zero shuffles before the presentation sort; at 100 TB this is
    * the cheapest stage of the pipeline and the one that decides how
    * well the groupBy(uri) behind it dedups. */
  val x167 = DQ("x167_url_canonicalize", Some(
    """WITH d AS (SELECT doc_id, doc_id % 50 AS gid, doc_id % 4 AS r
      |           FROM documents),
      |u AS (SELECT doc_id, gid, r,
      |  (CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'http' END) || '://' ||
      |  (CASE WHEN doc_id % 2 = 0
      |        THEN 'Site' || CAST(gid AS VARCHAR) || '.Example'
      |        ELSE 'site' || CAST(gid AS VARCHAR) || '.example' END) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END) ||
      |  '/p' || CAST(r AS VARCHAR) ||
      |  (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) ||
      |  '?' ||
      |  concat_ws('&',
      |    CASE WHEN doc_id % 4 = 0 THEN 'b=2' END,
      |    'id=' || CAST(r AS VARCHAR),
      |    CASE WHEN doc_id % 3 = 0 THEN 'utm_source=feed' END,
      |    CASE WHEN doc_id % 5 = 0 THEN 'a=1' END) ||
      |  (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END) AS url
      |FROM d)
      |SELECT doc_id, url,
      |  'http://site' || CAST(gid AS VARCHAR) || '.example/p'
      |    || CAST(r AS VARCHAR) || '?' ||
      |  concat_ws('&',
      |    CASE WHEN doc_id % 5 = 0 THEN 'a=1' END,
      |    CASE WHEN doc_id % 4 = 0 THEN 'b=2' END,
      |    'id=' || CAST(r AS VARCHAR)) AS canon,
      |  (doc_id % 3 = 0 OR doc_id % 2 = 0 OR doc_id % 5 = 0
      |   OR doc_id % 7 = 0 OR doc_id % 6 = 0 OR doc_id % 4 = 0) AS changed
      |FROM u ORDER BY doc_id""".stripMargin)) {
    (spark, dir) =>
      val urls = spread(table(spark, dir, "documents"))
        .select(col("doc_id"),
          (col("doc_id") % 50).cast("string").as("gid"),
          (col("doc_id") % 4).cast("string").as("r"))
        .select(col("doc_id"), concat(
          when(col("doc_id") % 3 === 0, "HTTP").otherwise("http"),
          lit("://"),
          when(col("doc_id") % 2 === 0,
            concat(lit("Site"), col("gid"), lit(".Example")))
            .otherwise(concat(lit("site"), col("gid"), lit(".example"))),
          when(col("doc_id") % 5 === 0, ":80").otherwise(""),
          lit("/p"), col("r"),
          when(col("doc_id") % 7 === 0, "/").otherwise(""),
          lit("?"),
          concat_ws("&",
            when(col("doc_id") % 4 === 0, "b=2"),
            concat(lit("id="), col("r")),
            when(col("doc_id") % 3 === 0, "utm_source=feed"),
            when(col("doc_id") % 5 === 0, "a=1")),
          when(col("doc_id") % 6 === 0, "#frag").otherwise("")).as("url"))
      // the operator proper: canonical form derived from the URL STRING
      // alone (no reach-back into the generator columns)
      urls
        .withColumn("scheme", lower(expr("parse_url(url, 'PROTOCOL')")))
        .withColumn("host", lower(expr("parse_url(url, 'HOST')")))
        .withColumn("port",
          regexp_extract(col("url"), "^[^/]+://[^/:?#]+:([0-9]+)", 1))
        .withColumn("path0", expr("parse_url(url, 'PATH')"))
        .withColumn("path",
          when(col("path0") =!= "/", regexp_replace(col("path0"), "/+$", ""))
            .otherwise(col("path0")))
        .withColumn("q", array_join(array_sort(filter(
          split(expr("parse_url(url, 'QUERY')"), "&"),
          p => !p.startsWith("utm_") && !p.startsWith("fbclid="))), "&"))
        .select(col("doc_id"), col("url"),
          concat(col("scheme"), lit("://"), col("host"),
            when(col("port") =!= "" && col("port") =!= "80",
              concat(lit(":"), col("port"))).otherwise(""),
            col("path"),
            when(col("q") =!= "", concat(lit("?"), col("q"))).otherwise(""))
            .as("canon"))
        .withColumn("changed", col("url") =!= col("canon"))
        .orderBy("doc_id")
  }

  /** x168: ROBOTS.TXT POLITENESS GATE — which of a site's pages a
    * compliant crawler may fetch (RFC 9309): per-site `robots.txt` text
    * built by formula, then genuinely PARSED by Spark — lines split and
    * classified by codegen'd regexps, each rule bound to its governing
    * `User-agent` group via a last-non-null window WITHIN the site (a
    * robots file is a few rows, so the window partition is tiny by
    * construction), the most specific matching group selected
    * (product-token group beats `*` when present), and every page
    * evaluated by the longest-prefix-match rule with allow winning
    * length ties — the argmax is a map-side-combinable
    * `max(struct(len, allow, rule))`, no window over the page×rule
    * space. The oracle restates the rule table from the generator
    * formulas and replays the same group-selection + longest-match
    * evaluation relationally. At 100 TB pages join rules ON SITE — the
    * per-site rule set is tiny, so this is an ordinary equi-join with a
    * prefix residual, skew-safe because robots files are bounded. */
  val x168 = DQ("x168_robots_gate", Some(
    """WITH sites AS (SELECT DISTINCT doc_id % 50 AS gid FROM documents),
      |rules AS (
      |  SELECT gid, '*' AS ua, FALSE AS al, '/private' AS rp FROM sites
      |  UNION ALL SELECT gid, '*', FALSE, '/p1' FROM sites WHERE gid % 2 = 0
      |  UNION ALL SELECT gid, '*', FALSE, '/p' FROM sites WHERE gid % 5 = 0
      |  UNION ALL SELECT gid, '*', TRUE, '/p3' FROM sites WHERE gid % 5 = 0
      |  UNION ALL SELECT gid, 'graftbot', FALSE, '/p2' FROM sites
      |    WHERE gid % 3 = 0
      |  UNION ALL SELECT gid, 'graftbot', TRUE, '/p2' FROM sites
      |    WHERE gid % 6 = 0),
      |sel AS (SELECT r.gid, r.al, r.rp FROM rules r JOIN
      |  (SELECT gid, CASE WHEN bool_or(ua = 'graftbot') THEN 'graftbot'
      |               ELSE '*' END AS ua
      |   FROM rules GROUP BY gid) s ON r.gid = s.gid AND r.ua = s.ua),
      |pages AS (SELECT gid, '/p' || CAST(u.r AS VARCHAR) AS path
      |          FROM sites, unnest(generate_series(0, 3)) AS u(r)),
      |cand AS (SELECT p.gid, p.path, s.al, s.rp FROM pages p
      |         JOIN sel s ON p.gid = s.gid AND starts_with(p.path, s.rp)),
      |win AS (SELECT gid, path, al, rp FROM (
      |  SELECT *, row_number() OVER (PARTITION BY gid, path
      |    ORDER BY length(rp) DESC, al DESC, rp DESC) AS rn FROM cand)
      |  WHERE rn = 1)
      |SELECT p.gid, p.path, coalesce(w.al, TRUE) AS allowed,
      |  CASE WHEN w.rp IS NULL THEN NULL
      |       ELSE (CASE WHEN w.al THEN 'allow ' ELSE 'disallow ' END) || w.rp
      |  END AS rule
      |FROM pages p LEFT JOIN win w ON p.gid = w.gid AND p.path = w.path
      |ORDER BY p.gid, p.path""".stripMargin)) {
    (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val sites = table(spark, dir, "documents")
        .select((col("doc_id") % 50).as("gid")).distinct()
      val robots = sites.select(col("gid"), concat_ws("\n",
        concat(lit("# robots for site"), col("gid").cast("string")),
        lit("User-agent: *"),
        lit("Disallow: /private"),
        when(col("gid") % 2 === 0, "Disallow: /p1"),
        when(col("gid") % 5 === 0, "Disallow: /p"),
        when(col("gid") % 5 === 0, "Allow: /p3"),
        when(col("gid") % 3 === 0, "User-agent: graftbot"),
        when(col("gid") % 3 === 0, "Disallow: /p2"),
        when(col("gid") % 6 === 0, "Allow: /p2")).as("robots"))
      // the operator proper: parse the TEXT (group binding via a
      // last-non-null window inside each tiny per-site file)
      val lines = robots
        .select(col("gid"), posexplode(split(col("robots"), "\n"))
          .as(Seq("pos", "line")))
        .withColumn("ua", regexp_extract(col("line"),
          "(?i)^user-agent:\\s*(\\S+)", 1))
        .withColumn("dis", regexp_extract(col("line"),
          "(?i)^disallow:\\s*(\\S+)", 1))
        .withColumn("alw", regexp_extract(col("line"),
          "(?i)^allow:\\s*(\\S+)", 1))
        .withColumn("grp", last(when(col("ua") =!= "", col("ua")), true)
          .over(Window.partitionBy("gid").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val rules = lines
        .filter(col("dis") =!= "" || col("alw") =!= "")
        .select(col("gid"), col("grp"),
          (col("alw") =!= "").as("al"),
          when(col("alw") =!= "", col("alw")).otherwise(col("dis")).as("rp"))
      val sel = rules.join(
        rules.groupBy("gid").agg(
          when(max(when(col("grp") === "graftbot", 1).otherwise(0)) === 1,
            "graftbot").otherwise("*").as("want")), "gid")
        .filter(col("grp") === col("want"))
        .select("gid", "al", "rp")
      val pages = sites.select(col("gid"),
        explode(sequence(lit(0), lit(3))).as("r"))
        .select(col("gid"), concat(lit("/p"), col("r").cast("string")).as("path"))
      val win = pages.join(sel, Seq("gid"))
        .filter(col("path").startsWith(col("rp")))
        .groupBy("gid", "path")
        .agg(max(struct(length(col("rp")).as("len"), col("al").as("al"),
          col("rp").as("rp"))).as("w"))
      pages.join(win, Seq("gid", "path"), "left_outer")
        .select(col("gid"), col("path"),
          coalesce(col("w.al"), lit(true)).as("allowed"),
          when(col("w.rp").isNull, lit(null).cast("string"))
            .otherwise(concat(when(col("w.al"), "allow ").otherwise("disallow "),
              col("w.rp"))).as("rule"))
        .orderBy("gid", "path")
  }

  /** x169: CDX-STYLE CAPTURE INDEX over WARC archives — the random-access
    * layer every 100 TB crawl store needs: `warc_index` emits one
    * (uri, date, offset, length, payload digest) per record, where the
    * extent is sliceable FROM THE STORED BYTES (compressed gzip-member
    * extents for `.warc.gz`, version-line-to-next-record extents for
    * plain `.warc`), so later access is a range request, never a
    * re-scan. The query then PROVES random access in-row: every indexed
    * extent is sliced back out of the archive with `substring`,
    * re-parsed by `warc_records` as a standalone stream, and its payload
    * md5 checked against the index entry — `verified` is computed, not
    * asserted, and the oracle (which cannot know compressed offsets)
    * pins it TRUE alongside the by-construction record inventory. Zero
    * shuffles before the presentation sort. */
  val x169 = DQ("x169_warc_cdx_index", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS nr,
      |                  printf('2024-%02d-01T00:00:00Z', doc_id % 12 + 1) AS dt
      |           FROM documents),
      |recs AS (
      |  SELECT doc_id, 0 AS rec_idx, 'warcinfo' AS rec_type,
      |         CAST(NULL AS VARCHAR) AS uri,
      |         'software: graft ' || CAST(doc_id AS VARCHAR) AS pl
      |  FROM d
      |  UNION ALL
      |  SELECT doc_id, 2 * u.r + 1, 'request',
      |         'http://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/p'
      |           || CAST(u.r AS VARCHAR),
      |         'GET /p' || CAST(u.r AS VARCHAR) || ' HTTP/1.1'
      |  FROM d, unnest(generate_series(0, nr - 1)) AS u(r)
      |  UNION ALL
      |  SELECT doc_id, 2 * u.r + 2, 'response',
      |         'http://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/p'
      |           || CAST(u.r AS VARCHAR),
      |         '<html><body>doc ' || CAST(doc_id AS VARCHAR) || ' page '
      |           || CAST(u.r AS VARCHAR) || '</body></html>'
      |  FROM d, unnest(generate_series(0, nr - 1)) AS u(r))
      |SELECT doc_id AS media_id, CAST(rec_idx AS INT) AS rec_idx, rec_type,
      |  uri, md5(pl) AS payload_md5, TRUE AS verified
      |FROM recs ORDER BY media_id, rec_idx""".stripMargin)) {
    (spark, dir) =>
      import graft.functions.{WarcIndex, WarcRecords}
      warcFixture(spark, dir)
        .select(col("media_id"), col("media"),
          posexplode(WarcIndex.warcIndex(col("media"))).as(Seq("rec_idx", "p")))
        .withColumn("slice", expr(
          "substring(media, cast(p.offset as int) + 1, cast(p.length as int))"))
        .withColumn("reparsed", WarcRecords.warcRecords(col("slice")))
        .select(col("media_id"), col("rec_idx").cast("int").as("rec_idx"),
          col("p.rec_type").as("rec_type"), col("p.uri").as("uri"),
          col("p.payload_md5").as("payload_md5"),
          (size(col("reparsed")) === 1 &&
            md5(element_at(col("reparsed"), 1).getField("payload"))
              === col("p.payload_md5")).as("verified"))
        .orderBy("media_id", "rec_idx")
  }

  /** x170: JSONL CORPUS INGEST — the other front door (most published
    * LLM corpora ship as JSON-lines, not WARC): each blob splits to
    * lines and every line runs Spark's codegen-adjacent `from_json`
    * with an EXPLICIT corrupt-record column (PERMISSIVE mode), so a
    * malformed line routes to a dead-letter count instead of poisoning
    * the batch — the same quarantine posture as every binary codec
    * here. Schema drift is exercised too: `score` is absent from ¾ of
    * the lines and must surface as null, not an error. The oracle
    * replays fields and the corrupt/missing formulas by construction;
    * Spark must genuinely parse the JSON text. Pure per-row map +
    * one map-side-combinable groupBy. */
  val x170 = DQ("x170_jsonl_ingest", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS nl
      |           FROM documents),
      |l AS (SELECT doc_id, u.k AS k,
      |             (doc_id + u.k) % 17 = 0 AS corrupt,
      |             (doc_id + u.k) % 4 = 0 AS has_score
      |      FROM d, unnest(generate_series(0, nl - 1)) AS u(k))
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
      |  CAST(sum(CASE WHEN NOT corrupt AND has_score THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_scored,
      |  CAST(coalesce(sum(CASE WHEN NOT corrupt THEN doc_id * 10 + k END), 0)
      |       AS BIGINT) AS id_sum,
      |  round(CAST(coalesce(sum(CASE WHEN NOT corrupt AND has_score
      |                     THEN 0.25 * k END), 0) AS DOUBLE), 2) AS score_sum
      |FROM l GROUP BY doc_id ORDER BY doc_id""".stripMargin)) {
    (spark, dir) =>
      val langs = Seq("en", "de", "fr")
      val blobs = spread(table(spark, dir, "documents"))
        .select(col("doc_id"), (col("doc_id") % 3 + 1).cast("int").as("nl"))
        .select(col("doc_id"), expr(
          s"""array_join(transform(sequence(0, nl - 1), k ->
             |  CASE WHEN (doc_id + k) % 17 = 0 THEN
             |    concat('{"id": ', cast(doc_id * 10 + k as string), ', "lang"')
             |  WHEN (doc_id + k) % 4 = 0 THEN
             |    concat('{"id": ', cast(doc_id * 10 + k as string),
             |           ', "lang": "', element_at(array('en','de','fr'),
             |                                     cast(k % 3 as int) + 1),
             |           '", "score": ', cast(0.25 * k as string), '}')
             |  ELSE
             |    concat('{"id": ', cast(doc_id * 10 + k as string),
             |           ', "lang": "', element_at(array('en','de','fr'),
             |                                     cast(k % 3 as int) + 1),
             |           '"}')
             |  END), '\\n')""".stripMargin).as("jsonl"))
      // the operator proper: split + from_json with corrupt routing —
      // the `Pipelines.jsonlParse` projection, shared verbatim with the
      // streaming `jsonlTextStream` ingest
      val parsed = graft.streaming.Pipelines.jsonlParse(
        blobs.select(col("doc_id"),
          explode(split(col("jsonl"), "\n")).as("line")),
        "id BIGINT, lang STRING, score DOUBLE")
      parsed.groupBy("doc_id")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("j._bad").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
          sum(when(col("j._bad").isNull && col("j.score").isNotNull, 1L)
            .otherwise(0L)).as("n_scored"),
          coalesce(sum(when(col("j._bad").isNull, col("j.id"))), lit(0L))
            .as("id_sum"),
          round(coalesce(sum(when(col("j._bad").isNull, col("j.score"))),
            lit(0.0)), 2).as("score_sum"))
        .orderBy("doc_id")
  }

  /** x171: HTTP RESPONSE PARSE — the layer a real crawl archive puts
    * between the WARC framing and the HTML: response payloads are full
    * HTTP messages (status line, header block, CRLF CRLF, body). Spark
    * splits them with codegen'd builtins — status via an anchored
    * regexp, headers via multiline case-insensitive regexps, the body
    * by the FIRST blank line (`instr`, which is correct because header
    * blocks cannot contain CRLF CRLF — a body legitimately can, and a
    * split-on-last would corrupt it). Non-200 responses and non-HTML
    * content types are classified, not dropped — the downstream text
    * chain filters on the surfaced columns. The oracle replays status,
    * content type and body digest from the generator formulas. */
  val x171 = DQ("x171_http_response", Some(
    """WITH d AS (SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN 404 ELSE 200 END AS status,
      |    CASE WHEN doc_id % 5 = 0 THEN 'application/json'
      |         ELSE 'text/html' END AS ctype
      |  FROM documents),
      |b AS (SELECT doc_id, status, ctype,
      |    CASE WHEN ctype = 'text/html' THEN
      |      '<html><head><title>t' || CAST(doc_id % 7 AS VARCHAR)
      |        || '</title></head><body>page ' || CAST(doc_id AS VARCHAR)
      |        || chr(13) || chr(10) || chr(13) || chr(10)
      |        || 'after blank line</body></html>'
      |    ELSE '{"doc": ' || CAST(doc_id AS VARCHAR) || '}'
      |    END AS body
      |  FROM d)
      |SELECT doc_id, CAST(status AS INT) AS status, ctype,
      |  CAST(length(body) AS INT) AS body_len, md5(body) AS body_md5,
      |  CASE WHEN ctype = 'text/html'
      |       THEN 't' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END AS title
      |FROM b ORDER BY doc_id""".stripMargin)) {
    (spark, dir) =>
      val msgs = spread(table(spark, dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, 404).otherwise(200).as("st"),
          when(col("doc_id") % 5 === 0, "application/json")
            .otherwise("text/html").as("ct"))
        .withColumn("body",
          when(col("ct") === "text/html",
            concat(lit("<html><head><title>t"),
              (col("doc_id") % 7).cast("string"),
              lit("</title></head><body>page "),
              col("doc_id").cast("string"),
              // CRLF CRLF INSIDE the body: the header/body split must
              // take the FIRST blank line, or this corrupts
              lit("\r\n\r\nafter blank line</body></html>")))
            .otherwise(concat(lit("{\"doc\": "),
              col("doc_id").cast("string"), lit("}"))))
        .select(col("doc_id"), concat(
          lit("HTTP/1.1 "), col("st").cast("string"),
          when(col("st") === 200, " OK").otherwise(" Not Found"),
          lit("\r\nServer: graft\r\nContent-Type: "), col("ct"),
          lit("; charset=utf-8\r\nContent-Length: "),
          length(col("body")).cast("string"),
          lit("\r\n\r\n"), col("body")).as("msg"))
      // the operator proper: parse the MESSAGE string alone
      msgs
        .withColumn("status", regexp_extract(col("msg"),
          "^HTTP/1\\.[01] (\\d{3}) ", 1).cast("int"))
        .withColumn("ctype", lower(regexp_extract(col("msg"),
          "(?mi)^content-type:\\s*([^\\r\\n;]+)", 1)))
        // instr = 0 ⇒ no header/body boundary at all: surface an empty
        // body rather than a garbage slice (dead-letter posture; the
        // fixture always has the boundary, the guard is for real crawls)
        .withColumn("body", when(instr(col("msg"), "\r\n\r\n") === 0, "")
          .otherwise(col("msg")
            .substr(instr(col("msg"), "\r\n\r\n") + 4, lit(1 << 24))))
        .select(col("doc_id"), col("status"), col("ctype"),
          length(col("body")).as("body_len"), md5(col("body")).as("body_md5"),
          when(col("ctype") === "text/html", regexp_extract(col("body"),
            "(?is)<title>(.*?)</title>", 1)).otherwise("").as("title"))
        .orderBy("doc_id")
  }

  /** x176: LINK GRAPH + PAGERANK — the web-graph operator family
    * (crawl prioritization, domain authority for quality weighting):
    * anchor targets are EXTRACTED from the page HTML with
    * `regexp_extract_all` (codegen'd — the parse is the operator; the
    * oracle restates the edge list from the generator formulas),
    * deduplicated to site-level edges, and ranked by two PageRank
    * iterations (d = 0.85) in FIXED-POINT integer arithmetic: scores
    * scale by 10^12 and every contribution is `(pr·85) div (100·deg)`
    * — bit-exact in both engines and ORDER-INDEPENDENT under Spark's
    * nondeterministic partition-sum order, where a floating PageRank
    * could drift in the last ulp. Each iteration is one equi-join of
    * edges to scores plus a groupBy(dst) — the classic Pregel step as
    * two exchanges, linear in edges at 100 TB. */
  val x176 = DQ("x176_link_pagerank", Some(
    """WITH sites AS (SELECT DISTINCT doc_id % 50 AS g FROM documents),
      |e0 AS (SELECT g AS src, (g + 1) % 50 AS dst FROM sites
      |       UNION SELECT g, (g * 2 + 1) % 50 FROM sites
      |       UNION SELECT g, (g + 7) % 50 FROM sites WHERE g % 5 = 0),
      |edges AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
      |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sites),
      |pr0 AS (SELECT g, 1000000000000 // n AS pr FROM sites CROSS JOIN nn),
      |c1 AS (SELECT e.dst, sum((p.pr * 85) // (100 * d.d)) AS s
      |       FROM edges e JOIN pr0 p ON p.g = e.src JOIN deg d ON d.src = e.src
      |       GROUP BY 1),
      |pr1 AS (SELECT s.g,
      |          (1000000000000 * 15 // 100) // n + coalesce(c1.s, 0) AS pr
      |        FROM sites s CROSS JOIN nn LEFT JOIN c1 ON c1.dst = s.g),
      |c2 AS (SELECT e.dst, sum((p.pr * 85) // (100 * d.d)) AS s
      |       FROM edges e JOIN pr1 p ON p.g = e.src JOIN deg d ON d.src = e.src
      |       GROUP BY 1),
      |pr2 AS (SELECT s.g,
      |          (1000000000000 * 15 // 100) // n + coalesce(c2.s, 0) AS pr
      |        FROM sites s CROSS JOIN nn LEFT JOIN c2 ON c2.dst = s.g)
      |SELECT pr2.g AS site, CAST(coalesce(deg.d, 0) AS BIGINT) AS out_deg,
      |       CAST(pr2.pr AS BIGINT) AS pr_e12
      |FROM pr2 LEFT JOIN deg ON deg.src = pr2.g ORDER BY site""".stripMargin)) {
    (spark, dir) =>
      val S = 1000000000000L
      val pages = spread(table(spark, dir, "documents"))
        .select(col("doc_id"), (col("doc_id") % 50).as("g"))
        .withColumn("html", concat(
          lit("<html><body>site "), col("g").cast("string"),
          lit(" <a href=\"http://site"),
          ((col("g") + 1) % 50).cast("string"), lit(".example/\">n1</a>"),
          lit(" <a href=\"http://site"),
          ((col("g") * 2 + 1) % 50).cast("string"), lit(".example/\">n2</a>"),
          when(col("g") % 5 === 0, concat(lit(" <a href=\"http://site"),
            ((col("g") + 7) % 50).cast("string"), lit(".example/\">n3</a>")))
            .otherwise(""),
          lit("</body></html>")))
      // the operator proper: link extraction from the HTML string
      val edges = pages
        .select(col("g").as("src"), explode(expr(
          """regexp_extract_all(html,
            |  '<a href="http://site([0-9]+)\\.example/"', 1)""".stripMargin))
          .as("ds"))
        .select(col("src"), col("ds").cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val sites = pages.select(col("g")).distinct()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      val nn = sites.agg(count(lit(1)).as("n"))
      def step(pr: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val c = edges
          .join(pr.withColumnRenamed("g", "src"), "src")
          .join(deg, "src")
          .select(col("dst"), expr("(pr * 85) div (100 * d)").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("s"))
        sites.crossJoin(broadcast(nn))
          .join(c.withColumnRenamed("dst", "g"), Seq("g"), "left_outer")
          .select(col("g"), (expr(s"($S * 15 div 100) div n")
            + coalesce(col("s"), lit(0L))).as("pr"))
      }
      val pr0 = sites.crossJoin(broadcast(nn))
        .select(col("g"), expr(s"$S div n").as("pr"))
      val pr2 = step(step(pr0))
      pr2.join(deg.withColumnRenamed("src", "g"), Seq("g"), "left_outer")
        .select(col("g").as("site"),
          coalesce(col("d"), lit(0L)).as("out_deg"), col("pr").as("pr_e12"))
        .orderBy("site")
  }

  /** x178: WET INGEST — Common-Crawl's extracted-text distribution (the
    * `.wet` sibling of the raw `.warc`: same ISO 28500 framing, but the
    * page records are `conversion` type with PLAIN-TEXT payloads). Most
    * LLM corpora built on Common Crawl start here, not at the raw HTML.
    * The archive bytes are genuinely parsed (`warc_records`, gzip-member
    * form for every third doc), conversion records filtered from the
    * warcinfo preamble, payloads UTF-8-decoded, and each text language-
    * identified by the same stopword-argmax heuristic as x05 — all with
    * codegen'd builtins (`filter(split(...))` marker hits, no shuffle
    * before the presentation sort). The oracle replays text and language
    * from the generator formulas; Spark must recover them from the
    * framed bytes. */
  val x178 = DQ("x178_wet_ingest", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS nr
      |           FROM documents),
      |recs AS (
      |  SELECT doc_id, u.r AS rec_idx,
      |         'http://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/p'
      |           || CAST(u.r AS VARCHAR) AS uri,
      |         CASE (doc_id + u.r) % 3
      |           WHEN 0 THEN 'the quick brown fox jumps over the lazy dog and runs home'
      |           WHEN 1 THEN 'der schnelle braune fuchs und der faule hund laufen zu der scheune'
      |           ELSE 'le renard brun rapide et le chien paresseux vont a la grange'
      |         END || ' doc ' || CAST(doc_id AS VARCHAR) || ' page '
      |           || CAST(u.r AS VARCHAR) AS text,
      |         CASE (doc_id + u.r) % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
      |           ELSE 'fr' END AS lang
      |  FROM d, unnest(generate_series(0, nr - 1)) AS u(r))
      |SELECT doc_id AS media_id, CAST(rec_idx AS INT) AS rec_idx, uri,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  CAST(16 AS BIGINT) AS n_words, lang, md5(text) AS text_md5
      |FROM recs ORDER BY media_id, rec_idx""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Warc, WarcRecords}
      val bases = Array(
        "the quick brown fox jumps over the lazy dog and runs home",
        "der schnelle braune fuchs und der faule hund laufen zu der scheune",
        "le renard brun rapide et le chien paresseux vont a la grange")
      val wet = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val dt = f"2024-${id % 12 + 1}%02d-01T00:00:00Z"
          val recs = Seq(("warcinfo", null: String, dt,
            s"software: graft-wet $id".getBytes)) ++
            (0 until (id % 3 + 1).toInt).map { r =>
              val text = s"${bases(((id + r) % 3).toInt)} doc $id page $r"
              ("conversion", s"http://site${id % 50}.example/p$r", dt,
                text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }
          (id, if (id % 3 == 0) Warc.buildGz(recs) else Warc.build(recs))
        }.toDF("media_id", "media")
      // the operator proper: parse the archive bytes alone
      def hits(ws: String): org.apache.spark.sql.Column =
        size(expr(s"filter(split(text, ' '), w -> w IN ($ws))"))
      wet
        .select(col("media_id"),
          posexplode(WarcRecords.warcRecords(col("media"))).as(Seq("i", "p")))
        .filter(col("p.rec_type") === "conversion")
        // records are positional in the archive: conversion record r sits
        // at array index r+1 (behind the warcinfo preamble) — no
        // re-grouping needed, the parse stays shuffle-free
        .withColumn("rec_idx", (col("i") - 1).cast("int"))
        .withColumn("text", col("p.payload").cast("string"))
        .withColumn("en", hits("'the','and'"))
        .withColumn("de", hits("'der','und','zu'"))
        .withColumn("fr", hits("'le','et','la'"))
        .select(col("media_id"), col("rec_idx"), col("p.uri").as("uri"),
          length(col("text")).cast("long").as("n_bytes"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          when(col("en") >= col("de") && col("en") >= col("fr"), "en")
            .when(col("de") >= col("fr"), "de").otherwise("fr").as("lang"),
          md5(col("text")).as("text_md5"))
        .orderBy("media_id", "rec_idx")
  }

  /** x179: WAT LINK METADATA — Common Crawl's third distribution: per-page
    * metadata records whose payload is NESTED JSON carrying the page's
    * outlink list (`Envelope → Payload-Metadata → HTTP-Response-Metadata →
    * HTML-Metadata → Links[{path, url}]`). The WARC framing opens with
    * `warc_records`, the JSON with one codegen-adjacent `from_json` against
    * a programmatic nested StructType (hyphenated field names and all),
    * links explode in-row, and anchors/images/relative links are
    * classified before a per-site rollup — the exact shape a link-graph
    * builder consumes at 100 TB, where WAT is ~1/5 the bytes of the raw
    * crawl. Per-site aggregation is one map-side-combinable groupBy;
    * the distinct outlink count collapses map-side on (site, dst). */
  val x179 = DQ("x179_wat_links", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS nr,
      |                  doc_id % 50 AS g
      |           FROM documents),
      |pages AS (SELECT doc_id, g, u.r AS r FROM d,
      |          unnest(generate_series(0, nr - 1)) AS u(r)),
      |links AS (
      |  SELECT g, 'anchor' AS kind, (g + 1) % 50 AS dst FROM pages
      |  UNION ALL
      |  SELECT g, 'image', g FROM pages
      |  UNION ALL
      |  SELECT g, 'relative', CAST(NULL AS BIGINT) FROM pages
      |  UNION ALL
      |  SELECT g, 'anchor', (g * 2 + 1) % 50 FROM pages WHERE r % 2 = 1)
      |SELECT g AS site,
      |  CAST(sum(CASE WHEN kind = 'relative' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_pages,
      |  CAST(sum(CASE WHEN kind = 'anchor' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_anchor,
      |  CAST(sum(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_img,
      |  CAST(sum(CASE WHEN kind = 'relative' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_rel,
      |  CAST(count(DISTINCT CASE WHEN kind = 'anchor' AND dst <> g
      |                           THEN dst END) AS BIGINT) AS out_deg
      |FROM links l GROUP BY g ORDER BY site""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Warc, WarcRecords}
      import org.apache.spark.sql.types._
      val wat = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val g = id % 50
          val dt = f"2024-${id % 12 + 1}%02d-01T00:00:00Z"
          val recs = Seq(("warcinfo", null: String, dt,
            s"software: graft-wat $id".getBytes)) ++
            (0 until (id % 4 + 1).toInt).map { r =>
              val uri = s"http://site$g.example/p$r"
              val extra =
                if (r % 2 == 1)
                  s""",{"path":"A@/href","url":"http://site${(g * 2 + 1) % 50}.example/"}"""
                else ""
              val json =
                s"""{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"$uri","WARC-Type":"response"},""" +
                  s""""Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":[""" +
                  s"""{"path":"A@/href","url":"http://site${(g + 1) % 50}.example/"},""" +
                  s"""{"path":"IMG@/src","url":"http://site$g.example/img.png"},""" +
                  s"""{"path":"A@/href","url":"/local/p0"}$extra]}}}}}"""
              ("metadata", uri, dt, json.getBytes)
            }
          (id, if (id % 3 == 0) Warc.buildGz(recs) else Warc.build(recs))
        }.toDF("media_id", "media")
      val linkT = new StructType()
        .add("path", StringType).add("url", StringType)
      val watSchema = new StructType()
        .add("Envelope", new StructType()
          .add("WARC-Header-Metadata", new StructType()
            .add("WARC-Target-URI", StringType)
            .add("WARC-Type", StringType))
          .add("Payload-Metadata", new StructType()
            .add("HTTP-Response-Metadata", new StructType()
              .add("HTML-Metadata", new StructType()
                .add("Links", ArrayType(linkT))))))
      // the operator proper: framing + nested JSON + link classification
      val links = wat
        .select(col("media_id"),
          explode(WarcRecords.warcRecords(col("media"))).as("p"))
        .filter(col("p.rec_type") === "metadata")
        .select(col("media_id"),
          from_json(col("p.payload").cast("string"), watSchema).as("j"))
        .select(
          regexp_extract(
            col("j.Envelope.WARC-Header-Metadata.WARC-Target-URI"),
            "http://site([0-9]+)\\.example", 1).cast("long").as("site"),
          explode(col(
            "j.Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata.Links"))
            .as("l"))
        .select(col("site"),
          when(!col("l.url").startsWith("http://"), "relative")
            .when(col("l.path") === "A@/href", "anchor")
            .otherwise("image").as("kind"),
          when(col("l.url").startsWith("http://"),
            regexp_extract(col("l.url"), "http://site([0-9]+)\\.example", 1)
              .cast("long")).as("dst"))
      links.groupBy("site")
        .agg(
          sum(when(col("kind") === "anchor", 1L).otherwise(0L)).as("n_anchor"),
          sum(when(col("kind") === "image", 1L).otherwise(0L)).as("n_img"),
          sum(when(col("kind") === "relative", 1L).otherwise(0L)).as("n_rel"),
          // distinct collapses map-side on (site, dst) — tiny domain
          size(array_distinct(collect_list(
            when(col("kind") === "anchor" && col("dst") =!= col("site"),
              col("dst"))))).cast("long").as("out_deg"))
        // exactly one relative link is emitted per page, so n_rel IS the
        // page count — surfaced under both names the consumer wants
        .select(col("site"), col("n_rel").as("n_pages"), col("n_anchor"),
          col("n_img"), col("n_rel"), col("out_deg"))
        .orderBy("site")
  }

  /** x180: SITEMAP PARSE + CRAWL COVERAGE — the crawl-frontier side of the
    * politeness stack (x167 canonicalizes, x168 gates, this DISCOVERS):
    * per-site `sitemap.xml` text is classified (`urlset` page list vs
    * `sitemapindex` shard list, both per sitemaps.org), `<loc>`/`<lastmod>`
    * entries extracted positionally with two `regexp_extract_all` passes
    * zipped back together (codegen'd — Spark regex groups extract one at a
    * time, `arrays_zip` restores the pairing), and the listed URLs joined
    * against the ACTUALLY-CRAWLED url set (x161's page formulas) to
    * measure coverage — the audit every recrawl scheduler runs. The only
    * shuffles are the per-site rollup and the coverage semi-join, both on
    * the site/url key. */
  val x180 = DQ("x180_sitemap_urls", Some(
    """WITH sites AS (SELECT DISTINCT doc_id % 50 AS g FROM documents),
      |crawl AS (SELECT DISTINCT doc_id % 50 AS g, u.r AS r
      |          FROM documents, unnest(generate_series(0, doc_id % 4)) AS u(r)),
      |listed AS (
      |  SELECT g, u.r AS r,
      |         'http://site' || CAST(g AS VARCHAR) || '.example/p'
      |           || CAST(u.r AS VARCHAR) AS url,
      |         printf('2024-%02d-01', (g + u.r) % 12 + 1) AS lastmod
      |  FROM sites, unnest(generate_series(0, g % 4 + 1)) AS u(r)
      |  WHERE g % 7 <> 0),
      |pageagg AS (
      |  SELECT l.g, CAST(count(*) AS BIGINT) AS n_listed,
      |         CAST(sum(CASE WHEN c.r IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_crawled,
      |         min(l.lastmod) AS min_lastmod, max(l.lastmod) AS max_lastmod
      |  FROM listed l LEFT JOIN crawl c ON c.g = l.g AND c.r = l.r
      |  GROUP BY l.g)
      |SELECT s.g AS site,
      |  CASE WHEN s.g % 7 = 0 THEN 'sitemapindex' ELSE 'urlset' END AS kind,
      |  CASE WHEN s.g % 7 = 0 THEN CAST(2 AS BIGINT) ELSE p.n_listed END
      |    AS n_listed,
      |  CASE WHEN s.g % 7 = 0 THEN CAST(0 AS BIGINT) ELSE p.n_crawled END
      |    AS n_crawled,
      |  p.min_lastmod, p.max_lastmod
      |FROM sites s LEFT JOIN pageagg p ON p.g = s.g
      |ORDER BY site""".stripMargin)) {
    (spark, dir) =>
      val sites = spread(table(spark, dir, "documents"))
        .select((col("doc_id") % 50).as("g")).distinct()
      val xml = sites.select(col("g"),
        when(col("g") % 7 === 0, concat(
          lit("<?xml version=\"1.0\"?><sitemapindex><sitemap><loc>http://site"),
          col("g").cast("string"),
          lit(".example/sitemap1.xml</loc></sitemap><sitemap><loc>http://site"),
          col("g").cast("string"),
          lit(".example/sitemap2.xml</loc></sitemap></sitemapindex>")))
          .otherwise(concat(
            lit("<?xml version=\"1.0\"?><urlset>"),
            expr("""array_join(transform(sequence(0, cast(g % 4 + 1 as int)), r ->
                   |  concat('<url><loc>http://site', cast(g as string),
                   |    '.example/p', cast(r as string), '</loc><lastmod>2024-',
                   |    lpad(cast((g + r) % 12 + 1 as string), 2, '0'),
                   |    '-01</lastmod></url>')), '')""".stripMargin),
            lit("</urlset>"))).as("xml"))
      // the operator proper: classify + extract from the XML text alone
      val parsed = xml
        .withColumn("kind", when(col("xml").contains("<sitemapindex>"),
          "sitemapindex").otherwise("urlset"))
        .withColumn("locs", expr(
          "regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)"))
        .withColumn("mods", expr(
          "regexp_extract_all(xml, '<lastmod>([^<]+)</lastmod>', 1)"))
      val crawl = spread(table(spark, dir, "documents"))
        .select((col("doc_id") % 50).as("g"),
          explode(sequence(lit(0), (col("doc_id") % 4).cast("int"))).as("r"))
        .select(col("g"), concat(lit("http://site"), col("g").cast("string"),
          lit(".example/p"), col("r").cast("string")).as("url"))
        .distinct()
      val urls = parsed.filter(col("kind") === "urlset")
        .select(col("g"), explode(expr(
          "arrays_zip(locs, mods)")).as("e"))
        .select(col("g"), col("e.locs").as("url"), col("e.mods").as("lastmod"))
      val cov = urls.join(crawl, Seq("g", "url"), "left_outer")
        .groupBy("g").agg(count(lit(1)).as("n_listed"),
          sum(when(crawl("url").isNotNull, 1L).otherwise(0L)).as("n_crawled"),
          min(col("lastmod")).as("min_lastmod"),
          max(col("lastmod")).as("max_lastmod"))
      parsed.select(col("g"), col("kind"), size(col("locs")).as("n_locs"))
        .join(cov, Seq("g"), "left_outer")
        .select(col("g").as("site"), col("kind"),
          when(col("kind") === "sitemapindex", col("n_locs").cast("long"))
            .otherwise(col("n_listed")).as("n_listed"),
          when(col("kind") === "sitemapindex", 0L)
            .otherwise(col("n_crawled")).as("n_crawled"),
          col("min_lastmod"), col("max_lastmod"))
        .orderBy("site")
  }

  /** x181: ANCHOR-TEXT AGGREGATION — the inlink-description operator
    * (search and quality pipelines describe a page by what OTHER pages'
    * anchors say about it): `<a href>…</a>` pairs are extracted with two
    * positional `regexp_extract_all` passes re-zipped in-row, grouped to
    * (target, anchor) counts (map-side combinable — the anchor vocabulary
    * per target is tiny even when inlinks are millions), and each target
    * keeps its top-2 anchors by (count DESC, text ASC) via an in-row
    * struct sort — the classic two-level rollup that never materializes
    * a per-inlink exchange at 100 TB. */
  val x181 = DQ("x181_anchor_text", Some(
    """WITH pages AS (SELECT doc_id, doc_id % 50 AS g FROM documents),
      |an AS (
      |  SELECT (g + 1) % 50 AS dst,
      |         CASE WHEN doc_id % 2 = 0
      |           THEN 'visit site ' || CAST((g + 1) % 50 AS VARCHAR)
      |           ELSE 'click here' END AS anchor
      |  FROM pages
      |  UNION ALL
      |  SELECT (g * 2 + 1) % 50,
      |         'best ' || CAST((g * 2 + 1) % 50 AS VARCHAR) || ' content'
      |  FROM pages),
      |cnt AS (SELECT dst, anchor, CAST(count(*) AS BIGINT) AS n
      |        FROM an GROUP BY 1, 2),
      |top AS (SELECT dst, anchor, n, row_number() OVER (
      |          PARTITION BY dst ORDER BY n DESC, anchor) AS rk
      |        FROM cnt)
      |SELECT c.dst AS site, CAST(sum(c.n) AS BIGINT) AS n_inlinks,
      |  CAST(count(*) AS BIGINT) AS n_anchors,
      |  (SELECT string_agg(anchor || '(' || CAST(n AS VARCHAR) || ')', '|'
      |            ORDER BY rk)
      |   FROM top t WHERE t.dst = c.dst AND t.rk <= 2) AS top_anchors
      |FROM cnt c GROUP BY c.dst ORDER BY site""".stripMargin)) {
    (spark, dir) =>
      val pages = spread(table(spark, dir, "documents"))
        .select(col("doc_id"), (col("doc_id") % 50).as("g"))
        .withColumn("html", concat(
          lit("<html><body><a href=\"http://site"),
          ((col("g") + 1) % 50).cast("string"), lit(".example/\">"),
          when(col("doc_id") % 2 === 0,
            concat(lit("visit site "), ((col("g") + 1) % 50).cast("string")))
            .otherwise("click here"),
          lit("</a> filler <a href=\"http://site"),
          ((col("g") * 2 + 1) % 50).cast("string"), lit(".example/\">best "),
          ((col("g") * 2 + 1) % 50).cast("string"),
          lit(" content</a></body></html>")))
      // the operator proper: extract (href, anchor-text) from the HTML
      val pairs = pages
        .withColumn("hrefs", expr(
          """regexp_extract_all(html,
            |  '<a href="http://site([0-9]+)\\.example/">', 1)""".stripMargin))
        .withColumn("texts", expr(
          """regexp_extract_all(html,
            |  '<a href="http://site[0-9]+\\.example/">([^<]+)</a>', 1)""".stripMargin))
        .select(explode(expr("arrays_zip(hrefs, texts)")).as("e"))
        .select(col("e.hrefs").cast("long").as("dst"),
          col("e.texts").as("anchor"))
      pairs.groupBy("dst", "anchor").agg(count(lit(1)).as("n"))
        .groupBy("dst")
        .agg(sum("n").as("n_inlinks"), count(lit(1)).as("n_anchors"),
          array_join(slice(transform(
            sort_array(collect_list(struct((-col("n")).as("neg"),
              col("anchor").as("anchor"), col("n").as("n")))),
            e => concat(e.getField("anchor"), lit("("),
              e.getField("n").cast("string"), lit(")"))), 1, 2), "|")
            .as("top_anchors"))
        .select(col("dst").as("site"), col("n_inlinks"), col("n_anchors"),
          col("top_anchors"))
        .orderBy("site")
  }

  /** x182: HITS HUBS/AUTHORITIES — the second classic link-analysis
    * operator beside x176's PageRank (Kleinberg 1999; crawl pipelines use
    * authority scores to weight quality and hub scores to seed frontier
    * expansion). Same generator edge list as x176; two full
    * hub↔authority rounds run in FIXED-POINT integer arithmetic with
    * max-normalization after each half-step — `x·10^6 div max(x)` is
    * bit-exact in both engines and order-independent under Spark's
    * nondeterministic partition-sum order, where the float L2 normalize
    * of textbook HITS would drift. Each half-step is one equi-join of
    * edges to scores plus a groupBy — linear in edges; the normalizer is
    * a 1-row broadcast. */
  val x182 = DQ("x182_hits", Some(
    """WITH sites AS (SELECT DISTINCT doc_id % 50 AS g FROM documents),
      |e0 AS (SELECT g AS src, (g + 1) % 50 AS dst FROM sites
      |       UNION SELECT g, (g * 2 + 1) % 50 FROM sites
      |       UNION SELECT g, (g + 7) % 50 FROM sites WHERE g % 5 = 0),
      |edges AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
      |a1 AS (SELECT e.dst AS g, sum(1000000) AS s FROM edges e GROUP BY 1),
      |a1n AS (SELECT s.g, coalesce(a1.s, 0) * 1000000
      |                // (SELECT max(s) FROM a1) AS a
      |        FROM sites s LEFT JOIN a1 ON a1.g = s.g),
      |h1 AS (SELECT e.src AS g, sum(a.a) AS s
      |       FROM edges e JOIN a1n a ON a.g = e.dst GROUP BY 1),
      |h1n AS (SELECT s.g, coalesce(h1.s, 0) * 1000000
      |                // (SELECT max(s) FROM h1) AS h
      |        FROM sites s LEFT JOIN h1 ON h1.g = s.g),
      |a2 AS (SELECT e.dst AS g, sum(h.h) AS s
      |       FROM edges e JOIN h1n h ON h.g = e.src GROUP BY 1),
      |a2n AS (SELECT s.g, coalesce(a2.s, 0) * 1000000
      |                // (SELECT max(s) FROM a2) AS a
      |        FROM sites s LEFT JOIN a2 ON a2.g = s.g),
      |h2 AS (SELECT e.src AS g, sum(a.a) AS s
      |       FROM edges e JOIN a2n a ON a.g = e.dst GROUP BY 1),
      |h2n AS (SELECT s.g, coalesce(h2.s, 0) * 1000000
      |                // (SELECT max(s) FROM h2) AS h
      |        FROM sites s LEFT JOIN h2 ON h2.g = s.g)
      |SELECT a2n.g AS site, CAST(a2n.a AS BIGINT) AS auth_e6,
      |  CAST(h2n.h AS BIGINT) AS hub_e6
      |FROM a2n JOIN h2n ON h2n.g = a2n.g ORDER BY site""".stripMargin)) {
    (spark, dir) =>
      // sites/edges are ≤50/≤110 rows but their LINEAGE is the documents
      // scan; without a checkpoint each of the four half-steps re-embeds
      // the full upstream tree on BOTH its prop branches and the final
      // a2⋈h2 join re-embeds a2's whole history inside h2's — a ~500 KB
      // physical plan whose planning time dwarfed the data (measured
      // round 15; guide §3.3 "planning time itself can become the
      // bottleneck"). Checkpointing the tiny frontier after each step
      // keeps every plan constant-size. Same integer math, same rows.
      val sites = spread(table(spark, dir, "documents"))
        .select((col("doc_id") % 50).as("g")).distinct().localCheckpoint()
      val edges = sites.select(col("g").as("src"), ((col("g") + 1) % 50).as("dst"))
        .unionAll(sites.select(col("g"), (col("g") * 2 + 1) % 50))
        .unionAll(sites.filter(col("g") % 5 === 0)
          .select(col("g"), (col("g") + 7) % 50))
        .filter(col("src") =!= col("dst"))
        .distinct().localCheckpoint()
      // one half-step: propagate along (or against) the edges, then
      // max-normalize to 10^6 via a 1-row broadcast
      def half(scores: org.apache.spark.sql.DataFrame, in: String,
          out: String): org.apache.spark.sql.DataFrame = {
        val prop = edges.join(scores.withColumnRenamed("g", in), in)
          .groupBy(col(out).as("g")).agg(sum("v").as("s"))
          .localCheckpoint()
        val mx = broadcast(prop.agg(max("s").as("mx")))
        sites.join(prop, Seq("g"), "left_outer").crossJoin(mx)
          .select(col("g"),
            expr("(coalesce(s, 0L) * 1000000L) div mx").as("v"))
      }
      val h0 = sites.select(col("g"), lit(1000000L).as("v"))
      val a1 = half(h0, "src", "dst")
      val h1 = half(a1, "dst", "src")
      val a2 = half(h1, "src", "dst")
      val h2 = half(a2, "dst", "src")
      a2.withColumnRenamed("v", "auth_e6")
        .join(h2.withColumnRenamed("v", "hub_e6"), "g")
        .select(col("g").as("site"), col("auth_e6"), col("hub_e6"))
        .orderBy("site")
  }

  /** x189: CRAWL-BUDGET SCHEDULER — the politeness-constrained planning
    * query that closes the x167/x168/x180 crawl loop: each site's pending
    * page count (from the sitemap/crawl formulas) meets its
    * `Crawl-delay`-derived fetch budget over a one-hour window, and the
    * scheduler surfaces feasibility, the deficit that must spill to the
    * next window, and a deterministic priority rank (deficit first, then
    * site) — all integer arithmetic (`3600000 div delay_ms`), one
    * groupBy + one tiny window over 50 sites. At real scale the rank
    * window partitions by crawl shard; the per-site math is unchanged. */
  val x189 = DQ("x189_crawl_budget", Some(
    """WITH pages AS (SELECT DISTINCT doc_id % 50 AS g, u.r AS r
      |  FROM documents, unnest(generate_series(0, doc_id % 4)) AS u(r)),
      |s AS (SELECT g, CAST(count(*) AS BIGINT) AS n_pages,
      |        CAST((g % 4 + 1) * 500 AS BIGINT) AS delay_ms
      |      FROM pages GROUP BY g),
      |b AS (SELECT g, n_pages, delay_ms,
      |        CAST(3600000 // delay_ms AS BIGINT) AS max_fetch
      |      FROM s),
      |f AS (SELECT g, n_pages, delay_ms, max_fetch,
      |        n_pages <= max_fetch AS feasible,
      |        CAST(greatest(n_pages - max_fetch, 0) AS BIGINT) AS deficit
      |      FROM b)
      |SELECT g AS site, n_pages, delay_ms, max_fetch, feasible, deficit,
      |  CAST(row_number() OVER (ORDER BY deficit DESC, g) AS BIGINT)
      |    AS priority
      |FROM f ORDER BY site""".stripMargin)) {
    (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val s = spread(table(spark, dir, "documents"))
        .select((col("doc_id") % 50).as("g"),
          explode(sequence(lit(0), (col("doc_id") % 4).cast("int"))).as("r"))
        .distinct()
        .groupBy("g").agg(count(lit(1)).as("n_pages"))
        .withColumn("delay_ms", ((col("g") % 4 + 1) * 500).cast("long"))
        .withColumn("max_fetch", expr("3600000L div delay_ms"))
        .withColumn("feasible", col("n_pages") <= col("max_fetch"))
        .withColumn("deficit",
          greatest(col("n_pages") - col("max_fetch"), lit(0L)))
      // 50 rows reach the rank window — at corpus scale this partitions
      // by crawl shard; here one partition of 50 rows is the right plan
      s.withColumn("priority", row_number().over(
          Window.orderBy(col("deficit").desc, col("g"))).cast("long"))
        .select(col("g").as("site"), col("n_pages"), col("delay_ms"),
          col("max_fetch"), col("feasible"), col("deficit"), col("priority"))
        .orderBy("site")
  }

  /** x191: URL-LEVEL DECONTAMINATION — the complement of x14/x39's n-gram
    * contamination gates: benchmark suites publish the URLs their eval
    * sets were scraped from, and a clean corpus excludes those pages BY
    * ADDRESS before any text-level check runs (cheaper by orders of
    * magnitude at 100 TB — an equi-join on canonical URL vs a shingle
    * pass). The crawl side carries tracking query strings the manifest
    * never has, so the gate canonicalizes (x167's strip) before matching
    * — an exact-join miss would silently leak eval pages. The manifest is
    * tiny and BROADCAST; the corpus-side join is the only exchange. */
  val x191 = DQ("x191_url_decontamination", Some(
    """WITH pages AS (
      |  SELECT DISTINCT doc_id % 50 AS g, u.r AS r,
      |    'http://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/p'
      |      || CAST(u.r AS VARCHAR)
      |      || CASE WHEN u.r % 2 = 1 THEN '?utm_source=feed' ELSE '' END
      |      AS url
      |  FROM documents, unnest(generate_series(0, doc_id % 4)) AS u(r)),
      |canon AS (SELECT g, r,
      |    CASE WHEN strpos(url, '?') > 0
      |         THEN substr(url, 1, strpos(url, '?') - 1) ELSE url END AS cu
      |  FROM pages),
      |manifest AS (
      |  SELECT 'http://site' || CAST(g AS VARCHAR) || '.example/p0' AS mu
      |  FROM (SELECT DISTINCT doc_id % 50 AS g FROM documents)
      |  WHERE g % 10 = 3
      |  UNION ALL
      |  SELECT 'http://site' || CAST(g AS VARCHAR) || '.example/p1'
      |  FROM (SELECT DISTINCT doc_id % 50 AS g FROM documents)
      |  WHERE g % 7 = 2)
      |SELECT g AS site, CAST(count(*) AS BIGINT) AS n_urls,
      |  CAST(sum(CASE WHEN mu IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_blocked,
      |  CAST(sum(CASE WHEN mu IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clean
      |FROM canon LEFT JOIN manifest ON cu = mu
      |GROUP BY g ORDER BY site""".stripMargin)) {
    (spark, dir) =>
      val pages = spread(table(spark, dir, "documents"))
        .select((col("doc_id") % 50).as("g"),
          explode(sequence(lit(0), (col("doc_id") % 4).cast("int"))).as("r"))
        .distinct()
        .withColumn("url", concat(lit("http://site"), col("g").cast("string"),
          lit(".example/p"), col("r").cast("string"),
          when(col("r") % 2 === 1, "?utm_source=feed").otherwise("")))
      val sites = pages.select("g").distinct()
      val manifest = sites.filter(col("g") % 10 === 3)
        .select(concat(lit("http://site"), col("g").cast("string"),
          lit(".example/p0")).as("mu"))
        .unionAll(sites.filter(col("g") % 7 === 2)
          .select(concat(lit("http://site"), col("g").cast("string"),
            lit(".example/p1"))))
      // the gate proper: canonicalize, then one broadcast equi-join
      pages
        .withColumn("cu", when(instr(col("url"), "?") > 0,
          col("url").substr(lit(1), instr(col("url"), "?") - 1))
          .otherwise(col("url")))
        .join(broadcast(manifest), col("cu") === col("mu"), "left_outer")
        .groupBy(col("g").as("site"))
        .agg(count(lit(1)).as("n_urls"),
          sum(when(col("mu").isNotNull, 1L).otherwise(0L)).as("n_blocked"),
          sum(when(col("mu").isNull, 1L).otherwise(0L)).as("n_clean"))
        .orderBy("site")
  }

  /** x201: AVIF IMAGE TRIAGE — the newest mainstream crawl image format is
    * HEIF-packaged AV1 (ISO 23008-12 over ISO-BMFF): dimensions live in
    * the meta→iprp→ipco→ispe property chain, NOT in any codec payload, so
    * the existing `image_header` expression now walks it (7th container in
    * the dispatch). Fixtures are spec-true — the av1C config record beside
    * ispe is built by the real [[graft.functions.Av1]] sequence-header
    * encoder — and every 29th doc's ispe box type is vandalized, which
    * must surface as an unrecognized image (null), not a crash or a stale
    * read of the mangled box. */
  val x201 = DQ("x201_avif_meta", Some(
    """SELECT doc_id AS media_id, doc_id % 29 <> 0 AS ok,
      |  CASE WHEN doc_id % 29 = 0 THEN NULL ELSE 'avif' END AS format,
      |  CAST(CASE WHEN doc_id % 29 = 0 THEN NULL
      |       ELSE doc_id % 640 + 16 END AS INT) AS width,
      |  CAST(CASE WHEN doc_id % 29 = 0 THEN NULL
      |       ELSE doc_id % 360 + 16 END AS INT) AS height
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Av1, ImageHeader, ImageHeaders}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val w = (id % 640 + 16).toInt
          val h = (id % 360 + 16).toInt
          val av1c = Av1.buildAv1C(Av1.buildSeqHeaderObu(0, 8, 0, w, h))
          val avif = ImageHeaders.buildAvif(w, h, av1c,
            Array.tabulate(((id % 64) + 1).toInt)(k => (id + k).toByte))
          if (id % 29 == 0) {
            // vandalize the ispe box TYPE (its 4cc sits right after the
            // meta→iprp→ipco chain); a byte scan is fine in a fixture
            var i = 0
            var done = false
            while (!done && i + 4 <= avif.length) {
              if (avif(i) == 'i' && avif(i + 1) == 's' &&
                avif(i + 2) == 'p' && avif(i + 3) == 'e') {
                avif(i) = 'x'.toByte; done = true
              }
              i += 1
            }
          }
          (id, avif)
        }.toDF("media_id", "media")
      media
        .withColumn("m", ImageHeader.imageHeader(col("media")))
        .select(col("media_id"), col("m").isNotNull.as("ok"),
          col("m.format").as("format"), col("m.width").as("width"),
          col("m.height").as("height"))
        .orderBy("media_id")
  }

  /** x202: SVG DIMENSION SNIFF — the one mainstream image format that is
    * TEXT: dimensions come from the root element's width/height attributes
    * with a fall-back to the viewBox extents (the SVG 1.1/2 sizing rules a
    * browser applies), attributes winning when both are present and px
    * units stripping. All codegen'd `regexp_extract`/string builtins on a
    * string column — no XML library, no UDF. Fixture rotates the three
    * real-world attribute shapes (attrs only, viewBox only, px'd attrs
    * plus a decoy viewBox that must LOSE) and every 31st doc is HTML that
    * must sniff out as not-SVG with null dims. */
  val x202 = DQ("x202_svg_dims", Some(
    """SELECT doc_id AS media_id, doc_id % 31 <> 0 AS is_svg,
      |  CAST(CASE WHEN doc_id % 31 = 0 THEN NULL
      |       ELSE doc_id % 800 + 1 END AS INT) AS width,
      |  CAST(CASE WHEN doc_id % 31 = 0 THEN NULL
      |       ELSE doc_id % 450 + 1 END AS INT) AS height,
      |  doc_id % 31 <> 0 AND doc_id % 3 = 1 AS from_viewbox
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      val w = (col("doc_id") % 800 + 1).cast("string")
      val h = (col("doc_id") % 450 + 1).cast("string")
      spread(table(spark, dir, "documents").select(col("doc_id")))
        .withColumn("doc",
          when(col("doc_id") % 31 === 0,
            lit("<html><body>not svg</body></html>"))
          .when(col("doc_id") % 3 === 0, concat(
            lit("<svg xmlns=\"http://www.w3.org/2000/svg\" width=\""), w,
            lit("\" height=\""), h, lit("\"><rect/></svg>")))
          .when(col("doc_id") % 3 === 1, concat(
            lit("<svg viewBox=\"0 0 "), w, lit(" "), h,
            lit("\"><circle/></svg>")))
          .otherwise(concat(
            lit("<svg width=\""), w, lit("px\" height=\""), h,
            lit("px\" viewBox=\"0 0 9 9\"><path/></svg>"))))
        .withColumn("is_svg", col("doc").startsWith("<svg"))
        .withColumn("wa",
          regexp_extract(col("doc"), "width=\"([0-9]+)(px)?\"", 1))
        .withColumn("ha",
          regexp_extract(col("doc"), "height=\"([0-9]+)(px)?\"", 1))
        .withColumn("vw", regexp_extract(col("doc"),
          "viewBox=\"0 0 ([0-9]+) ([0-9]+)\"", 1))
        .withColumn("vh", regexp_extract(col("doc"),
          "viewBox=\"0 0 ([0-9]+) ([0-9]+)\"", 2))
        .select(col("doc_id").as("media_id"), col("is_svg"),
          when(col("is_svg"),
            coalesce(nullif(col("wa"), lit("")), nullif(col("vw"), lit(""))))
            .cast("int").as("width"),
          when(col("is_svg"),
            coalesce(nullif(col("ha"), lit("")), nullif(col("vh"), lit(""))))
            .cast("int").as("height"),
          (col("is_svg") && col("wa") === "" && col("vw") =!= "")
            .as("from_viewbox"))
        .orderBy("media_id")
  }

  /** x211: RSS/ATOM FEED PARSE — crawl DISCOVERY runs on feeds: they
    * announce new URLs before any link graph sees them, so the frontier
    * (x189's budget scheduler) wants item links and counts out of both
    * wire formats. Same posture as the SVG sniff: dispatch on the root
    * element, then codegen'd `regexp_extract_all`/`split` builtins — RSS
    * `<link>text</link>` vs Atom `<link href="..."/>` is exactly the kind
    * of format split a naive one-regex reader gets wrong. Every 27th doc
    * is HTML and must grade `none` with zero items. */
  val x211 = DQ("x211_feed_parse", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS ni,
      |    CASE WHEN doc_id % 27 = 0 THEN 'none'
      |         WHEN doc_id % 3 = 0 THEN 'atom' ELSE 'rss' END AS fmt
      |  FROM documents),
      |l AS (SELECT doc_id, fmt, ni,
      |  CASE WHEN fmt = 'none' THEN NULL ELSE
      |    (SELECT string_agg('http://s' || CAST(doc_id % 40 AS VARCHAR)
      |       || '.example/i' || CAST(u.j AS VARCHAR), ' ' ORDER BY u.j)
      |     FROM unnest(generate_series(0, ni - 1)) AS u(j)) END AS links
      |  FROM d)
      |SELECT doc_id AS media_id, fmt AS format,
      |  CAST(CASE WHEN fmt = 'none' THEN 0 ELSE ni END AS BIGINT) AS n_items,
      |  CASE WHEN fmt = 'none' THEN NULL
      |       ELSE 'feed ' || CAST(doc_id AS VARCHAR) END AS feed_title,
      |  CASE WHEN fmt = 'none' THEN NULL ELSE md5(links) END AS links_md5
      |FROM l ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      val host = concat(lit("http://s"), (col("doc_id") % 40).cast("string"),
        lit(".example/i"))
      spread(table(spark, dir, "documents").select(col("doc_id")))
        .withColumn("ni", (col("doc_id") % 4 + 1).cast("int"))
        .withColumn("doc",
          when(col("doc_id") % 27 === 0,
            lit("<html><head><title>page</title></head></html>"))
          .when(col("doc_id") % 3 === 0, concat(
            lit("<feed xmlns=\"http://www.w3.org/2005/Atom\"><title>feed "),
            col("doc_id").cast("string"), lit("</title>"),
            expr("array_join(transform(sequence(0, ni - 1), j -> concat(" +
              "'<entry><title>item ', cast(j as string), '</title>" +
              "<link href=\"http://s', cast(doc_id % 40 as string)," +
              "'.example/i', cast(j as string), '\"/></entry>')), '')"),
            lit("</feed>")))
          .otherwise(concat(
            lit("<rss version=\"2.0\"><channel><title>feed "),
            col("doc_id").cast("string"), lit("</title>"),
            expr("array_join(transform(sequence(0, ni - 1), j -> concat(" +
              "'<item><title>item ', cast(j as string), '</title>" +
              "<link>http://s', cast(doc_id % 40 as string)," +
              "'.example/i', cast(j as string), '</link></item>')), '')"),
            lit("</channel></rss>"))))
        .withColumn("format",
          when(col("doc").startsWith("<rss"), "rss")
            .when(col("doc").startsWith("<feed"), "atom")
            .otherwise("none"))
        .withColumn("links",
          when(col("format") === "rss", expr(
            "regexp_extract_all(doc, '<link>([^<]*)</link>', 1)"))
          .when(col("format") === "atom", expr(
            "regexp_extract_all(doc, '<link href=\"([^\"]*)\"/>', 1)")))
        .select(col("doc_id").as("media_id"), col("format"),
          when(col("format") === "none", 0L)
            .otherwise(size(col("links")).cast("long")).as("n_items"),
          when(col("format") =!= "none", regexp_extract(col("doc"),
            "<title>([^<]*)</title>", 1)).as("feed_title"),
          when(col("format") =!= "none",
            md5(array_join(col("links"), " "))).as("links_md5"))
        .orderBy("media_id")
  }

  /** x212: MARKDOWN → TEXT — README/docs corpora arrive as Markdown, and
    * the training text wants prose with code fences DROPPED (they poison
    * language stats and duplicate the code corpus), inline code dropped,
    * link labels KEPT (the label is prose; the URL is not), and emphasis/
    * heading markers stripped. Four codegen'd `regexp_replace` passes —
    * the fence pass is `(?s)` non-greedy so fences never swallow prose
    * between them — then whitespace collapse. The oracle rebuilds the
    * expected prose from the generator, so the md5 gate proves every
    * stripping rule, not just row counts. */
  val x212 = DQ("x212_markdown_text", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS ni
      |           FROM documents),
      |t AS (SELECT doc_id, ni,
      |  'doc ' || CAST(doc_id AS VARCHAR) || ' ' ||
      |  (SELECT string_agg('see item ' || CAST(u.j AS VARCHAR), ' '
      |     ORDER BY u.j)
      |   FROM unnest(generate_series(0, ni - 1)) AS u(j))
      |  || ' bold tail' AS expected
      |  FROM d)
      |SELECT doc_id AS media_id,
      |  CAST(ni AS BIGINT) AS n_links, CAST(1 AS BIGINT) AS n_fences,
      |  md5(expected) AS text_md5,
      |  CAST(length(expected) AS BIGINT) AS n_chars
      |FROM t ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      spread(table(spark, dir, "documents").select(col("doc_id")))
        .withColumn("ni", (col("doc_id") % 3 + 1).cast("int"))
        .withColumn("md", concat(
          lit("# doc "), col("doc_id").cast("string"), lit("\n\n"),
          expr("array_join(transform(sequence(0, ni - 1), j -> " +
            "concat('see [item ', cast(j as string), '](http://s'," +
            " cast(doc_id % 40 as string), '.example/i'," +
            " cast(j as string), ')')), ' ')"),
          lit(" `x = 1` **bold**\n```\ncode "),
          col("doc_id").cast("string"), lit("\n```\ntail\n")))
        .withColumn("clean", trim(regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(col("md"), "(?s)```.*?```", " "),
                "`[^`]*`", " "),
              "\\[([^\\]]*)\\]\\([^)]*\\)", "$1"),
            "[#*]", " "),
          "\\s+", " ")))
        .select(col("doc_id").as("media_id"),
          (size(expr("regexp_extract_all(md, '\\\\[([^\\\\]]*)\\\\]', 1)")))
            .cast("long").as("n_links"),
          (size(expr("regexp_extract_all(md, '(?s)```.*?```', 0)")))
            .cast("long").as("n_fences"),
          md5(col("clean")).as("text_md5"),
          length(col("clean")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x213: CODE-CORPUS TRIAGE — the code side of a training mix (The-Stack
    * shape) needs different diligence than prose: language from the path
    * extension, comment density (a quality signal — near-0 and near-1 are
    * both suspect), and LICENSE GATING, the one filter that is a legal
    * requirement rather than a heuristic (permissive in, copyleft out).
    * Everything is per-row string ops + one rollup on |lang| keys; the
    * fixture synthesizes real-shaped source files with per-language
    * comment syntax and rotating SPDX-recognizable headers. */
  val x213 = DQ("x213_code_triage", Some(
    """WITH f AS (SELECT doc_id,
      |    CASE doc_id % 4 WHEN 0 THEN 'py' WHEN 1 THEN 'scala'
      |         WHEN 2 THEN 'c' ELSE 'sh' END AS lang,
      |    CAST(doc_id % 3 AS BIGINT) AS n_comment,
      |    CAST(doc_id % 5 + 1 AS BIGINT) AS n_code,
      |    CASE WHEN doc_id % 7 <= 1 THEN 'mit'
      |         WHEN doc_id % 7 <= 3 THEN 'apache'
      |         WHEN doc_id % 7 <= 5 THEN 'gpl' ELSE 'none' END AS lic
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(n_comment + n_code) AS BIGINT) AS lines,
      |  CAST(sum(n_comment) * 1000000 // sum(n_comment + n_code) AS BIGINT)
      |    AS comment_ppm,
      |  CAST(sum(CASE WHEN lic IN ('mit', 'apache') THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_permissive,
      |  CAST(sum(CASE WHEN lic = 'gpl' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_copyleft,
      |  CAST(sum(CASE WHEN lic = 'none' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unlicensed
      |FROM f GROUP BY lang ORDER BY lang""".stripMargin)) {
    (spark, dir) =>
      // fixture: build the source file, then triage it back from the text
      val built = spread(table(spark, dir, "documents").select(col("doc_id")))
        .withColumn("ext", expr("element_at(array('py','scala','c','sh'), " +
          "cast(doc_id % 4 as int) + 1)"))
        .withColumn("path", concat(lit("src/f"), col("doc_id").cast("string"),
          lit("."), col("ext")))
        .withColumn("cmark", when(col("ext").isin("py", "sh"), "#")
          .otherwise("//"))
        .withColumn("header", expr(
          "CASE WHEN doc_id % 7 <= 1 THEN concat(cmark, ' SPDX: MIT License')" +
            " WHEN doc_id % 7 <= 3 THEN" +
            " concat(cmark, ' SPDX: Apache License, Version 2.0')" +
            " WHEN doc_id % 7 <= 5 THEN" +
            " concat(cmark, ' SPDX: GNU General Public License v3')" +
            " ELSE '' END"))
        // sequence(1, 0) descends in Spark — guard the empty-comment case
        .withColumn("body", expr(
          "concat(CASE WHEN doc_id % 3 = 0 THEN '' ELSE " +
          "array_join(transform(sequence(1, cast(doc_id % 3 as int))," +
          " i -> concat(cmark, ' note ', cast(i as string))), '\\n') END," +
          " '\\n'," +
          " array_join(transform(sequence(1, cast(doc_id % 5 as int) + 1)," +
          " i -> concat('val v', cast(i as string), ' = ', " +
          "cast(doc_id as string))), '\\n'))"))
        .withColumn("src", when(col("header") === "", col("body"))
          .otherwise(concat(col("header"), lit("\n"), col("body"))))
      // the triage proper: everything derives from (path, src) only
      built
        .withColumn("lang", regexp_extract(col("path"), "\\.([a-z]+)$", 1))
        .withColumn("ls", expr("filter(split(src, '\\n'), x -> x != '')"))
        .withColumn("mark", when(col("lang").isin("py", "sh"), "#")
          .otherwise("//"))
        .withColumn("n_comment", expr(
          "size(filter(ls, x -> startswith(x, concat(mark, ' note'))))"))
        .withColumn("hdr", expr(
          "CASE WHEN exists(ls, x -> startswith(x, concat(mark, ' SPDX')))" +
            " THEN 1 ELSE 0 END"))
        .withColumn("n_all", size(col("ls")) - col("hdr"))
        .withColumn("lic",
          when(col("src").contains("MIT License"), "mit")
            .when(col("src").contains("Apache License"), "apache")
            .when(col("src").contains("General Public License"), "gpl")
            .otherwise("none"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_files"),
          sum(col("n_all")).cast("long").as("lines"),
          expr("sum(n_comment) * 1000000 div sum(n_all)").as("comment_ppm"),
          sum(when(col("lic").isin("mit", "apache"), 1L).otherwise(0L))
            .as("n_permissive"),
          sum(when(col("lic") === "gpl", 1L).otherwise(0L)).as("n_copyleft"),
          sum(when(col("lic") === "none", 1L).otherwise(0L))
            .as("n_unlicensed"))
        .orderBy("lang")
  }

  /** x214: HTML TABLE EXTRACTION — structured data mining from pages
    * (the TabLib/web-table corpus shape): rows out of `<tr>`, cells out of
    * `<td>`/`<th>`, with the RAGGED-ROW reality (colspan'd junk, broken
    * markup) surfaced as a rectangularity check instead of crashing or
    * silently padding. Two nested `regexp_extract_all` passes inside the
    * row (table → rows → cells), integer audits out: row/cell counts,
    * header width vs body width agreement, and an md5 over the cell
    * stream so extraction order is pinned. */
  val x214 = DQ("x214_html_tables", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS nr,
      |    CAST(doc_id % 2 + 2 AS INT) AS ncol, doc_id % 21 = 0 AS ragged
      |  FROM documents),
      |cells AS (SELECT doc_id, nr, ncol, ragged,
      |  (SELECT string_agg(CASE WHEN x.r = 0 THEN 'h' ELSE 'c' END
      |     || CAST(x.r AS VARCHAR) || '_' || CAST(y.c AS VARCHAR)
      |     || '_' || CAST(doc_id AS VARCHAR), ' ' ORDER BY x.r, y.c)
      |   FROM unnest(generate_series(0, nr)) AS x(r),
      |        unnest(generate_series(0, ncol - 1)) AS y(c)
      |   WHERE NOT (ragged AND x.r = nr AND y.c = ncol - 1)) AS stream
      |  FROM d)
      |SELECT doc_id AS media_id,
      |  CAST(nr + 1 AS BIGINT) AS n_rows,
      |  CAST(ncol AS BIGINT) AS header_cols,
      |  NOT ragged AS rectangular,
      |  md5(stream) AS cells_md5
      |FROM cells ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      spread(table(spark, dir, "documents").select(col("doc_id")))
        .withColumn("nr", (col("doc_id") % 3 + 1).cast("int"))
        .withColumn("ncol", (col("doc_id") % 2 + 2).cast("int"))
        .withColumn("ragged", col("doc_id") % 21 === 0)
        // build: header row of <th>, nr body rows of <td>; the ragged arm
        // drops the LAST cell of the LAST row (colspan'd markup in the wild)
        .withColumn("html", expr(
          "concat('<table><tr>'," +
          " array_join(transform(sequence(0, ncol - 1), c ->" +
          "  concat('<th>h0_', cast(c as string), '_'," +
          "   cast(doc_id as string), '</th>')), '')," +
          " '</tr>'," +
          " array_join(transform(sequence(1, nr), r -> concat('<tr>'," +
          "  array_join(transform(sequence(0, ncol - 1), c ->" +
          "   CASE WHEN ragged AND r = nr AND c = ncol - 1 THEN ''" +
          "   ELSE concat('<td>c', cast(r as string), '_'," +
          "    cast(c as string), '_', cast(doc_id as string), '</td>')" +
          "   END), '')," +
          "  '</tr>')), '')," +
          " '</table>')"))
        // the extraction proper: rows, then cells per row, all in-row
        .withColumn("rows", expr(
          "regexp_extract_all(html, '<tr>(.*?)</tr>', 1)"))
        .withColumn("cellrows", expr(
          "transform(rows, r -> regexp_extract_all(r," +
            " '<t[hd]>([^<]*)</t[hd]>', 1))"))
        .select(col("doc_id").as("media_id"),
          size(col("rows")).cast("long").as("n_rows"),
          expr("size(cellrows[0])").cast("long").as("header_cols"),
          expr("forall(cellrows, r -> size(r) = size(cellrows[0]))")
            .as("rectangular"),
          md5(expr("array_join(flatten(cellrows), ' ')")).as("cells_md5"))
        .orderBy("media_id")
  }

  /** x203: PDF STRUCTURE TRIAGE — the crawl's dominant document format,
    * walked by the spec's own discovery chain (header → startxref → xref
    * → trailer → Catalog → Pages/Count) in the new `pdf_meta` expression
    * ([[graft.functions.Pdfs]]); fixtures are REAL single-xref PDFs built
    * per row with varying page counts and per-page padding, and every
    * 23rd doc loses its tail (no startxref ⇒ the file is unopenable by
    * the spec's algorithm) and must surface null, not garbage. Oracle
    * recomputes the generator arithmetic; the gate proves offsets, xref
    * entry parsing, and the object-follow chain byte-exact. */
  val x203 = DQ("x203_pdf_meta", Some(
    """SELECT doc_id AS media_id, doc_id % 23 <> 0 AS ok,
      |  CASE WHEN doc_id % 23 = 0 THEN NULL ELSE '1.7' END AS version,
      |  CAST(CASE WHEN doc_id % 23 = 0 THEN NULL
      |       ELSE doc_id % 7 + 4 END AS INT) AS n_objects,
      |  CAST(CASE WHEN doc_id % 23 = 0 THEN NULL
      |       ELSE doc_id % 7 + 1 END AS INT) AS n_pages
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Pdfs, PdfMeta}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val pdf = Pdfs.buildPdf((id % 7 + 1).toInt, (id % 50).toInt)
          (id, if (id % 23 == 0) pdf.dropRight(30) else pdf)
        }.toDF("media_id", "media")
      media
        .withColumn("m", PdfMeta.pdfMeta(col("media")))
        .select(col("media_id"), col("m").isNotNull.as("ok"),
          col("m.version").as("version"), col("m.n_objects").as("n_objects"),
          col("m.n_pages").as("n_pages"))
        .orderBy("media_id")
  }

  /** x209: EPUB TEXT EXTRACTION — the book-corpus ingest path: EPUB (IDPF
    * OCF, public) is a ZIP whose FIRST entry is the `mimetype` marker,
    * with chapters as XHTML; `zip_entries` opens it, chapter entries
    * strip to text by the same tag→space + whitespace-collapse projection
    * the HTML path uses, and chapters concatenate in reading (name)
    * order via an IN-ROW `sort_array` over collected (name, text) structs
    * — collect_list order is nondeterministic, sorting inside the row
    * makes it exact. Every 19th doc ships without the mimetype marker
    * and must grade not-EPUB with null text rather than guessing. */
  val x209 = DQ("x209_epub_text", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS nc,
      |           doc_id % 19 = 0 AS q FROM documents),
      |t AS (SELECT doc_id, nc, q,
      |  CASE WHEN q THEN NULL ELSE
      |    (SELECT string_agg('chapter ' || CAST(u.j AS VARCHAR)
      |       || ' of doc ' || CAST(doc_id AS VARCHAR), ' ' ORDER BY u.j)
      |     FROM unnest(generate_series(0, nc - 1)) AS u(j)) END AS text
      |  FROM d)
      |SELECT doc_id AS media_id, NOT q AS is_epub,
      |  CAST(CASE WHEN q THEN NULL ELSE nc END AS BIGINT) AS n_chapters,
      |  CASE WHEN q THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN q THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM t ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, ZipEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nc = (id % 3 + 1).toInt
          val chapters = (0 until nc).map { j =>
            (s"OEBPS/ch$j.xhtml",
              (s"<html><body><h1>ch$j</h1><p>chapter $j of doc $id</p>" +
                "</body></html>").getBytes, true)
          }
          val container = ("META-INF/container.xml",
            ("<?xml version=\"1.0\"?><container><rootfiles><rootfile " +
              "full-path=\"OEBPS/content.opf\"/></rootfiles></container>")
              .getBytes, true)
          val mime = ("mimetype", "application/epub+zip".getBytes, false)
          val entries = if (id % 19 == 0) container +: chapters
            else mime +: container +: chapters
          (id, Archives.buildZip(entries))
        }.toDF("media_id", "media")
      val entries = media
        .withColumn("es", ZipEntries.zipEntries(col("media")))
        .withColumn("is_epub", expr(
          "exists(es, e -> e.name = 'mimetype' AND " +
            "cast(e.payload AS STRING) = 'application/epub+zip')"))
      entries
        .select(col("media_id"), col("is_epub"),
          explode_outer(expr(
            "filter(es, e -> e.name like '%.xhtml')")).as("e"))
        .withColumn("txt", trim(regexp_replace(regexp_replace(
          col("e.payload").cast("string"), "<[^>]*>", " "), " +", " ")))
        // drop the heading run (h1 text) so only body paragraphs remain:
        // the projection keeps all text; chapters were built so the <p>
        // run is the suffix after 'chN ' — strip the leading token
        .withColumn("txt", expr("substring(txt, instr(txt, ' ') + 1)"))
        .groupBy("media_id", "is_epub")
        .agg(count(col("e")).as("nch"),
          array_join(expr("transform(sort_array(collect_list(" +
            "struct(e.name AS name, txt AS txt))), s -> s.txt)"), " ")
            .as("text"))
        .select(col("media_id"), col("is_epub"),
          when(col("is_epub"), col("nch")).as("n_chapters"),
          when(col("is_epub"), md5(col("text"))).as("text_md5"),
          when(col("is_epub"), length(col("text")).cast("long"))
            .as("n_chars"))
        .orderBy("media_id")
  }

  /** x205: CSV INGEST WITH CORRUPT-ROW ROUTING — the x170 JSONL posture
    * for the other sidecar format every pipeline ingests: `from_csv` in
    * PERMISSIVE mode with a corrupt-record column, so a malformed row
    * routes to dead-letter accounting instead of failing the batch, and
    * RFC-4180 quoted fields (embedded commas) must parse as ONE value —
    * the bug class a naive `split(',')` ships. Fixture lines rotate clean
    * / quoted / type-corrupt (non-numeric id) shapes; aggregates count
    * each route and checksum the surviving ids. Per-row parse + one
    * map-side-combinable rollup. */
  val x205 = DQ("x205_csv_ingest", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS nl
      |           FROM documents),
      |l AS (SELECT doc_id, u.k AS k,
      |             (doc_id + u.k) % 13 = 0 AS corrupt,
      |             (doc_id + u.k) % 13 <> 0 AND u.k % 3 = 1 AS quoted
      |      FROM d, unnest(generate_series(0, nl - 1)) AS u(k))
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_corrupt,
      |  CAST(sum(CASE WHEN quoted THEN 1 ELSE 0 END) AS BIGINT) AS n_quoted,
      |  CAST(coalesce(sum(CASE WHEN NOT corrupt THEN doc_id * 10 + k END), 0)
      |    AS BIGINT) AS id_sum,
      |  round(CAST(coalesce(sum(CASE WHEN NOT corrupt THEN 0.25 * k END), 0)
      |    AS DOUBLE), 2) AS score_sum
      |FROM l GROUP BY doc_id ORDER BY doc_id""".stripMargin)) {
    (spark, dir) =>
      val lines = spread(table(spark, dir, "documents"))
        .select(col("doc_id"), (col("doc_id") % 4 + 1).cast("int").as("nl"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, nl - 1), k ->
            |  CASE WHEN (doc_id + k) % 13 = 0 THEN
            |    concat('x', cast(doc_id * 10 + k as string), ',en,0.5')
            |  WHEN k % 3 = 1 THEN
            |    concat(cast(doc_id * 10 + k as string), ',"fr,ca",',
            |           cast(0.25 * k as string))
            |  ELSE
            |    concat(cast(doc_id * 10 + k as string), ',de,',
            |           cast(0.25 * k as string))
            |  END)""".stripMargin)).as("line"))
      val parsed = lines.withColumn("c", from_csv(col("line"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, lang STRING, score DOUBLE, _bad STRING"),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_bad")))
      parsed.groupBy("doc_id")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("c._bad").isNotNull, 1L).otherwise(0L))
            .as("n_corrupt"),
          sum(when(col("c._bad").isNull && col("c.lang").contains(","), 1L)
            .otherwise(0L)).as("n_quoted"),
          coalesce(sum(when(col("c._bad").isNull, col("c.id"))), lit(0L))
            .as("id_sum"),
          round(coalesce(sum(when(col("c._bad").isNull, col("c.score"))),
            lit(0.0)), 2).as("score_sum"))
        .orderBy("doc_id")
  }

  /** x204: DOCX TEXT EXTRACTION — office documents are the second-biggest
    * text carrier in a web crawl after HTML/PDF, and OOXML is just a ZIP
    * with a declared content-types part (ECMA-376, public): the x162
    * `zip_entries` expression opens it, `word/document.xml` inflates to
    * XML, and the `<w:t>` runs concatenate into the training text — no new
    * codec, pure composition. The fixture builds REAL deflated OOXML
    * containers per row (distributed map, never a driver loop); every 17th
    * doc ships without its main part and must quarantine rather than
    * crash. The oracle recomputes the generator text, so the md5 gate
    * proves the full unzip→inflate→XML-run extraction byte-exact. */
  val x204 = DQ("x204_docx_text", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS np,
      |           doc_id % 17 = 0 AS q FROM documents),
      |t AS (SELECT doc_id, np, q,
      |  CASE WHEN q THEN NULL ELSE
      |    (SELECT string_agg('para ' || CAST(u.j AS VARCHAR) || ' of doc '
      |       || CAST(doc_id AS VARCHAR) || ' tail' || CAST(u.j AS VARCHAR),
      |       ' ' ORDER BY u.j)
      |     FROM unnest(generate_series(0, np - 1)) AS u(j)) END AS text
      |  FROM d)
      |SELECT doc_id AS media_id, TRUE AS is_ooxml, q AS quarantined,
      |  CAST(CASE WHEN q THEN NULL ELSE 2 * np END AS BIGINT) AS n_runs,
      |  CASE WHEN q THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN q THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM t ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, ZipEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nPar = (id % 3 + 1).toInt
          val paras = (0 until nPar).map { j =>
            s"<w:p><w:r><w:t>para $j of doc $id</w:t></w:r>" +
              s"<w:r><w:t>tail$j</w:t></w:r></w:p>"
          }.mkString
          val docXml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
            "<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
            s"wordprocessingml/2006/main\"><w:body>$paras</w:body></w:document>"
          val ct = "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas." +
            "openxmlformats.org/package/2006/content-types\"><Default " +
            "Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
          val main = if (id % 17 == 0) "word/other.xml" else "word/document.xml"
          (id, Archives.buildZip(Seq(
            ("[Content_Types].xml", ct.getBytes, true),
            (main, docXml.getBytes, true))))
        }.toDF("media_id", "media")
      media
        .withColumn("es", ZipEntries.zipEntries(col("media")))
        .withColumn("is_ooxml",
          expr("exists(es, e -> e.name = '[Content_Types].xml')"))
        .withColumn("docpart",
          expr("filter(es, e -> e.name = 'word/document.xml')"))
        .withColumn("xml", expr(
          "CASE WHEN size(docpart) = 1 THEN cast(docpart[0].payload AS STRING) END"))
        .withColumn("runs",
          expr("regexp_extract_all(xml, '<w:t[^>]*>([^<]*)</w:t>', 1)"))
        .withColumn("text", array_join(col("runs"), " "))
        .select(col("media_id"), col("is_ooxml"),
          col("xml").isNull.as("quarantined"),
          when(col("xml").isNotNull, size(col("runs")).cast("long"))
            .as("n_runs"),
          when(col("xml").isNotNull, md5(col("text"))).as("text_md5"),
          when(col("xml").isNotNull, length(col("text")).cast("long"))
            .as("n_chars"))
        .orderBy("media_id")
  }

  /** x233: ZIP64 CONTAINERS — streaming writers emit the ZIP64 layout
    * (sentinel EOCD deferring to the ZIP64 record + locator, per-entry
    * 0x0001 extras carrying the real 64-bit sizes/offsets) even for tiny
    * archives, because they can't know sizes up front — so a crawl's
    * zips wear it regardless of size and a classic-only reader nulls
    * them all out. This gate runs x204's exact OOXML extraction with the
    * CONTAINER swapped to [[graft.functions.Archives.buildZip64]]: same
    * oracle arithmetic, so any mis-read sentinel, extra-field order slip,
    * or locator math error shifts text or drops a doc. Every 19th doc
    * misplaces its main part and must quarantine. Straight scan at
    * 100 TB. */
  val x233 = DQ("x233_zip64", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS np,
      |           doc_id % 19 = 0 AS q FROM documents),
      |t AS (SELECT doc_id, np, q,
      |  CASE WHEN q THEN NULL ELSE
      |    (SELECT string_agg('para ' || CAST(u.j AS VARCHAR) || ' of doc '
      |       || CAST(doc_id AS VARCHAR) || ' tail' || CAST(u.j AS VARCHAR),
      |       ' ' ORDER BY u.j)
      |     FROM unnest(generate_series(0, np - 1)) AS u(j)) END AS text
      |  FROM d)
      |SELECT doc_id AS media_id, TRUE AS is_ooxml, q AS quarantined,
      |  CASE WHEN q THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN q THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM t ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, ZipEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nPar = (id % 3 + 1).toInt
          val paras = (0 until nPar).map { j =>
            s"<w:p><w:r><w:t>para $j of doc $id</w:t></w:r>" +
              s"<w:r><w:t>tail$j</w:t></w:r></w:p>"
          }.mkString
          val docXml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
            "<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
            s"wordprocessingml/2006/main\"><w:body>$paras</w:body></w:document>"
          val ct = "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas." +
            "openxmlformats.org/package/2006/content-types\"><Default " +
            "Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
          val main = if (id % 19 == 0) "word/other.xml" else "word/document.xml"
          (id, Archives.buildZip64(Seq(
            ("[Content_Types].xml", ct.getBytes, true),
            (main, docXml.getBytes, true))))
        }.toDF("media_id", "media")
      media
        .withColumn("es", ZipEntries.zipEntries(col("media")))
        .withColumn("is_ooxml",
          expr("exists(es, e -> e.name = '[Content_Types].xml')"))
        .withColumn("docpart",
          expr("filter(es, e -> e.name = 'word/document.xml')"))
        .withColumn("xml", expr(
          "CASE WHEN size(docpart) = 1 THEN cast(docpart[0].payload AS STRING) END"))
        .withColumn("runs",
          expr("regexp_extract_all(xml, '<w:t[^>]*>([^<]*)</w:t>', 1)"))
        .withColumn("text", array_join(col("runs"), " "))
        .select(col("media_id"), col("is_ooxml"),
          col("xml").isNull.as("quarantined"),
          when(col("xml").isNotNull, md5(col("text"))).as("text_md5"),
          when(col("xml").isNotNull, length(col("text")).cast("long"))
            .as("n_chars"))
        .orderBy("media_id")
  }

  /** x234: TAR LONG NAMES — ustar's 100-char field covers almost nothing
    * real; kernel sources, node_modules, and checkpoint tarballs carry
    * GNU 'L' longname meta entries or PAX 'x' extended headers, and
    * POSIX writers split paths into the 155-byte prefix field. Fixtures
    * pack all three forms per doc (one >100-char GNU-named member, one
    * PAX path+size member, one prefix member), plus every 13th doc a
    * corrupted PAX record that must null the whole archive (quarantine
    * row). The oracle recomputes the resolved names from doc_id
    * arithmetic — emitting a meta entry, truncating a long name, or
    * missing the prefix joins all shift the hash. Straight scan. */
  val x234 = DQ("x234_tar_longnames", Some(
    """WITH d AS (SELECT doc_id, doc_id % 13 = 0 AS q,
      |    repeat('d', 120) || '/gnu' || CAST(doc_id % 100 AS VARCHAR)
      |      || '.txt' AS gnu_name,
      |    repeat('p', 110) || '/pax' || CAST(doc_id % 50 AS VARCHAR)
      |      || '.bin' AS pax_name,
      |    'pre' || CAST(doc_id % 10 AS VARCHAR) || '/leaf.dat' AS pre_name
      |  FROM documents)
      |SELECT doc_id AS media_id, name,
      |  CAST(n_bytes AS BIGINT) AS n_bytes
      |FROM (
      |  SELECT doc_id, gnu_name AS name, 10 + doc_id % 7 AS n_bytes
      |    FROM d WHERE NOT q
      |  UNION ALL
      |  SELECT doc_id, pax_name, 20 + doc_id % 5 FROM d WHERE NOT q
      |  UNION ALL
      |  SELECT doc_id, pre_name, 5 FROM d WHERE NOT q
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL FROM d WHERE q)
      |ORDER BY media_id, name""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, TarEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .flatMap { id =>
          val gnuName = "d" * 120 + s"/gnu${id % 100}.txt"
          val paxName = "p" * 110 + s"/pax${id % 50}.bin"
          val gnuData = new Array[Byte]((10 + id % 7).toInt)
          val paxData = new Array[Byte]((20 + id % 5).toInt)
          def paxRecord(kv: String): String = {
            var len = kv.length + 3
            while (s"$len $kv\n".length != len) len = s"$len $kv\n".length
            s"$len $kv\n"
          }
          val paxBody = (paxRecord(s"path=$paxName") +
            paxRecord(s"size=${paxData.length}")).getBytes
          val goodPax = if (id % 13 == 0) {
            // corrupt ONE pax record length: the parse must null the
            // whole archive, not resolve a half-right name
            val s = new String(paxBody); s.replaceFirst("^\\d+", "9999").getBytes
          } else paxBody
          val tar0 = Archives.buildTar(Seq(
            ("././@LongLink", "L", (gnuName + "\u0000").getBytes),
            (gnuName.take(100), "0", gnuData),
            ("pax-header", "x", goodPax),
            ("stub", "0", paxData),
            ("leaf.dat", "0", new Array[Byte](5))))
          // ustar prefix on the LAST member: patch + re-checksum
          val tar = tar0.clone()
          val last = tar.length - 1024 - 512 - 512 // header of leaf.dat
          val hdrAt = {
            // find leaf.dat's header by scanning for its name
            val s = new String(tar, java.nio.charset.StandardCharsets.ISO_8859_1)
            s.indexOf("leaf.dat\u0000")
          }
          val pfx = s"pre${id % 10}".getBytes
          System.arraycopy(pfx, 0, tar, hdrAt + 345, pfx.length)
          java.util.Arrays.fill(tar, hdrAt + 148, hdrAt + 156, 0x20.toByte)
          var sum = 0L
          var j = 0
          while (j < 512) { sum += tar(hdrAt + j) & 0xff; j += 1 }
          val cs = java.lang.Long.toOctalString(sum)
          val pad = "0" * (6 - cs.length) + cs
          System.arraycopy(pad.getBytes, 0, tar, hdrAt + 148, 6)
          tar(hdrAt + 154) = 0; tar(hdrAt + 155) = ' '
          Seq((id, tar))
        }.toDF("media_id", "media")
      media
        .withColumn("es", TarEntries.tarEntries(col("media")))
        .select(col("media_id"), explode_outer(col("es")).as("e"))
        .select(col("media_id"), col("e.name").as("name"),
          col("e.size").cast("long").as("n_bytes"))
        .orderBy("media_id", "name")
  }

  /** x232: RICH DOCX TEXT — x204 proves unzip→inflate→run extraction;
    * real Word documents interleave structure the space-joined run model
    * flattens wrong: runs inside one paragraph CONCATENATE (a bold word
    * split across `<w:r>`s must not grow a space), `<w:tab/>` is a tab,
    * `<w:br/>` a line break, paragraphs separate with newlines, and
    * TABLE cells (`<w:tbl>/<w:tr>/<w:tc>`) read cell-tab-cell,
    * row-newline-row — the shape every real extractor emits. The
    * extraction is pure built-ins (dotall regex over paragraphs, token
    * transform over runs/tabs/breaks); fixtures render split runs, a
    * tabbed+broken paragraph, and a 2×2 table per doc, and the oracle
    * recomputes the exact string from doc_id arithmetic. Every 23rd doc
    * ships a truncated main part and must quarantine. Straight scan at
    * 100 TB like x204. */
  val x232 = DQ("x232_docx_rich", Some(
    """WITH d AS (SELECT doc_id, doc_id % 23 = 0 AS q FROM documents),
      |t AS (SELECT doc_id, q, CASE WHEN q THEN NULL ELSE
      |    'head' || CAST(doc_id AS VARCHAR) || 'joined' || chr(10) ||
      |    'left' || chr(9) || 'right' || chr(10) || 'after' || chr(10) ||
      |    'a' || CAST(doc_id % 7 AS VARCHAR) || chr(9) ||
      |    'b' || CAST(doc_id % 5 AS VARCHAR) || chr(10) ||
      |    'c' || CAST(doc_id % 3 AS VARCHAR) || chr(9) || 'd' ||
      |    CAST(doc_id % 2 AS VARCHAR) END AS text
      |  FROM d)
      |SELECT doc_id AS media_id, q AS quarantined,
      |  CASE WHEN q THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN q THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM t ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, ZipEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          // para 1: one visual word split across two runs (bold split) —
          // concatenates with NO space; para 2: tab + explicit break
          val body =
            s"<w:p><w:r><w:t>head$id</w:t></w:r>" +
            "<w:r><w:t>joined</w:t></w:r></w:p>" +
            "<w:p><w:r><w:t>left</w:t></w:r><w:r><w:tab/></w:r>" +
            "<w:r><w:t>right</w:t></w:r><w:r><w:br/></w:r>" +
            "<w:r><w:t>after</w:t></w:r></w:p>" +
            "<w:tbl><w:tr>" +
            s"<w:tc><w:p><w:r><w:t>a${id % 7}</w:t></w:r></w:p></w:tc>" +
            s"<w:tc><w:p><w:r><w:t>b${id % 5}</w:t></w:r></w:p></w:tc>" +
            "</w:tr><w:tr>" +
            s"<w:tc><w:p><w:r><w:t>c${id % 3}</w:t></w:r></w:p></w:tc>" +
            s"<w:tc><w:p><w:r><w:t>d${id % 2}</w:t></w:r></w:p></w:tc>" +
            "</w:tr></w:tbl>"
          val docXml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
            "<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
            s"wordprocessingml/2006/main\"><w:body>$body</w:body></w:document>"
          val ct = "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas." +
            "openxmlformats.org/package/2006/content-types\"><Default " +
            "Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
          val mainBytes =
            if (id % 23 == 0) docXml.getBytes.dropRight(40) else docXml.getBytes
          (id, Archives.buildZip(Seq(
            ("[Content_Types].xml", ct.getBytes, true),
            ("word/document.xml", mainBytes, true))))
        }.toDF("media_id", "media")
      // table cells: within a row, cell texts join with \t; rows and
      // paragraphs alike join with \n — handled uniformly by tokenizing
      // the body into paragraph and cell boundaries
      media
        .withColumn("es", ZipEntries.zipEntries(col("media")))
        .withColumn("docpart",
          expr("filter(es, e -> e.name = 'word/document.xml')"))
        .withColumn("xml", expr(
          "CASE WHEN size(docpart) = 1 THEN cast(docpart[0].payload AS STRING) END"))
        // a truncated XML part must quarantine, not half-extract: the
        // main part is well-formed iff it still closes </w:document>
        .withColumn("xml",
          when(col("xml").contains("</w:document>"), col("xml")))
        .withColumn("rows_", expr(
          "regexp_extract_all(xml, '(?s)<w:tr[ >].*?</w:tr>|<w:p[ >/].*?</w:p>', 0)"))
        .withColumn("lines", expr(
          """transform(rows_, seg ->
            |  CASE WHEN seg LIKE '<w:tr%' THEN
            |    array_join(transform(
            |      regexp_extract_all(seg, '(?s)<w:tc[ >].*?</w:tc>', 0),
            |      c -> array_join(
            |        regexp_extract_all(c, '<w:t[^>]*>([^<]*)</w:t>', 1), '')),
            |      '\t')
            |  ELSE array_join(transform(
            |    regexp_extract_all(seg,
            |      '(<w:t[^>]*>[^<]*</w:t>|<w:tab/>|<w:br/>)', 1),
            |    tok -> CASE WHEN tok = '<w:tab/>' THEN '\t'
            |                WHEN tok = '<w:br/>' THEN '\n'
            |                ELSE regexp_extract(tok, '<w:t[^>]*>([^<]*)</w:t>', 1)
            |           END), '')
            |  END)""".stripMargin))
        .withColumn("text", array_join(col("lines"), "\n"))
        .select(col("media_id"), col("xml").isNull.as("quarantined"),
          when(col("xml").isNotNull, md5(col("text"))).as("text_md5"),
          when(col("xml").isNotNull, length(col("text")).cast("long"))
            .as("n_chars"))
        .orderBy("media_id")
  }

  /** x222: PDF TEXT EXTRACTION — x203 stops at structure; a real corpus
    * ingest needs the TEXT. `pdf_text` ([[graft.functions.Pdfs.pdfText]])
    * follows the same spec-ordered object chain as x203, then decodes each
    * page's content stream (FlateDecode via the JDK Inflater on even docs,
    * raw on odd) and replays the text operators: `Tj` literals with escape
    * decoding, kerned `TJ` arrays (a ≤ −250 em-milli adjustment reads as a
    * word space, −100 intra-line splits concatenate seamlessly), and
    * `Td`/`TD` line moves ordering runs into lines. Fixtures render each
    * document's REAL text into a 1–3-page PDF (200 chars/page, 50-char
    * lines, a kerned `p<k> of <K>` header per page); every 23rd doc loses
    * its tail and must vanish (null routes, no rows), not garble. The
    * oracle recomputes the extraction from `text` with pure string
    * slicing, so the gate proves byte-exact xref→object→stream→operator
    * round-trips on both the raw and the DEFLATE path. Scale shape: one
    * in-row expression per doc, no joins, no shuffle beyond the final
    * order — the 100 TB posture is a straight scan. */
  val x222 = DQ("x222_pdf_text", Some(
    """WITH d AS (SELECT doc_id, text,
      |    greatest(1, least(3, (length(text) + 199) // 200)) AS np
      |  FROM documents WHERE doc_id % 23 <> 0),
      |p AS (SELECT doc_id, np, u.k AS page,
      |    substr(text, (u.k - 1) * 200 + 1, 200) AS pg
      |  FROM d, unnest(generate_series(1, np)) AS u(k)),
      |e AS (SELECT doc_id, page,
      |    'p' || CAST(page AS VARCHAR) || ' of ' || CAST(np AS VARCHAR)
      |    || CASE WHEN pg = '' THEN '' ELSE chr(10) || array_to_string(
      |         list_filter([substr(pg, 1, 50), substr(pg, 51, 50),
      |                      substr(pg, 101, 50), substr(pg, 151, 50)],
      |                     x -> x <> ''), chr(10)) END AS ptext
      |  FROM p)
      |SELECT doc_id AS media_id, CAST(page AS INT) AS page,
      |  md5(ptext) AS text_md5, CAST(length(ptext) AS BIGINT) AS n_chars
      |FROM e ORDER BY media_id, page""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Pdfs, PdfText}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val np = math.max(1, math.min(3, (text.length + 199) / 200))
          val pages = (0 until np).map(k =>
            text.substring(k * 200, math.min(text.length, k * 200 + 200)))
          val pdf = Pdfs.buildPdfWithText(pages, flate = id % 2 == 0)
          (id, if (id % 23 == 0) pdf.dropRight(30) else pdf)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          posexplode(PdfText.pdfText(col("media"))).as(Seq("p0", "ptext")))
        .select(col("media_id"), (col("p0") + 1).cast("int").as("page"),
          md5(col("ptext")).as("text_md5"),
          length(col("ptext")).cast("long").as("n_chars"))
        .orderBy("media_id", "page")
  }

  /** x223: FLAC SAMPLE DECODE — the audio twin of the from-scratch JPEG
    * work: FLAC triage (x139-family) stops at STREAMINFO; this decodes the
    * FRAMES. Fixtures are REAL multi-frame FLAC streams encoded from a
    * deterministic 16-bit wave (`[[graft.functions.FlacCodec]]` — Rice
    * residuals incl. escape partitions, CONSTANT blocks on every 5th doc's
    * flat lead-in, VERBATIM/FIXED/LPC rotation, CRC-8/CRC-16); every 13th
    * doc takes a mid-frame byte flip and must route to null via the frame
    * CRC, not decode garbage. `flac_decode` emits a standard PCM WAV so
    * the proven `pcm_stats` chain reduces the audio, and the oracle
    * recomputes n/peak/Σa²/clip arithmetically from the generator formula
    * — it never sees the FLAC, so any mis-decoded residual, warmup, or
    * partition boundary shifts Σa² and fails the hash. One in-row
    * expression per doc, no shuffle beyond the final order. */
  val x223 = DQ("x223_flac_decode", Some(
    """WITH d AS (SELECT doc_id, doc_id % 89 + 3 AS k1, doc_id % 31 AS k2,
      |    300 + (doc_id % 4) * 150 AS n FROM documents
      |  WHERE doc_id % 13 <> 0),
      |s AS (SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 AND u.i < 256 THEN k2 * 10
      |         ELSE ((k1 * u.i + k2) % 1601 - 800) * 20 END AS a
      |  FROM d, unnest(generate_series(0, n - 1)) AS u(i))
      |SELECT doc_id AS media_id, CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(max(abs(a)) AS INT) AS peak,
      |  CAST(sum(a * a) AS BIGINT) AS sum_sq,
      |  CAST(sum(CASE WHEN a IN (32767, -32768) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip
      |FROM s GROUP BY 1 ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{FlacCodec, FlacDecode, PcmStats}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val k1 = (id % 89 + 3).toInt
          val k2 = (id % 31).toInt
          val n = (300 + (id % 4) * 150).toInt
          val pcm = Array.tabulate(n)(i =>
            if (id % 5 == 0 && i < 256) k2 * 10
            else ((k1 * i + k2) % 1601 - 800) * 20)
          val flac = FlacCodec.encode(1, 8000, 16, Array(pcm), 256)
          if (id % 13 == 0) {
            // flip a bit inside the last frame: CRC-16 must catch it
            flac(flac.length - 20) = (flac(flac.length - 20) ^ 0x10).toByte
          }
          (id, flac)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          PcmStats.pcmStats(FlacDecode.flacDecode(col("media"))).as("p"))
        .where(col("p").isNotNull)
        .select(col("media_id"),
          col("p.n_samples").as("n_samples"), col("p.peak").as("peak"),
          col("p.sum_sq").as("sum_sq"), col("p.n_clip").as("n_clip"))
        .orderBy("media_id")
  }

  /** x225: FLAC VAD SEGMENTATION — the round-8 ask closed end-to-end:
    * x149's windowed voice-activity mask, driven through a REAL FLAC
    * decode instead of raw WAV. `flac_decode` inverts Rice/LPC frames to
    * PCM, `pcm_frames` cuts 160-sample (20 ms @ 8 kHz) windows, and a
    * plain threshold yields the activity mask. Every 5th doc's 256-sample
    * constant lead-in (a CONSTANT FLAC subframe on the wire) lands whole
    * windows below the energy floor — the silence the VAD must trim —
    * while the modular wave stays hot; the oracle recomputes every window
    * from the generator formula, so window arithmetic AND the frame
    * decode both carry the hash. Same straight-scan shape as x223. */
  val x225 = DQ("x225_flac_vad", Some(
    """WITH d AS (SELECT doc_id, doc_id % 89 + 3 AS k1, doc_id % 31 AS k2,
      |    300 + (doc_id % 4) * 150 AS n FROM documents
      |  WHERE doc_id % 13 <> 0),
      |s AS (SELECT doc_id, u.i AS i,
      |    CASE WHEN doc_id % 5 = 0 AND u.i < 256 THEN k2 * 10
      |         ELSE ((k1 * u.i + k2) % 1601 - 800) * 20 END AS a
      |  FROM d, unnest(generate_series(0, n - 1)) AS u(i)),
      |f AS (SELECT doc_id, CAST(i // 160 AS INT) AS frame_idx,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(max(abs(a)) AS INT) AS peak,
      |    CAST(sum(a * a) AS BIGINT) AS sum_sq
      |  FROM s GROUP BY 1, 2)
      |SELECT doc_id AS media_id, frame_idx, n, peak, sum_sq,
      |  (sum_sq >= n * 5000000) AS active
      |FROM f ORDER BY media_id, frame_idx""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{FlacCodec, FlacDecode, PcmFrames}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val k1 = (id % 89 + 3).toInt
          val k2 = (id % 31).toInt
          val n = (300 + (id % 4) * 150).toInt
          val pcm = Array.tabulate(n)(i =>
            if (id % 5 == 0 && i < 256) k2 * 10
            else ((k1 * i + k2) % 1601 - 800) * 20)
          val flac = FlacCodec.encode(1, 8000, 16, Array(pcm), 256)
          if (id % 13 == 0)
            flac(flac.length - 20) = (flac(flac.length - 20) ^ 0x10).toByte
          (id, flac)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          explode(PcmFrames.pcmFrames(FlacDecode.flacDecode(col("media")),
            lit(160))).as("f"))
        .select(col("media_id"), col("f.frame_idx").as("frame_idx"),
          col("f.n").as("n"), col("f.peak").as("peak"),
          col("f.sum_sq").as("sum_sq"),
          (col("f.sum_sq") >= col("f.n") * 5000000L).as("active"))
        .orderBy("media_id", "frame_idx")
  }

  /** x228: PDF FONT-ENCODED TEXT — x222 extracts identity-encoded text;
    * real corpora route glyphs through `/Encoding` tables and `/ToUnicode`
    * CMaps, and ignoring them extracts WRONG TEXT silently (the worst
    * failure class for a training corpus: plausible-looking garbage).
    * Fixtures render each doc's text through two non-identity fonts
    * ([[graft.functions.Pdfs.buildPdfWithEncodedText]]): line 1 in
    * WinAnsi with CP1252 guillemet high bytes, line 2 through a ToUnicode
    * CMap whose one-byte codes are SHIFTED (a→0x01 … via one bfrange;
    * space and a one-to-many "qq" ligature via bfchars) — the stored
    * bytes provably never contain the plaintext, so only a real
    * per-font decode can hash-match. FlateDecode on even docs; every
    * 17th doc loses its tail and must null-route. The oracle recomputes
    * the expected extraction from `text` with pure string slicing. Same
    * straight-scan 100 TB shape as x222: one in-row expression per doc,
    * no shuffle beyond the final order. */
  val x228 = DQ("x228_pdf_encodings", Some(
    """WITH d AS (SELECT doc_id,
      |    substr(text, 1, 30) AS c1, substr(text, 31, 30) AS c2
      |  FROM documents WHERE doc_id % 17 <> 0),
      |e AS (SELECT doc_id,
      |    '«' || c1 || '»' || chr(10) || c2 || 'qq' AS ptext FROM d)
      |SELECT doc_id AS media_id, md5(ptext) AS text_md5,
      |  CAST(length(ptext) AS BIGINT) AS n_chars
      |FROM e ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Pdfs, PdfText}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val c1 = text.substring(0, math.min(30, text.length))
          val c2 = text.substring(math.min(30, text.length),
            math.min(60, text.length))
          val pdf = Pdfs.buildPdfWithEncodedText(c1, c2, flate = id % 2 == 0)
          (id, if (id % 17 == 0) pdf.dropRight(25) else pdf)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          explode(PdfText.pdfText(col("media"))).as("ptext"))
        .select(col("media_id"), md5(col("ptext")).as("text_md5"),
          length(col("ptext")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x229: MODERN-LAYOUT PDF TEXT — x222's fixtures use the classic
    * `xref` table layout that died with Acrobat 6; essentially every real
    * PDF since 1.5 stores its cross-reference as a `/Type /XRef` STREAM
    * (FlateDecode + PNG Predictor 12 row filtering, `/W` field widths)
    * and packs Catalog/Pages/Page dicts into `/Type /ObjStm` OBJECT
    * streams. Fixtures re-render x222's exact text content through that
    * modern container ([[graft.functions.Pdfs.buildPdfModern]] — same
    * content streams, different skeleton), so the oracle is x222's
    * string-slicing recomputation verbatim: any mis-decoded predictor
    * row, mis-sliced ObjStm object, or mis-read /W field shifts a page
    * boundary or loses a doc and fails the hash. Every 19th doc loses
    * its tail (startxref gone) and must null-route. Same straight-scan
    * 100 TB shape as x222. */
  val x229 = DQ("x229_pdf_modern", Some(
    """WITH d AS (SELECT doc_id, text,
      |    greatest(1, least(3, (length(text) + 199) // 200)) AS np
      |  FROM documents WHERE doc_id % 19 <> 0),
      |p AS (SELECT doc_id, np, u.k AS page,
      |    substr(text, (u.k - 1) * 200 + 1, 200) AS pg
      |  FROM d, unnest(generate_series(1, np)) AS u(k)),
      |e AS (SELECT doc_id, page,
      |    'p' || CAST(page AS VARCHAR) || ' of ' || CAST(np AS VARCHAR)
      |    || CASE WHEN pg = '' THEN '' ELSE chr(10) || array_to_string(
      |         list_filter([substr(pg, 1, 50), substr(pg, 51, 50),
      |                      substr(pg, 101, 50), substr(pg, 151, 50)],
      |                     x -> x <> ''), chr(10)) END AS ptext
      |  FROM p)
      |SELECT doc_id AS media_id, CAST(page AS INT) AS page,
      |  md5(ptext) AS text_md5, CAST(length(ptext) AS BIGINT) AS n_chars
      |FROM e ORDER BY media_id, page""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Pdfs, PdfText}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val np = math.max(1, math.min(3, (text.length + 199) / 200))
          val pages = (0 until np).map(k =>
            text.substring(k * 200, math.min(text.length, k * 200 + 200)))
          val pdf = Pdfs.buildPdfModern(pages, flate = id % 2 == 0)
          (id, if (id % 19 == 0) pdf.dropRight(30) else pdf)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          posexplode(PdfText.pdfText(col("media"))).as(Seq("p0", "ptext")))
        .select(col("media_id"), (col("p0") + 1).cast("int").as("page"),
          md5(col("ptext")).as("text_md5"),
          length(col("ptext")).cast("long").as("n_chars"))
        .orderBy("media_id", "page")
  }

  /** x230: INCREMENTALLY UPDATED PDF TEXT — every edited, form-filled,
    * or signed PDF in a crawl carries APPENDED bodies: the original file
    * plus one new section per save, chained through the trailers' /Prev
    * pointers, with updated objects REUSING their numbers at new offsets
    * (ISO 32000 §7.5.6). Readers must serve the NEWEST offset for the
    * updated object and walk the chain for everything else — a reader
    * that stops at the last xref section reads the stale page. Fixtures
    * build x222's classic document, then append an update REPLACING page
    * 1's content with the uppercased text ([[graft.functions.Pdfs
    * .appendPdfUpdate]]); the oracle recomputes page 1 as upper() and the
    * other pages verbatim, so serving the stale body, mis-merging the
    * chain, or the trailer-window bleed this round's spec caught (the
    * next section's /Prev read as the base's, faking a cycle) all fail
    * the hash. Every 29th doc loses its update TAIL — which is the real
    * torn-write case, and the documented recovery is what actual readers
    * do: the tail scan finds the last INTACT startxref (the base
    * revision's), so the doc serves its pre-update pages. The oracle
    * encodes that fallback (lowercase page 1 for the corrupt arm), which
    * pins revision recovery, not just the happy path. */
  val x230 = DQ("x230_pdf_incremental", Some(
    """WITH d AS (SELECT doc_id, text,
      |    greatest(1, least(3, (length(text) + 199) // 200)) AS np
      |  FROM documents),
      |p AS (SELECT doc_id, np, u.k AS page,
      |    CASE WHEN u.k = 1 AND doc_id % 29 <> 0
      |         THEN upper(substr(text, 1, 200))
      |         ELSE substr(text, (u.k - 1) * 200 + 1, 200) END AS pg
      |  FROM d, unnest(generate_series(1, np)) AS u(k)),
      |e AS (SELECT doc_id, page,
      |    'p' || CAST(page AS VARCHAR) || ' of ' || CAST(np AS VARCHAR)
      |    || CASE WHEN pg = '' THEN '' ELSE chr(10) || array_to_string(
      |         list_filter([substr(pg, 1, 50), substr(pg, 51, 50),
      |                      substr(pg, 101, 50), substr(pg, 151, 50)],
      |                     x -> x <> ''), chr(10)) END AS ptext
      |  FROM p)
      |SELECT doc_id AS media_id, CAST(page AS INT) AS page,
      |  md5(ptext) AS text_md5, CAST(length(ptext) AS BIGINT) AS n_chars
      |FROM e ORDER BY media_id, page""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Pdfs, PdfText}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val np = math.max(1, math.min(3, (text.length + 199) / 200))
          val pages = (0 until np).map(k =>
            text.substring(k * 200, math.min(text.length, k * 200 + 200)))
          val base = Pdfs.buildPdfWithText(pages, flate = id % 2 == 0)
          val pdf = Pdfs.appendPdfUpdate(base, 0,
            pages.head.toUpperCase(java.util.Locale.ROOT),
            flate = id % 3 == 0)
          (id, if (id % 29 == 0) pdf.dropRight(30) else pdf)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          posexplode(PdfText.pdfText(col("media"))).as(Seq("p0", "ptext")))
        .select(col("media_id"), (col("p0") + 1).cast("int").as("page"),
          md5(col("ptext")).as("text_md5"),
          length(col("ptext")).cast("long").as("n_chars"))
        .orderBy("media_id", "page")
  }

  /** x231: PDF REVISION AUDIT — the provenance signal over x230's layout:
    * how many times was each document SAVED? A multi-revision PDF may
    * carry residual content from every prior save (the classic redaction
    * failure), so curation pipelines flag revision counts > 1.
    * `pdf_revisions` walks the same bounded /Prev chain as the
    * extractors and returns 1 + updates; fixtures mix classic bases with
    * 0–2 appended updates (count = 1 + doc_id%3), modern xref-stream
    * bases (single revision), and a corrupt arm (%PDF- header broken →
    * null). The oracle is pure doc_id arithmetic — any chain mis-walk,
    * double-count, or modern-layout miss shifts a count. One in-row
    * expression per doc; straight scan at 100 TB. */
  val x231 = DQ("x231_pdf_revisions", Some(
    """SELECT doc_id AS media_id,
      |  CAST(CASE WHEN doc_id % 31 = 0 THEN NULL
      |            WHEN doc_id % 5 = 0 THEN 1
      |            ELSE 1 + doc_id % 3 END AS INT) AS revisions
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{PdfRevisions, Pdfs}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val page = text.substring(0, math.min(120, text.length))
          var pdf =
            if (id % 5 == 0) Pdfs.buildPdfModern(Seq(page), flate = id % 2 == 0)
            else Pdfs.buildPdfWithText(Seq(page), flate = id % 2 == 0)
          if (id % 5 != 0) {
            var j = 0L
            while (j < id % 3) {
              pdf = Pdfs.appendPdfUpdate(pdf, 0, s"revision $j",
                flate = j % 2 == 0)
              j += 1
            }
          }
          if (id % 31 == 0) { pdf = pdf.clone(); pdf(1) = 'X'.toByte }
          (id, pdf)
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          PdfRevisions.pdfRevisions(col("media")).as("revisions"))
        .orderBy("media_id")
  }

  /** x236: ENCRYPTED PDF TEXT — the standard security handler (ISO 32000
    * §7.6.3), the "encrypted but openable" class real crawls are full of:
    * owner-restricted documents with an EMPTY user password that every
    * reader opens silently. Fixtures re-render x222's exact text content
    * encrypted under the three real-world schemes by doc_id%3 — RC4-40
    * (V1/R2), RC4-128 (V2/R3), AES-128-CBC (V4/R4 /CFM /AESV2) — via
    * [[graft.functions.Pdfs.buildPdfEncrypted]] (per-object keys,
    * Algorithm 2/3/4/5 /O /U values, /ID in the trailer; odd docs spell
    * /O /U as escaped literals, even as hex). The oracle recomputes the
    * construction formula, so a wrong key derivation, a missed per-object
    * salt, or a misparsed /O literal garbles every byte and fails the
    * hash. Every 23rd doc carries a REAL user password and must
    * QUARANTINE (absent from output) — extracting it at all is the
    * failure. Straight scan at 100 TB: decrypt is per-row CPU, zero
    * exchanges before the output sort. */
  val x236 = DQ("x236_pdf_encrypted", Some(
    """WITH d AS (SELECT doc_id, text,
      |    greatest(1, least(3, (length(text) + 199) // 200)) AS np
      |  FROM documents WHERE doc_id % 23 <> 0),
      |p AS (SELECT doc_id, np, u.k AS page,
      |    substr(text, (u.k - 1) * 200 + 1, 200) AS pg
      |  FROM d, unnest(generate_series(1, np)) AS u(k)),
      |e AS (SELECT doc_id, page,
      |    'p' || CAST(page AS VARCHAR) || ' of ' || CAST(np AS VARCHAR)
      |    || CASE WHEN pg = '' THEN '' ELSE chr(10) || array_to_string(
      |         list_filter([substr(pg, 1, 50), substr(pg, 51, 50),
      |                      substr(pg, 101, 50), substr(pg, 151, 50)],
      |                     x -> x <> ''), chr(10)) END AS ptext
      |  FROM p)
      |SELECT doc_id AS media_id, CAST(page AS INT) AS page,
      |  md5(ptext) AS text_md5, CAST(length(ptext) AS BIGINT) AS n_chars
      |FROM e ORDER BY media_id, page""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Pdfs, PdfText}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val np = math.max(1, math.min(3, (text.length + 199) / 200))
          val pages = (0 until np).map(k =>
            text.substring(k * 200, math.min(text.length, k * 200 + 200)))
          val mode = Seq("rc4-40", "rc4-128", "aes-128")((id % 3).toInt)
          val pwd = if (id % 23 == 0) "locked" else ""
          (id, Pdfs.buildPdfEncrypted(pages, flate = id % 2 == 0, mode,
            userPwd = pwd, literalOU = id % 2 == 1))
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          posexplode(PdfText.pdfText(col("media"))).as(Seq("p0", "ptext")))
        .select(col("media_id"), (col("p0") + 1).cast("int").as("page"),
          md5(col("ptext")).as("text_md5"),
          length(col("ptext")).cast("long").as("n_chars"))
        .orderBy("media_id", "page")
  }

  /** x237: XLSX TEXT EXTRACTION — the second OOXML member: a spreadsheet
    * is the same ZIP container as x204's DOCX, but its text is SPLIT
    * across parts — `xl/sharedStrings.xml` holds the string table,
    * `xl/worksheets/sheet1.xml` holds cells that REFERENCE it by index
    * (`t="s"`, the layout Excel always writes), inline (`t="inlineStr"`),
    * or numerically. An extractor that reads only the sheet part gets
    * indices, not text — the shared-string join is the load-bearing step
    * (ECMA-376 §18.4). Cells join by tab, rows by newline. Fixtures mix
    * all three cell types per row; every 21st doc misplaces its sheet
    * part and must quarantine. Oracle recomputes the construction from
    * doc_id arithmetic. Straight scan at 100 TB like x204. */
  val x237 = DQ("x237_xlsx_text", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS ns,
      |           CAST(doc_id % 2 + 1 AS INT) AS nr, doc_id % 21 = 0 AS q
      |  FROM documents),
      |r AS (SELECT doc_id, ns, nr, q, u.r AS r
      |  FROM d, unnest(generate_series(0, nr - 1)) AS u(r)),
      |t AS (SELECT doc_id, nr, q, string_agg(
      |    'shared ' || CAST(r % ns AS VARCHAR) || ' doc '
      |    || CAST(doc_id AS VARCHAR) || chr(9)
      |    || CAST(doc_id * 10 + r AS VARCHAR) || chr(9)
      |    || 'inline ' || CAST(r AS VARCHAR) || ' x'
      |    || CAST(doc_id AS VARCHAR), chr(10) ORDER BY r) AS text
      |  FROM r GROUP BY doc_id, nr, q)
      |SELECT doc_id AS media_id, q AS quarantined,
      |  CAST(CASE WHEN q THEN NULL ELSE nr END AS BIGINT) AS n_rows,
      |  CASE WHEN q THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN q THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM t ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, ZipEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val ns = (id % 3 + 1).toInt
          val nr = (id % 2 + 1).toInt
          val sst = "<?xml version=\"1.0\"?><sst xmlns=\"http://schemas." +
            "openxmlformats.org/spreadsheetml/2006/main\" count=\"" + ns +
            "\" uniqueCount=\"" + ns + "\">" +
            (0 until ns).map(j => s"<si><t>shared $j doc $id</t></si>")
              .mkString + "</sst>"
          val rows = (0 until nr).map { r =>
            s"""<row r="${r + 1}">""" +
              s"""<c r="A${r + 1}" t="s"><v>${r % ns}</v></c>""" +
              s"""<c r="B${r + 1}"><v>${id * 10 + r}</v></c>""" +
              s"""<c r="C${r + 1}" t="inlineStr"><is><t>inline $r x$id""" +
              "</t></is></c></row>"
          }.mkString
          val sheet = "<?xml version=\"1.0\"?><worksheet xmlns=\"http://" +
            "schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
            s"<sheetData>$rows</sheetData></worksheet>"
          val ct = "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas." +
            "openxmlformats.org/package/2006/content-types\"><Default " +
            "Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
          val sheetName =
            if (id % 21 == 0) "xl/worksheets/other.xml"
            else "xl/worksheets/sheet1.xml"
          (id, Archives.buildZip(Seq(
            ("[Content_Types].xml", ct.getBytes, true),
            ("xl/sharedStrings.xml", sst.getBytes, true),
            (sheetName, sheet.getBytes, true))))
        }.toDF("media_id", "media")
      media
        .withColumn("es", ZipEntries.zipEntries(col("media")))
        .withColumn("sstPart",
          expr("filter(es, e -> e.name = 'xl/sharedStrings.xml')"))
        .withColumn("sheetPart",
          expr("filter(es, e -> e.name = 'xl/worksheets/sheet1.xml')"))
        .withColumn("sst", expr(
          """CASE WHEN size(sstPart) = 1 THEN regexp_extract_all(
            |  cast(sstPart[0].payload AS STRING),
            |  '<t[^>]*>([^<]*)</t>', 1) END""".stripMargin))
        .withColumn("sheet", expr(
          "CASE WHEN size(sheetPart) = 1 THEN cast(sheetPart[0].payload AS STRING) END"))
        .withColumn("rws",
          expr("regexp_extract_all(sheet, '<row[^>]*>(.*?)</row>', 1)"))
        .withColumn("text", expr(
          """array_join(transform(rws, r -> array_join(
            |  transform(regexp_extract_all(r, '<c [^>]*>.*?</c>', 0), c ->
            |    CASE WHEN c LIKE '%t="s"%' THEN
            |      element_at(sst, cast(regexp_extract(c, '<v>(\\d+)</v>', 1)
            |                           AS INT) + 1)
            |    WHEN c LIKE '%t="inlineStr"%' THEN
            |      regexp_extract(c, '<t[^>]*>([^<]*)</t>', 1)
            |    ELSE regexp_extract(c, '<v>([^<]*)</v>', 1) END),
            |  '\t')), '\n')""".stripMargin))
        .select(col("media_id"), col("sheet").isNull.as("quarantined"),
          when(col("sheet").isNotNull, size(col("rws")).cast("long"))
            .as("n_rows"),
          when(col("sheet").isNotNull, md5(col("text"))).as("text_md5"),
          when(col("sheet").isNotNull, length(col("text")).cast("long"))
            .as("n_chars"))
        .orderBy("media_id")
  }

  /** x238: PPTX TEXT EXTRACTION — the third OOXML member: slide decks
    * store one part per slide (`ppt/slides/slideN.xml`), text lives in
    * DrawingML `<a:t>` runs inside `<a:p>` paragraphs (ECMA-376 §21.1).
    * Runs within one paragraph CONCATENATE (a styled word split across
    * runs must not grow a space — x232's DOCX lesson applies verbatim),
    * paragraphs join by newline, and each slide is its own output row
    * (the page-model shape of the PDF gates). Every 19th doc ships a
    * torn container (no EOCD) and must emit one quarantine row. Oracle
    * recomputes the construction; straight scan at 100 TB. */
  val x238 = DQ("x238_pptx_text", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS ns,
      |           doc_id % 19 = 0 AS q FROM documents),
      |s AS (SELECT doc_id, u.s AS slide FROM d,
      |      unnest(generate_series(1, ns)) AS u(s) WHERE NOT q),
      |e AS (SELECT doc_id, slide,
      |    'title ' || CAST(slide AS VARCHAR) || ' of doc '
      |    || CAST(doc_id AS VARCHAR) || chr(10) || 'body '
      |    || CAST(slide AS VARCHAR) || ' x' || CAST(doc_id AS VARCHAR)
      |    AS text
      |  FROM s)
      |SELECT media_id, slide, text_md5, n_chars FROM (
      |  SELECT doc_id AS media_id, CAST(slide AS INT) AS slide,
      |    md5(text) AS text_md5, CAST(length(text) AS BIGINT) AS n_chars
      |  FROM e
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL, NULL FROM d WHERE q)
      |ORDER BY media_id, slide""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, ZipEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val ns = (id % 3 + 1).toInt
          val ct = "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas." +
            "openxmlformats.org/package/2006/content-types\"><Default " +
            "Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
          val slides = (1 to ns).map { s =>
            val xml = "<?xml version=\"1.0\"?><p:sld xmlns:p=\"http://" +
              "schemas.openxmlformats.org/presentationml/2006/main\" " +
              "xmlns:a=\"http://schemas.openxmlformats.org/drawingml/" +
              "2006/main\"><p:cSld><p:spTree><p:sp><p:txBody>" +
              s"<a:p><a:r><a:t>title $s </a:t></a:r>" +
              s"<a:r><a:t>of doc $id</a:t></a:r></a:p>" +
              s"<a:p><a:r><a:t>body $s x$id</a:t></a:r></a:p>" +
              "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
            (s"ppt/slides/slide$s.xml", xml.getBytes, true)
          }
          val zip = Archives.buildZip(
            ("[Content_Types].xml", ct.getBytes, true) +: slides)
          (id, if (id % 19 == 0) zip.dropRight(12) else zip)
        }.toDF("media_id", "media")
      media
        .withColumn("es", ZipEntries.zipEntries(col("media")))
        .withColumn("slides", expr(
          "filter(es, e -> e.name LIKE 'ppt/slides/slide%.xml')"))
        .select(col("media_id"), explode_outer(col("slides")).as("e"))
        .withColumn("slide", expr(
          "cast(regexp_extract(e.name, 'slide(\\\\d+)\\\\.xml', 1) AS INT)"))
        .withColumn("text", expr(
          """array_join(transform(
            |  regexp_extract_all(cast(e.payload AS STRING),
            |                     '<a:p>(.*?)</a:p>', 1),
            |  p -> array_join(
            |    regexp_extract_all(p, '<a:t>([^<]*)</a:t>', 1), '')),
            |  '\n')""".stripMargin))
        .select(col("media_id"), col("slide"),
          when(col("e").isNotNull, md5(col("text"))).as("text_md5"),
          when(col("e").isNotNull, length(col("text")).cast("long"))
            .as("n_chars"))
        .orderBy("media_id", "slide")
  }

  /** x240: AES-256 (PDF 2.0) ENCRYPTED TEXT — x236 covers the legacy
    * schemes (RC4-40/128, AES-128); new documents increasingly carry ISO
    * 32000-2's V5/R6 handler: the Algorithm-2.B iterated-hash password
    * check, the /UE-wrapped 256-bit file key, AES-256-CBC with the FILE
    * key per object (no per-object derivation), no file-ID input.
    * Fixtures re-render x222's text under V5/R6
    * ([[graft.functions.Pdfs.buildPdfEncrypted]] "aes-256"; every 3rd
    * doc spells /O /U /UE as escaped literals), every 29th doc carries a
    * real user password and must QUARANTINE. The oracle recomputes the
    * construction — a wrong 2.B round count, a mis-sliced salt, or a
    * per-object key applied where V5 forbids one garbles everything.
    * Straight scan at 100 TB; the 2.B hash is a few ms of per-doc CPU
    * paid once per open, exactly like a real reader. */
  val x240 = DQ("x240_pdf_aes256", Some(
    """WITH d AS (SELECT doc_id, text,
      |    greatest(1, least(3, (length(text) + 199) // 200)) AS np
      |  FROM documents WHERE doc_id % 29 <> 0),
      |p AS (SELECT doc_id, np, u.k AS page,
      |    substr(text, (u.k - 1) * 200 + 1, 200) AS pg
      |  FROM d, unnest(generate_series(1, np)) AS u(k)),
      |e AS (SELECT doc_id, page,
      |    'p' || CAST(page AS VARCHAR) || ' of ' || CAST(np AS VARCHAR)
      |    || CASE WHEN pg = '' THEN '' ELSE chr(10) || array_to_string(
      |         list_filter([substr(pg, 1, 50), substr(pg, 51, 50),
      |                      substr(pg, 101, 50), substr(pg, 151, 50)],
      |                     x -> x <> ''), chr(10)) END AS ptext
      |  FROM p)
      |SELECT doc_id AS media_id, CAST(page AS INT) AS page,
      |  md5(ptext) AS text_md5, CAST(length(ptext) AS BIGINT) AS n_chars
      |FROM e ORDER BY media_id, page""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Pdfs, PdfText}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val np = math.max(1, math.min(3, (text.length + 199) / 200))
          val pages = (0 until np).map(k =>
            text.substring(k * 200, math.min(text.length, k * 200 + 200)))
          (id, Pdfs.buildPdfEncrypted(pages, flate = id % 2 == 0, "aes-256",
            userPwd = if (id % 29 == 0) "locked" else "",
            literalOU = id % 3 == 0))
        }.toDF("media_id", "media")
      media
        .select(col("media_id"),
          posexplode(PdfText.pdfText(col("media"))).as(Seq("p0", "ptext")))
        .select(col("media_id"), (col("p0") + 1).cast("int").as("page"),
          md5(col("ptext")).as("text_md5"),
          length(col("ptext")).cast("long").as("n_chars"))
        .orderBy("media_id", "page")
  }

  /** x241: ODT TEXT EXTRACTION — the OpenDocument sibling of x232's DOCX:
    * a ZIP whose `content.xml` carries `<text:p>` paragraphs with
    * ELEMENT-ENCODED whitespace (`<text:s text:c="N"/>` space runs,
    * `<text:tab/>`, `<text:line-break/>` — ODF 1.3 part 3 §6.1), spans
    * that concatenate without separators, and footnote subtrees that are
    * NOT body text. Fixtures render deterministic text through
    * [[graft.functions.Odts.buildOdt]] (runs split across two spans, a
    * planted footnote, 2+ space runs collapsed the writer way); every
    * 23rd doc ships a torn container and must emit one quarantine row.
    * The oracle recomputes the construction — a stripped whitespace
    * element or a leaked footnote garbles the hash. Straight per-row
    * scan at 100 TB; no state, no shuffle. */
  val x241 = DQ("x241_odt_text", Some(
    """WITH d AS (SELECT doc_id, doc_id % 23 = 0 AS q,
      |    'Heading <' || CAST(doc_id AS VARCHAR) || '> & done' || chr(10)
      |    || 'c1' || chr(9) || 'c2  wide ' || CAST(doc_id AS VARCHAR)
      |    || chr(10) || 'note & fin' AS text
      |  FROM documents)
      |SELECT doc_id AS media_id, q AS quarantined,
      |  CASE WHEN q THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN q THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM d ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Odts, OdtText}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val odt = Odts.buildOdt(Seq(
            s"Heading <$id> & done",
            s"c1\tc2  wide $id\nnote & fin"))
          (id, if (id % 23 == 0) odt.dropRight(12) else odt)
        }.toDF("media_id", "media")
      media
        .withColumn("text", OdtText.odtText(col("media")))
        .select(col("media_id"), col("text").isNull.as("quarantined"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x242: EPUB CHAPTER EXTRACTION — three container hops deep (OCF 3.3:
    * `mimetype` gate → `META-INF/container.xml` → package document whose
    * SPINE, not zip order, is reading order). Fixtures build spec-layout
    * books through [[graft.functions.Epubs.buildEpub]] with an UNLINKED
    * decoy member a spine-less grep would wrongly include; every 17th
    * doc wears a wrong mimetype (quarantine row — not an EPUB, don't
    * guess), every 13th omits chapter 1's member (the row stays, text
    * null: route, don't silently shrink the spine). Oracle recomputes
    * the construction. Straight per-row scan at 100 TB. */
  val x242 = DQ("x242_epub_text", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS nc,
      |    doc_id % 17 = 0 AS q, doc_id % 13 = 0 AS miss FROM documents),
      |c AS (SELECT doc_id, miss, u.c AS ch FROM d,
      |    unnest(generate_series(1, nc)) AS u(c) WHERE NOT q),
      |e AS (SELECT doc_id, ch, CASE WHEN miss AND ch = 1 THEN NULL ELSE
      |    'Chapter ' || CAST(ch AS VARCHAR) || ' of doc '
      |    || CAST(doc_id AS VARCHAR) || chr(10) || 'body '
      |    || CAST(ch AS VARCHAR) || ' & <t> ' || CAST(doc_id AS VARCHAR)
      |  END AS text FROM c)
      |SELECT media_id, ch, href, text_md5, n_chars FROM (
      |  SELECT doc_id AS media_id, CAST(ch AS INT) AS ch,
      |    'ch' || CAST(ch AS VARCHAR) || '.xhtml' AS href,
      |    md5(text) AS text_md5, CAST(length(text) AS BIGINT) AS n_chars
      |  FROM e
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL, NULL, NULL FROM d WHERE q)
      |ORDER BY media_id, ch""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Epubs, EpubChapters}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nc = (id % 3 + 1).toInt
          val chapters = (1 to nc).map(c =>
            (s"ch$c.xhtml", s"Chapter $c of doc $id\nbody $c & <t> $id"))
          (id, Epubs.buildEpub(chapters,
            omit = if (id % 13 == 0) Set("ch1.xhtml") else Set.empty,
            mime = if (id % 17 == 0) "application/zip"
                   else "application/epub+zip"))
        }.toDF("media_id", "media")
      media
        .withColumn("cs", EpubChapters.epubChapters(col("media")))
        .select(col("media_id"), explode_outer(col("cs")).as("c"))
        .select(col("media_id"),
          expr("cast(regexp_extract(c.href, 'ch(\\\\d+)', 1) AS INT)")
            .as("ch"),
          col("c.href").as("href"),
          md5(col("c.text")).as("text_md5"),
          length(col("c.text")).cast("long").as("n_chars"))
        .orderBy("media_id", "ch")
  }

  /** x243: RTF TEXT EXTRACTION — the flat-token legacy format (public
    * RTF 1.9.1 spec): group-aware walk with `\ucN` as GROUP state,
    * destination groups (`\fonttbl`, `\info`, starred writer extensions)
    * skipped whole, `\'xx` cp1252 bytes, `\uN` code units with fallback
    * consumption, `\par`/`\tab` rendering. Fixtures render deterministic
    * text — braces, backslash, cp1252 high chars (é, —, ï), tab, par —
    * through [[graft.functions.Rtfs.buildRtf]], which the walk must
    * invert exactly; every 11th doc ships leading garbage (not RTF) and
    * must quarantine. Oracle recomputes the construction. Straight
    * per-row scan at 100 TB. */
  val x243 = DQ("x243_rtf_text", Some(
    """WITH d AS (SELECT doc_id, doc_id % 11 = 0 AS q,
      |    'Doc ' || CAST(doc_id AS VARCHAR) || ' {set} \ done' || chr(10)
      |    || 'café — naïve' || chr(9) || 'end '
      |    || CAST(doc_id AS VARCHAR) AS text
      |  FROM documents)
      |SELECT doc_id AS media_id, q AS quarantined,
      |  CASE WHEN q THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN q THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM d ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Rtfs, RtfText}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val rtf = Rtfs.buildRtf(
            s"Doc $id {set} \\ done\ncafé — naïve\tend $id")
          (id, if (id % 11 == 0) "GARBAGE".getBytes ++ rtf else rtf)
        }.toDF("media_id", "media")
      media
        .withColumn("text", RtfText.rtfText(col("media")))
        .select(col("media_id"), col("text").isNull.as("quarantined"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x244: EML (RFC 5322 / MIME) TEXT EXTRACTION — mail archives are a
    * major enterprise-corpus source and exercise a parsing stack nothing
    * else here does: header UNFOLDING, RFC 2047 encoded-word subjects,
    * per-part Content-Transfer-Encoding (base64 / quoted-printable /
    * 7bit rotate by doc), and multipart/alternative bodies where the
    * text/plain part must BEAT an html decoy twin (every 7th doc).
    * Fixtures render through [[graft.functions.Emls.buildEml]]; every
    * 23rd doc ships a headerless payload and must quarantine. Oracle
    * recomputes subject and body construction — a mis-decoded QP byte or
    * a leaked html decoy garbles the hash. Straight per-row scan at
    * 100 TB. */
  val x244 = DQ("x244_eml_text", Some(
    """WITH d AS (SELECT doc_id, doc_id % 23 = 0 AS q,
      |    'Sujet café ' || CAST(doc_id AS VARCHAR) AS subject,
      |    'line one ' || CAST(doc_id AS VARCHAR) || chr(10)
      |    || 'ligne café — ' || CAST(doc_id AS VARCHAR) AS text
      |  FROM documents)
      |SELECT doc_id AS media_id, q AS quarantined,
      |  CASE WHEN q THEN NULL ELSE subject END AS subject,
      |  CASE WHEN q THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN q THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM d ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Emls, EmlParse}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val eml = Emls.buildEml(
            subject = s"Sujet café $id",
            from = s"sender$id@example.org",
            date = s"Mon, 1 Jan 2024 0${id % 10}:00:00 +0000",
            text = s"line one $id\nligne café — $id",
            encoding = (id % 3) match {
              case 0 => "base64"
              case 1 => "quoted-printable"
              case _ => "7bit"
            },
            htmlAlt = id % 7 == 0)
          (id, if (id % 23 == 0)
            s"headerless junk payload $id with no colon lines".getBytes
          else eml)
        }.toDF("media_id", "media")
      media
        .withColumn("e", EmlParse.emlParse(col("media")))
        .select(col("media_id"), col("e").isNull.as("quarantined"),
          col("e.subject").as("subject"),
          md5(col("e.text")).as("text_md5"),
          length(col("e.text")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x245: GZIPPED TAR MEMBERS — tar itself has no compression, so the
    * on-disk form of a tar corpus is overwhelmingly `.tar.gz`/`.tgz`;
    * the walker detects the gzip magic itself (RFC 1952) and gunzips
    * bounded before the ustar walk, so dispatch stays extension-only.
    * Every 13th doc flips one byte inside the DEFLATE stream: CRC-32
    * catches every single-byte error deterministically, so the doc must
    * emit one quarantine row, never garbled member text. Oracle
    * recomputes the construction. Straight per-row scan at 100 TB. */
  val x245 = DQ("x245_targz_members", Some(
    """WITH d AS (SELECT doc_id, doc_id % 13 = 0 AS q FROM documents),
      |m AS (SELECT doc_id, u.m AS m FROM d,
      |    unnest(generate_series(0, 1)) AS u(m) WHERE NOT q),
      |e AS (SELECT doc_id, 'm' || CAST(m AS VARCHAR) || '.txt' AS member,
      |    CASE WHEN m = 0 THEN 'alpha ' || CAST(doc_id AS VARCHAR)
      |         ELSE 'beta café ' || CAST(doc_id AS VARCHAR) END AS text
      |  FROM m)
      |SELECT media_id, member, text_md5, n_chars FROM (
      |  SELECT doc_id AS media_id, member, md5(text) AS text_md5,
      |    CAST(length(text) AS BIGINT) AS n_chars FROM e
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL, NULL FROM d WHERE q)
      |ORDER BY media_id, member""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Archives, TarEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val tar = Archives.buildTar(Seq(
            ("m0.txt", "0", s"alpha $id".getBytes("UTF-8")),
            ("m1.txt", "0", s"beta café $id".getBytes("UTF-8"))))
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(tar); gz.close()
          val bytes = bos.toByteArray
          if (id % 13 == 0) bytes(bytes.length / 2) =
            (bytes(bytes.length / 2) ^ 0x55).toByte
          (id, bytes)
        }.toDF("media_id", "media")
      media
        .withColumn("tes", TarEntries.tarEntries(col("media")))
        .select(col("media_id"), explode_outer(col("tes")).as("e"))
        .select(col("media_id"), col("e.name").as("member"),
          md5(col("e.payload")).as("text_md5"),
          expr("length(cast(e.payload AS STRING))").cast("long")
            .as("n_chars"))
        .orderBy("media_id", "member")
  }

  /** x246: ODS TEXT EXTRACTION — the spreadsheet completes the
    * OpenDocument half of the office matrix (ODT=x241 / ODS / ODP=x247
    * mirroring DOCX/XLSX/PPTX): `content.xml` carries
    * `<table:table-row>` rows of `<table:table-cell>` cells whose text
    * lives in nested `<text:p>` paragraphs with the SAME element-encoded
    * whitespace as ODT (the 2+-space runs in the fixtures force
    * `<text:s text:c>` round-trips inside cells). Cells join by tab,
    * rows by newline — the XLSX rule in ODF dress. Every 17th doc ships
    * a torn container and must quarantine. Oracle recomputes the
    * construction. Straight per-row scan at 100 TB. */
  val x246 = DQ("x246_ods_text", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 2 + 1 AS INT) AS nr,
      |           doc_id % 17 = 0 AS q FROM documents),
      |r AS (SELECT doc_id, q, u.r AS r FROM d,
      |    unnest(generate_series(0, nr - 1)) AS u(r)),
      |t AS (SELECT doc_id, q, string_agg(
      |    'a' || CAST(r AS VARCHAR) || ' <&> ' || CAST(doc_id AS VARCHAR)
      |    || chr(9) || 'b' || CAST(r AS VARCHAR) || '  wide' || chr(9)
      |    || 'c' || CAST(r AS VARCHAR) || ' of ' || CAST(doc_id AS VARCHAR),
      |    chr(10) ORDER BY r) AS text
      |  FROM r GROUP BY doc_id, q)
      |SELECT doc_id AS media_id, q AS quarantined,
      |  CASE WHEN q THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN q THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM t ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Odts, OdsText}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nr = (id % 2 + 1).toInt
          val rows = (0 until nr).map(r =>
            Seq(s"a$r <&> $id", s"b$r  wide", s"c$r of $id"))
          val ods = Odts.buildOds(rows)
          (id, if (id % 17 == 0) ods.dropRight(12) else ods)
        }.toDF("media_id", "media")
      media
        .withColumn("text", OdsText.odsText(col("media")))
        .select(col("media_id"), col("text").isNull.as("quarantined"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x247: ODP TEXT EXTRACTION — the presentation half: one
    * `<draw:page>` per slide in deck order (the x238 page model),
    * paragraphs newline-joined inside a page, and a planted
    * `<presentation:notes>` decoy per slide that must NOT surface
    * (presenter notes are not slide text — the ODT footnote rule).
    * Every 19th doc ships a torn container → one quarantine row.
    * Oracle recomputes the construction. Straight per-row scan. */
  val x247 = DQ("x247_odp_text", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS ns,
      |           doc_id % 19 = 0 AS q FROM documents),
      |s AS (SELECT doc_id, u.s AS slide FROM d,
      |      unnest(generate_series(1, ns)) AS u(s) WHERE NOT q),
      |e AS (SELECT doc_id, slide,
      |    'title ' || CAST(slide AS VARCHAR) || ' of '
      |    || CAST(doc_id AS VARCHAR) || chr(10) || 'body '
      |    || CAST(slide AS VARCHAR) || ' & ' || CAST(doc_id AS VARCHAR)
      |  AS text FROM s)
      |SELECT media_id, slide, text_md5, n_chars FROM (
      |  SELECT doc_id AS media_id, CAST(slide AS INT) AS slide,
      |    md5(text) AS text_md5, CAST(length(text) AS BIGINT) AS n_chars
      |  FROM e
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL, NULL FROM d WHERE q)
      |ORDER BY media_id, slide""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Odts, OdpSlides}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val ns = (id % 3 + 1).toInt
          val slides = (1 to ns).map(s =>
            Seq(s"title $s of $id", s"body $s & $id"))
          val odp = Odts.buildOdp(slides)
          (id, if (id % 19 == 0) odp.dropRight(12) else odp)
        }.toDF("media_id", "media")
      media
        .withColumn("ss", OdpSlides.odpSlides(col("media")))
        .select(col("media_id"),
          posexplode_outer(col("ss")).as(Seq("p0", "text")))
        .select(col("media_id"),
          when(col("text").isNotNull, col("p0") + 1).cast("int").as("slide"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("media_id", "slide")
  }

  /** x248: BZIP2 DECODE — the compression the largest public text
    * corpora actually wear (Wikipedia dumps ship as
    * `pages-articles.xml.bz2`), built from scratch because the JDK has
    * no bzip2: per-block Huffman groups switched by MTF-coded selectors
    * → RLE2+MTF → inverse Burrows-Wheeler → RLE1, CRC-32-checked per
    * block and per stream ([[graft.functions.Bzip2]]; Bzip2Spec proves
    * TRUE interop against the system bzip2 in both directions). Each
    * document's REAL text round-trips; every 13th doc ships a truncated
    * stream (no footer — the mid-transfer corpus reality) and must
    * quarantine — wrong bytes never flow downstream. (A byte FLIP is
    * deliberately not the arm here: the subset encoder's two identical
    * Huffman groups make selector bits semantically dead, so a flip can
    * decode cleanly; Bzip2Spec pins flip-corruption on payload bytes.)
    * Straight per-row scan at 100 TB; at cluster scale one `.bz2`
    * member decodes per task exactly like the gzip arm. */
  val x248 = DQ("x248_bz2_roundtrip", Some(
    """SELECT doc_id AS media_id, doc_id % 13 = 0 AS quarantined,
      |  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE length(text) END
      |       AS BIGINT) AS n_chars
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Bzip2, BunzipBytes}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val enc = Bzip2.encode(text.getBytes("UTF-8"))
          (id, if (id % 13 == 0) enc.dropRight(6) else enc)
        }.toDF("media_id", "media")
      media
        .withColumn("text",
          BunzipBytes.bunzipBytes(col("media")).cast("string"))
        .select(col("media_id"), col("text").isNull.as("quarantined"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x249: WIKIPEDIA-DUMP INGEST — the composed capstone of x248: the
    * exact shape the largest public text corpus ships in
    * (`pages-articles.xml.bz2`): a bzip2 stream whose XML carries
    * `<page><title>…</title>…<text>…</text></page>` records (the
    * MediaWiki export schema, a public format). The plan is FULLY
    * declarative — `bunzip_bytes` (native, codegen'd) feeds
    * `regexp_extract_all` page splitting and per-page title/text pulls,
    * so Catalyst owns the whole pipeline; one dump decodes per task at
    * 100 TB with no state and no shuffle. Every 13th doc ships a torn
    * stream → one quarantine row (CRC/footer, never partial pages). */
  val x249 = DQ("x249_wikidump_pages", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS np,
      |           doc_id % 13 = 0 AS q FROM documents),
      |p AS (SELECT doc_id, u.p AS page FROM d,
      |      unnest(generate_series(1, np)) AS u(p) WHERE NOT q),
      |e AS (SELECT doc_id, page,
      |    'Article ' || CAST(page AS VARCHAR) || ' of doc '
      |    || CAST(doc_id AS VARCHAR) AS title,
      |    'Body text ' || CAST(page AS VARCHAR) || ' for doc '
      |    || CAST(doc_id AS VARCHAR) || chr(10) || 'second line '
      |    || CAST(page AS VARCHAR) AS text FROM p)
      |SELECT media_id, page, title, text_md5, n_chars FROM (
      |  SELECT doc_id AS media_id, CAST(page AS INT) AS page, title,
      |    md5(text) AS text_md5, CAST(length(text) AS BIGINT) AS n_chars
      |  FROM e
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL, NULL, NULL FROM d WHERE q)
      |ORDER BY media_id, page""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.Bzip2
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val np = (id % 3 + 1).toInt
          val xml = "<mediawiki xmlns=\"http://www.mediawiki.org/xml/" +
            "export-0.11/\"><siteinfo><sitename>graft</sitename>" +
            "</siteinfo>" + (1 to np).map { p =>
              s"<page><title>Article $p of doc $id</title><ns>0</ns>" +
                s"<id>${id * 10 + p}</id><revision><id>1</id>" +
                s"<text bytes=\"0\">Body text $p for doc $id\n" +
                s"second line $p</text></revision></page>"
            }.mkString + "</mediawiki>"
          val enc = Bzip2.encode(xml.getBytes("UTF-8"))
          (id, if (id % 13 == 0) enc.dropRight(6) else enc)
        }.toDF("media_id", "media")
      // the SHARED dump projection (streaming twin included) does the
      // decode + page walk, so the gate also pins that surface; its
      // quarantine row (page = -1, ok = false) maps to this gate's
      // null-page row
      graft.streaming.Pipelines.wikidumpPages(
          media.select(col("media_id").cast("string").as("path"),
            col("media").as("content")))
        .select(col("path").cast("long").as("media_id"),
          when(col("ok"), col("page")).as("page"),
          when(col("ok"), col("title")).as("title"),
          when(col("ok"), md5(col("text"))).as("text_md5"),
          when(col("ok"), length(col("text")).cast("long")).as("n_chars"))
        .orderBy("media_id", "page")
  }

  /** x250: MULTISTREAM DUMP SPLIT — the 100 TB posture of x249: real
    * `pages-articles` dumps are ~20 GB compressed / ~90 GB decoded,
    * far past both Spark's 2 GB column limit and any sane single-task
    * decode, and Wikipedia publishes the MULTISTREAM form (concatenated
    * bzip2 streams, pages aligned to streams) precisely so readers can
    * cut at stream boundaries. `bz2_extents` finds the byte-aligned
    * `BZh…π` signatures map-side, the slice ships ONE stream per row
    * through the (path, stream) repartition, and each extent decodes
    * independently — so damage LOCALIZES: every 13th doc ships a torn
    * page stream whose extent alone quarantines while the header,
    * later page streams, and footer still serve (the whole point of
    * the multistream layout; under x249's monolithic decode the same
    * tear killed the entire dump). Header/footer streams surface as
    * page-0 marker rows; pages number within their stream.
    * WikidumpSplitPlanSpec pins the plan shape (map-side slice, one
    * exchange on (path, stream), no whole-file column downstream). */
  val x250 = DQ("x250_wikidump_multistream", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS np,
      |           doc_id % 13 = 0 AS q FROM documents),
      |p AS (SELECT doc_id, np, q, u.p AS p FROM d,
      |      unnest(generate_series(1, np)) AS u(p)),
      |e AS (SELECT doc_id, q,
      |    CASE WHEN p <= 2 THEN 2 ELSE 3 END AS stream,
      |    CASE WHEN p <= 2 THEN p ELSE 1 END AS page,
      |    'Article ' || CAST(p AS VARCHAR) || ' of doc '
      |      || CAST(doc_id AS VARCHAR) AS title,
      |    'Body text ' || CAST(p AS VARCHAR) || ' for doc '
      |      || CAST(doc_id AS VARCHAR) || chr(10) || 'second line '
      |      || CAST(p AS VARCHAR) AS text FROM p),
      |r AS (
      |  SELECT doc_id, 1 AS stream, 0 AS page, CAST(NULL AS VARCHAR) AS title,
      |    CAST(NULL AS VARCHAR) AS text_md5, CAST(NULL AS BIGINT) AS n_chars,
      |    true AS ok FROM d
      |  UNION ALL
      |  SELECT doc_id, stream, page, title, md5(text),
      |    CAST(length(text) AS BIGINT), true FROM e
      |  WHERE NOT (q AND stream = 2)
      |  UNION ALL
      |  SELECT doc_id, 2, -1, NULL, NULL, NULL, false FROM d WHERE q
      |  UNION ALL
      |  SELECT doc_id, CASE WHEN np = 3 THEN 4 ELSE 3 END, 0, NULL, NULL,
      |    NULL, true FROM d)
      |SELECT doc_id AS media_id, CAST(stream AS INT) AS stream,
      |  CAST(page AS INT) AS page, title, text_md5, n_chars, ok
      |FROM r ORDER BY media_id, stream, page""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map(id => (id, multistreamDump(id)))
        .toDF("media_id", "media")
      graft.streaming.Pipelines.wikidumpPages(
          media.select(col("media_id").cast("string").as("path"),
            col("media").as("content")))
        .select(col("path").cast("long").as("media_id"),
          col("stream"), col("page"), col("title"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"), col("ok"))
        .orderBy("media_id", "stream", "page")
  }

  /** The x250/x251 fixture: a conforming multistream dump for `id` —
    * header stream (siteinfo, no pages), a stream with pages 1..min(2,np),
    * a third stream with page 3 when np = 3, a footer stream; every
    * 13th doc's page stream torn (dropRight 6) so its extent alone
    * quarantines. */
  private def multistreamDump(id: Long): Array[Byte] =
    multistreamDumpIndexed(id)._1

  /** [[multistreamDump]] plus its published-format index lines
    * (`offset:pageid:title`, offsets into the FINAL bytes — i.e. after
    * the torn-stream arm, exactly as a real index describes its real
    * dump). */
  private def multistreamDumpIndexed(id: Long): (Array[Byte], Seq[String]) = {
    import graft.functions.Bzip2
    val np = (id % 3 + 1).toInt
    def pg(p: Int): String =
      s"<page><title>Article $p of doc $id</title><ns>0</ns>" +
        s"<id>${id * 10 + p}</id><revision><id>1</id>" +
        s"<text bytes=\"0\">Body text $p for doc $id\n" +
        s"second line $p</text></revision></page>"
    val header = Bzip2.encode(
      ("<mediawiki xmlns=\"http://www.mediawiki.org/xml/" +
        "export-0.11/\"><siteinfo><sitename>graft</sitename>" +
        "</siteinfo>").getBytes("UTF-8"))
    val s2raw = Bzip2.encode(
      (1 to math.min(2, np)).map(pg).mkString.getBytes("UTF-8"))
    val s2 = if (id % 13 == 0) s2raw.dropRight(6) else s2raw
    val s3 =
      if (np == 3) Bzip2.encode(pg(3).getBytes("UTF-8"))
      else Array.empty[Byte]
    val footer = Bzip2.encode("</mediawiki>".getBytes("UTF-8"))
    val o2 = header.length.toLong
    val o3 = o2 + s2.length
    val lines = (1 to math.min(2, np))
      .map(p => s"$o2:${id * 10 + p}:Article $p of doc $id") ++
      (if (np == 3) Seq(s"$o3:${id * 10 + 3}:Article 3 of doc $id") else Nil)
    (header ++ s2 ++ s3 ++ footer, lines)
  }

  /** x251: RANGED DUMP READ — the reader for dumps the column path
    * cannot even LOAD: `wikidumpPagesRanged` takes a bare LISTING (no
    * binary column anywhere), scans each file for stream signatures
    * through a fixed 64 KiB buffer executor-side, repartitions the
    * (path, stream, off, len) extent rows, and only then range-reads
    * one stream's bytes per row — so a 20 GB dump needs 20 GB of
    * sequential IO but never more than one compressed stream of
    * memory on any node. Same fixture and oracle shape as x250 (the
    * dumps are REAL FILES in a scratch dir here, written by a
    * distributed foreachPartition); the extraction tail is shared
    * verbatim with the column path, so this gate pins end-to-end that
    * listing-in ≡ column-in, quarantine arms included. */
  val x251 = DQ("x251_wikidump_ranged", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS np,
      |           doc_id % 13 = 0 AS q FROM documents WHERE doc_id % 5 = 0),
      |p AS (SELECT doc_id, np, q, u.p AS p FROM d,
      |      unnest(generate_series(1, np)) AS u(p)),
      |e AS (SELECT doc_id, q,
      |    CASE WHEN p <= 2 THEN 2 ELSE 3 END AS stream,
      |    CASE WHEN p <= 2 THEN p ELSE 1 END AS page,
      |    'Article ' || CAST(p AS VARCHAR) || ' of doc '
      |      || CAST(doc_id AS VARCHAR) AS title,
      |    'Body text ' || CAST(p AS VARCHAR) || ' for doc '
      |      || CAST(doc_id AS VARCHAR) || chr(10) || 'second line '
      |      || CAST(p AS VARCHAR) AS text FROM p),
      |r AS (
      |  SELECT doc_id, 1 AS stream, 0 AS page, CAST(NULL AS VARCHAR) AS title,
      |    CAST(NULL AS VARCHAR) AS text_md5, CAST(NULL AS BIGINT) AS n_chars,
      |    true AS ok FROM d
      |  UNION ALL
      |  SELECT doc_id, stream, page, title, md5(text),
      |    CAST(length(text) AS BIGINT), true FROM e
      |  WHERE NOT (q AND stream = 2)
      |  UNION ALL
      |  SELECT doc_id, 2, -1, NULL, NULL, NULL, false FROM d WHERE q
      |  UNION ALL
      |  SELECT doc_id, CASE WHEN np = 3 THEN 4 ELSE 3 END, 0, NULL, NULL,
      |    NULL, true FROM d)
      |SELECT doc_id AS media_id, CAST(stream AS INT) AS stream,
      |  CAST(page AS INT) AS page, title, text_md5, n_chars, ok
      |FROM r ORDER BY media_id, stream, page""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("x251_dumps")
        .toFile.getAbsolutePath
      spread(table(spark, dir, "documents").select(col("doc_id"))
          .where(col("doc_id") % 5 === 0))
        .as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(tmp, s"$id.xml.bz2"),
              multistreamDump(id))
          }
        }
      val paths = new java.io.File(tmp).listFiles.map(_.getAbsolutePath).toSeq
      graft.streaming.Pipelines.wikidumpPagesRanged(paths.toDF("path"))
        .select(
          regexp_extract(col("path"), "(\\d+)\\.xml\\.bz2$", 1)
            .cast("long").as("media_id"),
          col("stream"), col("page"), col("title"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"), col("ok"))
        .orderBy("media_id", "stream", "page")
  }

  /** x252: WIKITEXT → PLAIN TEXT — x249/x250 emit RAW wikitext; the
    * corpus stage needs prose. `wikitext_plain` (native, codegen'd —
    * [[graft.functions.Wikitext]]) resolves the public MediaWiki
    * constructs with nesting a regex cannot express: each page body
    * here carries bold quotes, a `{{cite}}` template, piped and plain
    * `[[links]]`, a `<ref>`, a heading, a list item, a `{|table|}`,
    * and an `&amp;` entity, and the oracle states the expected prose
    * BY CONSTRUCTION. Runs inside the shared [[Pipelines.wikidumpPlain]]
    * projection (streaming twin identical), so the markup strip rides
    * the same per-extent parallelism as the decode — per-row, no
    * extra exchange at 100 TB. */
  val x252 = DQ("x252_wikitext_plain", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS np
      |           FROM documents),
      |p AS (SELECT doc_id, u.p AS p FROM d,
      |      unnest(generate_series(1, np)) AS u(p)),
      |e AS (SELECT doc_id, p,
      |  'Body text ' || CAST(p AS VARCHAR) || ' of doc '
      |  || CAST(doc_id AS VARCHAR) || ' and plain ' || CAST(p AS VARCHAR)
      |  || chr(10) || 'Sec ' || CAST(p AS VARCHAR) || chr(10) || 'item '
      |  || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || 'Tail & '
      |  || CAST(doc_id AS VARCHAR) AS plain FROM p)
      |SELECT doc_id AS media_id, CAST(p AS INT) AS page,
      |  md5(plain) AS plain_md5, CAST(length(plain) AS BIGINT) AS n_chars
      |FROM e ORDER BY media_id, page""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.Bzip2
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val np = (id % 3 + 1).toInt
          val xml = "<mediawiki><siteinfo><sitename>graft</sitename>" +
            "</siteinfo>" + (1 to np).map { p =>
              val wt = s"'''Body''' text $p{{cite|$id}} of " +
                s"[[Doc $id|doc $id]] and [[plain $p]]<ref>r$p</ref>\n" +
                s"== Sec $p ==\n* item $id\n{| class=x\n|-\n|cell\n|}\n" +
                s"Tail &amp; $id"
              s"<page><title>Article $p</title><ns>0</ns><revision>" +
                s"<text bytes=\"0\">$wt</text></revision></page>"
            }.mkString + "</mediawiki>"
          (id, Bzip2.encode(xml.getBytes("UTF-8")))
        }.toDF("media_id", "media")
      graft.streaming.Pipelines.wikidumpPlain(
          media.select(col("media_id").cast("string").as("path"),
            col("media").as("content")))
        .select(col("path").cast("long").as("media_id"), col("page"),
          md5(col("plain")).as("plain_md5"),
          length(col("plain")).cast("long").as("n_chars"))
        .orderBy("media_id", "page")
  }

  /** x253: ZSTD DECODE — the compression modern corpus distributions
    * actually ship (`.zst`, `.warc.zst`, `.tar.zst`), decoded through
    * the `zstd-jni` binding Spark itself bundles for its shuffle codec
    * (a public dependency already on every executor — nothing to
    * hand-build, unlike bzip2/LZMA). Each document's REAL text
    * round-trips through a checksummed frame; every 13th doc ships a
    * TRUNCATED frame and every 17th a payload byte-FLIP (the content
    * checksum catches it) — both quarantine, wrong bytes never flow.
    * ZstdSpec proves two-way interop against the system `zstd` binary
    * and multi-frame concatenations decoding whole; the member chain
    * (`archiveText`) unwraps `.zst` members and walks `.tar.zst` like
    * `.tar.gz`. Per-row scan at 100 TB, exactly like the gzip arm. */
  val x253 = DQ("x253_zstd_roundtrip", Some(
    """SELECT doc_id AS media_id,
      |  doc_id % 13 = 0 OR doc_id % 17 = 0 AS quarantined,
      |  CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
      |       ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
      |       ELSE length(text) END AS BIGINT) AS n_chars
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Zstandard, ZstdBytes}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val enc = Zstandard.encode(text.getBytes("UTF-8"))
          val arm =
            if (id % 13 == 0) enc.dropRight(5)
            else if (id % 17 == 0) {
              val b = enc.clone()
              // flip inside the compressed body (past the 4-byte magic
              // + frame header), caught by the content checksum
              b(b.length / 2) = (b(b.length / 2) ^ 0x41).toByte
              b
            } else enc
          (id, arm)
        }.toDF("media_id", "media")
      media
        .withColumn("text",
          ZstdBytes.zstdBytes(col("media")).cast("string"))
        .select(col("media_id"), col("text").isNull.as("quarantined"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x254: XZ/LZMA DECODE — `.tar.xz` and many academic dumps ship in
    * XZ, and the JDK has no LZMA; built from scratch on the public
    * Tukaani xz-file-format + 7-Zip LZMA specifications (the x248
    * bzip2 precedent, one format over): range decoder, the full
    * 12-state LZMA machine, LZMA2 chunking with state/props/dict
    * resets, the XZ container with CRC-checked headers/index/footer
    * and CRC32/CRC64/SHA-256 block checks ([[graft.functions.Xz]]).
    * Fixtures alternate the subset encoder's two modes (literal-only
    * LZMA chunks through a REAL range encoder / uncompressed chunks);
    * MATCH decoding is proven against the system `xz` at presets
    * 0/6/9e in XzSpec — both directions. Every 13th doc ships a
    * truncated container, every 17th a payload flip caught by the
    * block check — quarantine, wrong bytes never flow. Per-row scan
    * at 100 TB like the other codec arms. */
  val x254 = DQ("x254_xz_roundtrip", Some(
    """SELECT doc_id AS media_id,
      |  doc_id % 13 = 0 OR doc_id % 17 = 0 AS quarantined,
      |  CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
      |       ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
      |       ELSE length(text) END AS BIGINT) AS n_chars
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Xz, XzBytes}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          // id%3 rotates the subset-encoder modes so every decode
          // surface sits under the oracle: uncompressed chunks,
          // literal-only LZMA, and GREEDY-MATCH LZMA (real match/
          // distance coding + matched literals, hermetically)
          val enc = Xz.encode(text.getBytes("UTF-8"),
            literalLzma = id % 3 == 1, chunkSize = 1 << 9,
            greedyMatch = id % 3 == 2)
          val arm =
            if (id % 13 == 0) enc.dropRight(7)
            else if (id % 17 == 0) {
              val b = enc.clone()
              b(b.length / 2) = (b(b.length / 2) ^ 0x55).toByte
              b
            } else enc
          (id, arm)
        }.toDF("media_id", "media")
      media
        .withColumn("text", XzBytes.xzBytes(col("media")).cast("string"))
        .select(col("media_id"), col("text").isNull.as("quarantined"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x255: 7Z CONTAINER WALK — Stack Exchange dumps and mirror
    * corpora ship `.7z`; `sevenz_entries` walks the public 7z format
    * from scratch ([[graft.functions.SevenZip]]): signature/start-
    * header CRC chain, raw AND LZMA2-compressed headers (alternating
    * by doc), UTF-16LE names, and per-folder payload decode across
    * ALL THREE plain-archive coders — the three members here
    * round-robin Copy, LZMA2 (x254's chunk layer), and raw LZMA
    * (x254's range decoder, no framing). Two-level quarantine: every
    * 13th doc tears the container (ONE dead-letter row), every 17th
    * flips the first pack byte — member `a.txt` alone dead-letters
    * (folder CRC) while `b.txt`/`c.txt` keep serving. No 7z binary
    * exists in this environment, so fixtures are build-then-parse
    * inversion (the x162 ZIP posture). Per-row scan at 100 TB. */
  val x255 = DQ("x255_sevenz_members", Some(
    """WITH d AS (SELECT doc_id, doc_id % 13 = 0 AS tq,
      |    doc_id % 17 = 0 AND doc_id % 13 <> 0 AS fq FROM documents),
      |m AS (SELECT doc_id, fq, u.m AS m FROM d,
      |    unnest(generate_series(0, 2)) AS u(m) WHERE NOT tq),
      |e AS (SELECT doc_id,
      |    CASE m WHEN 0 THEN 'a.txt' WHEN 1 THEN 'b.txt'
      |           ELSE 'c.txt' END AS member,
      |    fq AND m = 0 AS dead,
      |    CASE m WHEN 0 THEN 'alpha ' WHEN 1 THEN 'bravo '
      |           ELSE 'charlie ' END || CAST(doc_id AS VARCHAR) AS text
      |  FROM m)
      |SELECT media_id, member, ok, text_md5, n_chars FROM (
      |  SELECT doc_id AS media_id, member, NOT dead AS ok,
      |    CASE WHEN dead THEN NULL ELSE md5(text) END AS text_md5,
      |    CAST(CASE WHEN dead THEN NULL ELSE length(text) END AS BIGINT)
      |      AS n_chars
      |  FROM e
      |  UNION ALL
      |  SELECT doc_id, NULL, false, NULL, NULL FROM d WHERE tq)
      |ORDER BY media_id, member""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{SevenZip, SevenZipEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val arc = SevenZip.build(Seq(
            ("a.txt", s"alpha $id".getBytes("UTF-8")),
            ("b.txt", s"bravo $id".getBytes("UTF-8")),
            ("c.txt", s"charlie $id".getBytes("UTF-8"))),
            encodedHeader = id % 2 == 1)
          val arm =
            if (id % 13 == 0) arc.dropRight(5)
            else if (id % 17 == 0) {
              val b = arc.clone()
              b(32) = (b(32) ^ 0x55).toByte // first pack byte → a.txt
              b
            } else arc
          (id, arm)
        }.toDF("media_id", "media")
      media
        .withColumn("es", SevenZipEntries.sevenzEntries(col("media")))
        .select(col("media_id"), explode_outer(col("es")).as("e"))
        .select(col("media_id"), col("e.name").as("member"),
          coalesce(col("e.crc_ok"), lit(false)).as("ok"),
          md5(col("e.payload")).as("text_md5"),
          expr("length(cast(e.payload AS STRING))").cast("long")
            .as("n_chars"))
        .orderBy("media_id", "member")
  }

  /** x256's fixture directories (the x267 setup-caching note applies). */
  private val x256Fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** x256 fixture build (SETUP, not the operator under test): one
    * bzip2-encode + write of the dump/index pair per (JVM, sf dir).
    * Named so [[graft.Bench]] can run it in its untimed setup phase
    * (via [[fixtureSetups]]) — the timed region then measures only the
    * index parse + range fetch, never the from-scratch bzip2 ENCODER
    * (~1 MB/s). Idempotent: standalone callers (Verify, tests) hit the
    * same computeIfAbsent on first use. */
  private[graft] def x256FixtureDir(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    x256Fixtures.computeIfAbsent(dir, { _ =>
      import spark.implicits._
      import graft.functions.Bzip2
      val t = java.nio.file.Files.createTempDirectory("x256_dumps")
        .toFile.getAbsolutePath
      spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            val (bytes, lines) = multistreamDumpIndexed(id)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(t, s"$id.xml.bz2"), bytes)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(t, s"$id-index.txt.bz2"),
              Bzip2.encode((lines.mkString("\n") + "\n").getBytes("UTF-8")))
          }
        }
      t
    })

  /** x256: RANDOM-ACCESS PAGE FETCH over the published multistream
    * INDEX — the whole point of the multistream distribution: a
    * `…-index.txt.bz2` of `offset:pageid:title` lines lets a reader
    * serve SINGLE pages out of a 20 GB dump by range-reading one
    * stream each, never scanning the dump. Full published-format
    * fidelity: per-doc dump AND index files land on disk, the index
    * parses through [[Pipelines.wikidumpIndexLines]] (limit-3 split —
    * titles may carry ':'), and [[Pipelines.wikidumpFetch]] reads only
    * hit extents (WikidumpFetchSpec proves un-hit dump files can be
    * ABSENT entirely). Every 11th doc's page 1 is requested; for the
    * 13-torn docs that page's stream is torn, so the fetch must emit
    * its (ok = false) row — the index promised a page the stream
    * cannot deliver, and the row routes instead of dropping. */
  val x256 = DQ("x256_wikidump_fetch", Some(
    """WITH d AS (SELECT doc_id, doc_id % 13 = 0 AS q FROM documents
      |           WHERE doc_id % 11 = 0),
      |e AS (SELECT doc_id, q,
      |  'Article 1 of doc ' || CAST(doc_id AS VARCHAR) AS title,
      |  'Body text 1 for doc ' || CAST(doc_id AS VARCHAR) || chr(10)
      |    || 'second line 1' AS text FROM d)
      |SELECT doc_id AS media_id, doc_id * 10 + 1 AS page_id,
      |  q AS quarantined,
      |  CASE WHEN q THEN NULL ELSE title END AS title,
      |  CASE WHEN q THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN q THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM e ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.Bzip2
      // fixture build is SETUP, not the operator under test: built in
      // Bench's untimed setup phase (fixtureSetups); first-use fallback
      // here for standalone callers (see x256FixtureDir)
      val tmp = Dataflow.x256FixtureDir(spark, dir)
      val idx = graft.streaming.Pipelines.wikidumpIndexLines(
          spark.read.format("binaryFile")
            .option("pathGlobFilter", "*-index.txt.bz2")
            .load(tmp)
            .select(col("path"), col("content")))
        .withColumn("path",
          regexp_replace(col("path"), "-index\\.txt\\.bz2$", ".xml.bz2"))
        // materialized once: wikidumpFetch consumes idx twice (hit join +
        // extent walk) and its lineage is the whole index-file read+decode
        // — at 10× data that is 2 × 50k small-file bunzips saved
        .localCheckpoint()
      val wanted = table(spark, dir, "documents")
        .where(col("doc_id") % 11 === 0)
        .select((col("doc_id") * 10 + 1).as("page_id"))
      graft.streaming.Pipelines.wikidumpFetch(idx, wanted)
        .select(
          regexp_extract(col("path"), "(\\d+)\\.xml\\.bz2$", 1)
            .cast("long").as("media_id"),
          col("page_id"), (!col("ok")).as("quarantined"),
          col("title"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x257: XZ FILTER CHAINS — real `.tar.xz` distributions wear
    * PREFILTERS before LZMA2 (delta for numeric tables, BCJ x86 for
    * binaries); the block-header filter list drives them, decode
    * applies the inverses after the LZMA2 stage, and the block check
    * runs over the FINAL bytes. Docs round-robin none / delta (doc-id
    * varied distance) / BCJ x86 — the fixture text carries 艾 (0xE8
    * lead byte) and 退 (0xE9) so the branch converter genuinely
    * rewrites displacements inside valid UTF-8; XzSpec additionally
    * proves both chains against the system `xz --delta` / `--x86`
    * output in both directions. Torn containers quarantine. */
  val x257 = DQ("x257_xz_filter_chains", Some(
    """SELECT doc_id AS media_id, doc_id % 13 = 0 AS quarantined,
      |  CASE WHEN doc_id % 13 = 0 THEN NULL
      |       ELSE md5(text || ' 艾退 ' || CAST(doc_id AS VARCHAR))
      |  END AS text_md5,
      |  CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
      |       ELSE length(text || ' 艾退 ' || CAST(doc_id AS VARCHAR))
      |  END AS BIGINT) AS n_chars
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Xz, XzBytes}
      val media = spread(table(spark, dir, "documents")
          .select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .map { case (id, text) =>
          val aug = text + " 艾退 " + id
          val pf = (id % 3) match {
            case 0 => None
            case 1 => Some((0x03, Array[Byte]((id % 4).toByte)))
            case _ => Some((0x04, Array.empty[Byte]))
          }
          val enc = Xz.encode(aug.getBytes("UTF-8"), literalLzma = true,
            chunkSize = 1 << 10, prefilter = pf)
          (id, if (id % 13 == 0) enc.dropRight(7) else enc)
        }.toDF("media_id", "media")
      media
        .withColumn("text", XzBytes.xzBytes(col("media")).cast("string"))
        .select(col("media_id"), col("text").isNull.as("quarantined"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x258: ARTICLE-ONLY CORPUS VIEW — what a training-data stage
    * actually keeps from `pages-articles`: ns-0, non-redirect pages
    * with markup stripped. Each dump here carries one real article,
    * one `Talk:` page (ns 1 — drop by the published `<ns>` element),
    * and one `#REDIRECT` stub (ns 0 but `<redirect/>` present — drop);
    * [[Pipelines.wikidumpArticles]] must keep exactly the article,
    * with `wikitext_plain` applied. Torn dumps (every 13th) contribute
    * NOTHING here — corpus views filter ok=true; their quarantine
    * accounting lives in wikidumpPages, where x250 pins it. */
  val x258 = DQ("x258_wikidump_articles", Some(
    """SELECT doc_id AS media_id,
      |  'Article of doc ' || CAST(doc_id AS VARCHAR) AS title,
      |  md5('Bold link label ' || CAST(doc_id AS VARCHAR) || ' done')
      |    AS plain_md5,
      |  CAST(length('Bold link label ' || CAST(doc_id AS VARCHAR)
      |    || ' done') AS BIGINT) AS n_chars
      |FROM documents WHERE doc_id % 13 <> 0 ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.Bzip2
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val xml = "<mediawiki><siteinfo><sitename>graft</sitename>" +
            "</siteinfo>" +
            s"<page><title>Article of doc $id</title><ns>0</ns>" +
            s"<id>${id * 10 + 1}</id><revision><id>1</id>" +
            "<text bytes=\"0\">'''Bold''' link " +
            s"[[Target|label $id]] done</text></revision></page>" +
            s"<page><title>Talk:Article of doc $id</title><ns>1</ns>" +
            s"<id>${id * 10 + 2}</id><revision><id>1</id>" +
            s"<text bytes=\"0\">talk chatter $id</text></revision></page>" +
            s"<page><title>Alias $id</title><ns>0</ns>" +
            s"""<redirect title="Article of doc $id" />""" +
            s"<id>${id * 10 + 3}</id><revision><id>1</id>" +
            s"<text bytes=\"0\">#REDIRECT [[Article of doc $id]]</text>" +
            "</revision></page></mediawiki>"
          val enc = Bzip2.encode(xml.getBytes("UTF-8"))
          (id, if (id % 13 == 0) enc.dropRight(6) else enc)
        }.toDF("media_id", "media")
      graft.streaming.Pipelines.wikidumpArticles(
          media.select(col("media_id").cast("string").as("path"),
            col("media").as("content")))
        .select(col("path").cast("long").as("media_id"), col("title"),
          md5(col("plain")).as("plain_md5"),
          length(col("plain")).cast("long").as("n_chars"))
        .orderBy("media_id")
  }

  /** x259: DUMP → CORPUS CAPSTONE — the whole wikidump surface
    * composed into the pipeline a training-data stage actually runs:
    * [[Pipelines.wikidumpArticles]] (decode + ns/redirect filter +
    * markup strip) → EXACT DEDUP across dumps (md5 groupBy, min-id
    * survivor — map-side combine, one row per distinct text crosses
    * the wire, the q25 posture) → token-count quality gate (the
    * shared [[Core.tokens]] tokenizer). Bodies repeat every 50 docs
    * so real cross-dump duplicates exist; every 7th body is a stub
    * that fails the ≥5-token gate; torn dumps (13s) contribute
    * nothing, so survivor identity and duplicate counts must reflect
    * their absence — the oracle computes all of it by construction. */
  val x259 = DQ("x259_wikidump_corpus", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 50 AS INT) AS k
      |           FROM documents WHERE doc_id % 13 <> 0),
      |g AS (SELECT k, MIN(doc_id) AS media_id, COUNT(*) AS n_dups
      |      FROM d WHERE k % 7 <> 0 GROUP BY k)
      |SELECT media_id, CAST(n_dups AS BIGINT) AS n_dups,
      |  CAST(6 + k % 3 AS BIGINT) AS n_tokens,
      |  md5('shared body ' || CAST(k AS VARCHAR) || ' '
      |      || trim(repeat('alpha ', 4 + k % 3))) AS text_md5
      |FROM g ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.Bzip2
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val k = (id % 50).toInt
          val body =
            if (k % 7 == 0) s"tiny $k"
            else s"shared body $k " + ("alpha " * (4 + k % 3)).trim
          val xml = "<mediawiki><siteinfo/>" +
            s"<page><title>Doc $id</title><ns>0</ns><id>${id * 10 + 1}</id>" +
            s"<revision><id>1</id><text bytes=\"0\">$body</text>" +
            "</revision></page></mediawiki>"
          val enc = Bzip2.encode(xml.getBytes("UTF-8"))
          (id, if (id % 13 == 0) enc.dropRight(6) else enc)
        }.toDF("media_id", "media")
      graft.streaming.Pipelines.wikidumpArticles(
          media.select(col("media_id").cast("string").as("path"),
            col("media").as("content")))
        .select(col("path").cast("long").as("media_id"), col("plain"))
        .withColumn("n_tokens", size(Core.tokens(col("plain"))).cast("long"))
        .where(col("n_tokens") >= 5)
        .groupBy(md5(col("plain")).as("text_md5"))
        .agg(min(col("media_id")).as("media_id"),
          count(lit(1)).as("n_dups"),
          min(col("n_tokens")).as("n_tokens"))
        .select(col("media_id"), col("n_dups"), col("n_tokens"),
          col("text_md5"))
        .orderBy("media_id")
  }

  /** x260: WARC.ZST SPLIT — the zstd twin of the x250 bzip2 work, for
    * the other giant-file corpus format: `.warc.zst` distributions put
    * whole records in their own zstd frames precisely so readers can
    * cut at frame boundaries. zstd frames cannot be found by magic
    * scan (the magic may occur in payload), so `zstd_extents` walks
    * frame HEADERS sequentially via zstd's own frame-size probe — no
    * decompression, skippable frames (the dictionary convention)
    * stepped over — then each frame decodes and parses its records
    * independently. Every 13th doc's LAST frame is torn: its row
    * quarantines while every earlier frame keeps serving (damage
    * localizes at frame granularity, as with bzip2 streams). */
  val x260 = DQ("x260_warczst_split", Some(
    """WITH d AS (SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS nr,
      |           doc_id % 13 = 0 AS q FROM documents),
      |r AS (SELECT doc_id, nr, q, u.r AS r FROM d,
      |      unnest(generate_series(0, nr - 1)) AS u(r)),
      |e AS (SELECT doc_id, r + 1 AS frame, q AND r = nr - 1 AS dead,
      |  'http://site' || CAST(doc_id % 50 AS VARCHAR) || '.example/p'
      |    || CAST(r AS VARCHAR) AS uri,
      |  '<html><body>doc ' || CAST(doc_id AS VARCHAR) || ' page '
      |    || CAST(r AS VARCHAR) || '</body></html>' AS pl FROM r)
      |SELECT doc_id AS media_id, CAST(frame AS INT) AS frame,
      |  NOT dead AS ok,
      |  CASE WHEN dead THEN NULL ELSE uri END AS uri,
      |  CASE WHEN dead THEN NULL ELSE md5(pl) END AS payload_md5
      |FROM e ORDER BY media_id, frame""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{Warc, WarcRecords, Zstandard, ZstdBytes, ZstdExtents}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val nr = (id % 4 + 1).toInt
          val dt = f"2024-${id % 12 + 1}%02d-01T00:00:00Z"
          val frames = (0 until nr).map { r =>
            val uri = s"http://site${id % 50}.example/p$r"
            Zstandard.encode(Warc.build(Seq(("response", uri, dt,
              s"<html><body>doc $id page $r</body></html>".getBytes))))
          }
          val cat = frames.reduce(_ ++ _)
          (id, if (id % 13 == 0) cat.dropRight(7) else cat)
        }.toDF("media_id", "media")
      media
        .withColumn("exts", ZstdExtents.zstdExtents(col("media")))
        .select(col("media_id"), col("media"),
          posexplode(col("exts")).as(Seq("f0", "ext")))
        .withColumn("w", ZstdBytes.zstdBytes(
          expr("substring(media, cast(ext.off as int) + 1, " +
            "cast(ext.len as int))")))
        .withColumn("recs", WarcRecords.warcRecords(col("w")))
        .withColumn("ok", col("w").isNotNull && size(col("recs")) === 1)
        .select(col("media_id"), (col("f0") + 1).cast("int").as("frame"),
          col("ok"),
          when(col("ok"), col("recs").getItem(0).getField("uri")).as("uri"),
          when(col("ok"),
            md5(col("recs").getItem(0).getField("payload")))
            .as("payload_md5"))
        .orderBy("media_id", "frame")
  }

  /** x261: MULTISTREAM CORPUS SINK, full circle — a curated corpus
    * written back out as the randomly-accessible artifact the
    * ecosystem serves: [[Pipelines.wikidumpSink]] turns each
    * partition into one multistream dump + published-format index
    * (pages grouped 16 to a stream here, executor-side Hadoop FS
    * writes, no driver funnel), and the gate closes the loop by
    * serving single pages back OUT of what the sink wrote through
    * [[Pipelines.wikidumpFetch]] — write → index-parse → range-read
    * one stream per hit → exact text. Survives any partitioning: the
    * index, not file layout, locates pages. The corpus text is
    * deliberately HOSTILE to the dump format — every page body
    * carries `&`, `<`, a literal `</text>` and `<page>`, and the
    * title carries `<`, `&`, `"` — so the gate proves the sink's
    * entity escaping and the fetch's decoding round-trip byte-exactly
    * (unescaped interpolation would truncate at the embedded
    * `</text>` and silently mis-serve). */
  val x261 = DQ("x261_wikidump_sink_roundtrip", Some(
    """WITH p AS (SELECT doc_id,
      |  'Doc <' || CAST(doc_id AS VARCHAR) || '> & "q"' AS title,
      |  'a & b <page></text> of ' || CAST(doc_id AS VARCHAR) || chr(10)
      |    || 'line two ' || CAST(doc_id % 7 AS VARCHAR) AS text
      |  FROM documents WHERE doc_id % 9 = 0)
      |SELECT doc_id AS page_id, title,
      |  md5(text) AS text_md5,
      |  CAST(length(text) AS BIGINT) AS n_chars
      |FROM p ORDER BY page_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("x261_sink")
        .toFile.getAbsolutePath
      val pages = table(spark, dir, "documents").select(col("doc_id"))
        .select(col("doc_id").as("page_id"),
          concat(lit("Doc <"), col("doc_id"), lit("> & \"q\"")).as("title"),
          concat(lit("a & b <page></text> of "), col("doc_id"),
            lit("\nline two "), col("doc_id") % 7).as("text"))
        .repartition(7)
      graft.streaming.Pipelines.wikidumpSink(pages, tmp, pagesPerStream = 16)
      val idx = graft.streaming.Pipelines.wikidumpIndexLines(
          spark.read.format("binaryFile")
            .option("pathGlobFilter", "*-index.txt.bz2")
            .load(tmp)
            .select(col("path"), col("content")))
        .withColumn("path",
          regexp_replace(col("path"), "-index\\.txt\\.bz2$", ".xml.bz2"))
        // materialized once: wikidumpFetch consumes idx twice (hit join +
        // extent walk) and its lineage is the whole index-file read+decode
        .localCheckpoint()
      val wanted = table(spark, dir, "documents")
        .where(col("doc_id") % 9 === 0)
        .select(col("doc_id").as("page_id"))
      graft.streaming.Pipelines.wikidumpFetch(idx, wanted)
        .select(col("page_id"), col("title"),
          md5(col("text")).as("text_md5"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("page_id")
  }

  /** x262: 7Z FILTER CHAINS — real-world 7z of code and binaries
    * (Stack-Exchange-style dumps) wears bind-pair filter chains, not
    * bare coders: delta in front of LZMA2 for numeric tables, BCJ x86
    * for executables. [[graft.functions.SevenZip]] walks the folder's
    * coder GRAPH from the packed stream along bind pairs (x257's
    * delta/Bra86 kernels do the inverse filtering), under raw and
    * LZMA2-encoded headers both, with BOTH x86 method ids (0x04 new,
    * 0x03030103 legacy) alternating by doc and the delta distance
    * varying by doc. The `arm.bin` member wears an ARM (0x07) chain
    * we deliberately do not decode: it must ROUTE as a dead letter on
    * every row while its siblings keep serving — exotic coders
    * quarantine, never die. The 艾/退 bytes (0xE8/0xE9 leads) force
    * the branch converter to genuinely rewrite displacements. Per-row
    * scan at 100 TB. */
  val x262 = DQ("x262_sevenz_filter_chains", Some(
    """WITH m AS (SELECT doc_id, u.m AS m FROM documents,
      |    unnest(generate_series(0, 2)) AS u(m)),
      |e AS (SELECT doc_id,
      |    CASE m WHEN 0 THEN 'arm.bin' WHEN 1 THEN 'num.bin'
      |           ELSE 'x86.bin' END AS member,
      |    m = 0 AS dead,
      |    CASE m WHEN 0 THEN 'arm ' WHEN 1 THEN 'delta 0123456789 '
      |           ELSE 'call 艾退 x86 ' END
      |      || CAST(doc_id AS VARCHAR) AS text
      |  FROM m)
      |SELECT doc_id AS media_id, member, NOT dead AS ok,
      |  CASE WHEN dead THEN NULL ELSE md5(text) END AS text_md5,
      |  CAST(CASE WHEN dead THEN NULL ELSE length(text) END AS BIGINT)
      |    AS n_chars
      |FROM e ORDER BY media_id, member""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{SevenZip, SevenZipEntries}
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val files = Seq(
            ("arm.bin", s"arm $id".getBytes("UTF-8")),
            ("num.bin", s"delta 0123456789 $id".getBytes("UTF-8")),
            ("x86.bin", s"call 艾退 x86 $id".getBytes("UTF-8")))
          val chains: Int => Option[(Long, Array[Byte])] = {
            case 0 => Some((0x07L, Array.empty[Byte])) // ARM: must route
            case 1 => Some((0x03L, Array[Byte]((id % 4).toByte)))
            case _ => Some((
              if (id % 2 == 0) 0x04L else 0x03030103L,
              Array.empty[Byte]))
          }
          (id, SevenZip.build(files, encodedHeader = id % 2 == 1,
            chainFor = chains))
        }.toDF("media_id", "media")
      media
        .withColumn("es", SevenZipEntries.sevenzEntries(col("media")))
        .select(col("media_id"), explode_outer(col("es")).as("e"))
        .select(col("media_id"), col("e.name").as("member"),
          coalesce(col("e.crc_ok"), lit(false)).as("ok"),
          md5(col("e.payload")).as("text_md5"),
          expr("length(cast(e.payload AS STRING))").cast("long")
            .as("n_chars"))
        .orderBy("media_id", "member")
  }

  /** x267's fixture directories, one per sf dir per JVM (see the gate's
    * setup note). */
  private val x267Fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** x267 fixture build — see the x256FixtureDir note: Bench runs this
    * untimed via [[fixtureSetups]]; first use elsewhere builds on demand. */
  private[graft] def x267FixtureDir(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    x267Fixtures.computeIfAbsent(dir, { _ =>
      import spark.implicits._
      import graft.functions.SevenZip
      val t = java.nio.file.Files.createTempDirectory("x267_sedump")
        .toFile.getAbsolutePath
      spread(table(spark, dir, "documents").select(col("doc_id"))).as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            val xml = sedumpPostsFixtureXml(id)
            val arc = SevenZip.build(
              Seq(("Posts.xml", xml.getBytes("UTF-8"))),
              encodedHeader = id % 2 == 1,
              chainFor = _ =>
                // exotic branch-converter chain (a non-x86 arch):
                // unstreamable in BOTH modes — the routing arm
                if (id % 17 == 0 && id % 13 != 0)
                  Some((0x05L, Array.empty[Byte]))
                else None,
              coderFor = _ =>
                if (id % 3 == 0) 0
                else if (id % 5 == 0) 2 // raw LZMA1: streams ranged too
                else 1) // Copy / LZMA2
            val arm = if (id % 13 == 0) arc.dropRight(5) else arc
            java.nio.file.Files.write(
              java.nio.file.Paths.get(t, s"$id.7z"), arm)
          }
        }
      t
    })

  /** The 3-post `Posts.xml` both SE-dump ingest gates build (x263
    * bounded, x267 ranged) — SAME text formulas so both oracles state
    * the expected corpus BY CONSTRUCTION. p=3 is the hostile arm: a
    * raw `>` and a raw newline inside Body (.NET's XmlWriter, which
    * writes the real archive.org dumps, escapes & < " in attribute
    * values but leaves `>` raw). */
  private def sedumpPostsFixtureXml(id: Long): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    def escNet(s: String) = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace("\"", "&quot;")
    val rows = Seq(1, 2, 3).map { p =>
      val html =
        if (p == 1) s"<p>Question body $id &amp; more.</p>"
        else if (p == 2)
          s"<p>Answer for $id</p><pre><code>x &lt; 1</code></pre>"
        else s"<p>Note $id: a > b\nc</p>"
      // ParentId sits between Id and PostTypeId: a sloppy
      // `Id="…"` regex would bind to it
      val parent = if (p == 2) s"""ParentId="${id * 10 + 1}" """ else ""
      s"""<row Id="${id * 10 + p}" ${parent}PostTypeId="$p" """ +
        s"""Body="${if (p == 3) escNet(html) else esc(html)}" />"""
    }.mkString
    s"""<?xml version="1.0" encoding="utf-8"?><posts>$rows</posts>"""
  }

  /** x263: STACK-EXCHANGE DUMP → POSTS CORPUS — the public
    * archive.org data-dump layout (one `.7z` per site holding
    * attribute-style XML tables) composed end-to-end on the x262
    * machinery: the 7z folder walk (filter chains rotating none /
    * delta / BCJ-x86 by doc, raw and encoded headers by parity) opens
    * `Posts.xml`, each self-closing `<row Id=".." PostTypeId=".."
    * Body="..entity-escaped HTML.." />` explodes to a post, the Body
    * attribute XML-decodes, and the embedded HTML strips through the
    * SAME chain crawl pages take ([[Pipelines.htmlTextCol]]) — the
    * oracle states the expected text BY CONSTRUCTION (it never runs a
    * regex), so attribute parse + entity decode + tag strip must land
    * string-exact. Quarantine arms: every 13th doc tears the
    * container, every 17th flips the first pack byte — both must
    * surface as one routed null-id row. The `Id=`/`PostTypeId=`
    * extraction must not snag on the `ParentId=` attribute planted
    * between them, and the p=3 row carries a RAW `>` and a raw
    * newline inside Body (legal XML — .NET's XmlWriter leaves `>`
    * unescaped in attribute values): the quote-aware row matcher must
    * keep the row. Map-only per-row scan at 100 TB. */
  val x263 = DQ("x263_sedump_posts", Some(
    """WITH d AS (SELECT doc_id, doc_id % 13 = 0 AS tq,
      |    doc_id % 17 = 0 AND doc_id % 13 <> 0 AS fq FROM documents),
      |p AS (SELECT doc_id, u.p AS p FROM d,
      |    unnest(generate_series(1, 3)) AS u(p) WHERE NOT tq AND NOT fq),
      |e AS (SELECT doc_id, CAST(doc_id * 10 + p AS BIGINT) AS post_id,
      |    CAST(p AS INTEGER) AS post_type,
      |    CASE WHEN p = 1
      |      THEN 'Question body ' || CAST(doc_id AS VARCHAR) || ' & more.'
      |      WHEN p = 2
      |      THEN 'Answer for ' || CAST(doc_id AS VARCHAR) || ' x < 1'
      |      ELSE 'Note ' || CAST(doc_id AS VARCHAR) || ': a > b c'
      |    END AS text
      |  FROM p)
      |SELECT media_id, post_id, post_type, text, n_chars, ok FROM (
      |  SELECT doc_id AS media_id, post_id, post_type, text,
      |    CAST(length(text) AS BIGINT) AS n_chars, true AS ok FROM e
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL, NULL, NULL, false FROM d WHERE tq OR fq)
      |ORDER BY media_id, post_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.SevenZip
      val media = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          val xml = sedumpPostsFixtureXml(id)
          val chains: Int => Option[(Long, Array[Byte])] = _ => (id % 3) match {
            case 0 => None
            case 1 => Some((0x03L, Array[Byte](0)))
            case _ => Some((
              if (id % 2 == 0) 0x04L else 0x03030103L, Array.empty[Byte]))
          }
          val arc = SevenZip.build(
            Seq(("Posts.xml", xml.getBytes("UTF-8"))),
            encodedHeader = id % 2 == 1, chainFor = chains)
          val arm =
            if (id % 13 == 0) arc.dropRight(5)
            else if (id % 17 == 0) {
              val b = arc.clone()
              b(40) = (b(40) ^ 0x55).toByte // inside the pack stream
              b
            } else arc
          (id, arm)
        }.toDF("media_id", "media")
      graft.streaming.Pipelines.sedumpPosts(
          media.select(col("media_id").cast("string").as("path"),
            col("media").as("content")))
        .select(col("path").cast("long").as("media_id"), col("post_id"),
          col("post_type"), col("text"),
          when(col("ok"), length(col("text"))).cast("long").as("n_chars"),
          col("ok"))
        .orderBy("media_id", "post_id")
  }

  /** x264: WARC.ZST CORPUS SINK, full circle — the zstd twin of the
    * x261 multistream sink: a curated corpus written back out as the
    * modern crawl artifact ([[Pipelines.warcZstSink]]: one
    * `part-<pid>.warc.zst` per partition, a LEADING SKIPPABLE frame in
    * the dictionary slot, one zstd frame PER RECORD so the file splits
    * at frame boundaries), then read back through the x260 machinery —
    * `zstd_extents` must step over the skippable lead and cut one
    * frame per record, each frame parses as exactly one WARC response,
    * and uri + payload round-trip byte-exactly. Executor-side streamed
    * writes, one record's frame in heap at a time. */
  val x264 = DQ("x264_warczst_sink_roundtrip", Some(
    """SELECT doc_id AS media_id,
      |  'http://d' || CAST(doc_id AS VARCHAR) || '.example/x' AS uri,
      |  md5('warc body ' || CAST(doc_id AS VARCHAR) || chr(10)
      |      || 'tail ' || CAST(doc_id % 5 AS VARCHAR)) AS payload_md5,
      |  CAST(length('warc body ' || CAST(doc_id AS VARCHAR) || chr(10)
      |      || 'tail ' || CAST(doc_id % 5 AS VARCHAR)) AS BIGINT) AS n_bytes
      |FROM documents ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.{WarcRecords, ZstdBytes, ZstdExtents}
      val tmp = java.nio.file.Files.createTempDirectory("x264_sink")
        .toFile.getAbsolutePath
      val recs = table(spark, dir, "documents").select(col("doc_id"))
        .select(
          concat(lit("http://d"), col("doc_id"), lit(".example/x")).as("uri"),
          lit("2024-01-01T00:00:00Z").as("date"),
          concat(lit("warc body "), col("doc_id"), lit("\ntail "),
            col("doc_id") % 5).cast("binary").as("payload"))
        .repartition(5)
      graft.streaming.Pipelines.warcZstSink(recs, tmp)
      spark.read.format("binaryFile").load(tmp)
        .select(col("content"))
        .withColumn("exts", ZstdExtents.zstdExtents(col("content")))
        .select(col("content"), explode(col("exts")).as("ext"))
        .withColumn("w", ZstdBytes.zstdBytes(
          expr("substring(content, cast(ext.off as int) + 1, " +
            "cast(ext.len as int))")))
        .select(explode(WarcRecords.warcRecords(col("w"))).as("r"))
        .select(
          regexp_extract(col("r.uri"), "http://d(\\d+)\\.example", 1)
            .cast("long").as("media_id"),
          col("r.uri").as("uri"),
          md5(col("r.payload")).as("payload_md5"),
          length(col("r.payload")).cast("long").as("n_bytes"))
        .orderBy("media_id")
  }

  /** x265: WARC.ZST DICTIONARY circle — the full IIPC convention the
    * x264 sink only framed: a zstd dictionary TRAINED on record
    * payloads (zstd's COVER trainer, a model-sized driver artifact —
    * the IVF-centroid precedent), shipped in the leading skippable
    * frame under the pinned 0x184D2A5D magic, with every record frame
    * compressed REFERENCING it — how real `.warc.zst` makes tiny
    * per-record frames compress like one big stream while staying
    * frame-splittable. [[Pipelines.warcZstRecords]] reads it back:
    * `zstd_dict` lifts the dictionary, `zstd_bytes_dict` decodes each
    * extent against it, and uri + payload round-trip byte-exactly
    * (oracle by construction). WarcZstDictSpec pins the honesty arms:
    * without the dictionary the frames null-route, so the dictionary
    * is load-bearing, not decorative. */
  val x265 = DQ("x265_warczst_dict_roundtrip", Some(
    """WITH p AS (SELECT doc_id,
      |  'HTTP/1.1 200 OK | Content-Type: text/html; charset=utf-8 | '
      |  || 'Server: graft-origin/2.4 (corpus mirror tier) | '
      |  || 'Cache-Control: max-age=86400, public | '
      |  || 'X-Crawl-Tier: curated-common-corpus | '
      |  || '<!doctype html><html lang=en><head><meta charset=utf-8>'
      |  || '<title>corpus page</title></head><body><main id=content>'
      |  || 'doc ' || CAST(doc_id AS VARCHAR) || ' tail '
      |  || CAST(doc_id % 7 AS VARCHAR) || '</main></body></html>' AS payload
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  'http://d' || CAST(doc_id AS VARCHAR) || '.example/p' AS uri,
      |  md5(payload) AS payload_md5,
      |  CAST(length(payload) AS BIGINT) AS n_bytes
      |FROM p ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("x265_dict")
        .toFile.getAbsolutePath
      val boiler = "HTTP/1.1 200 OK | Content-Type: text/html; " +
        "charset=utf-8 | Server: graft-origin/2.4 (corpus mirror tier) | " +
        "Cache-Control: max-age=86400, public | " +
        "X-Crawl-Tier: curated-common-corpus | " +
        "<!doctype html><html lang=en><head><meta charset=utf-8>" +
        "<title>corpus page</title></head><body><main id=content>"
      val recs = table(spark, dir, "documents").select(col("doc_id"))
        .select(
          concat(lit("http://d"), col("doc_id"), lit(".example/p")).as("uri"),
          lit("2024-01-01T00:00:00Z").as("date"),
          concat(lit(boiler), lit("doc "), col("doc_id"), lit(" tail "),
            col("doc_id") % 7, lit("</main></body></html>"))
            .cast("binary").as("payload"))
        .repartition(4)
      val dict = graft.streaming.Pipelines.trainWarcDict(
        recs, maxSamples = 1024, dictBytes = 4 << 10)
      graft.streaming.Pipelines.warcZstSink(recs, tmp, dict = Some(dict))
      graft.streaming.Pipelines.warcZstRecords(
          spark.read.format("binaryFile").load(tmp)
            .select(col("path"), col("content")))
        .where(col("ok"))
        .select(
          regexp_extract(col("uri"), "http://d(\\d+)\\.example", 1)
            .cast("long").as("media_id"),
          col("uri"),
          md5(col("payload")).as("payload_md5"),
          length(col("payload")).cast("long").as("n_bytes"))
        .orderBy("media_id")
  }

  /** x266: SE-DUMP RELATIONAL COMPOSITION — a real Stack-Exchange site
    * dump is SEVERAL attribute tables (Users.xml, Posts.xml,
    * Comments.xml …) that only become a corpus after joins:
    * [[Pipelines.sedumpTable]] reads each table generically (named
    * attributes out of `<row …/>`, entity-decoded, absent ≠ empty),
    * then posts LEFT-join their owners on (archive, OwnerUserId) —
    * real dumps carry ownerless posts (deleted users), which keep
    * their text with a null owner — and aggregate their comments on
    * (archive, PostId) — foreign keys are only unique WITHIN a site
    * dump, so every join keys on the archive too (the classic
    * per-tenant composite-key shape; at 100 TB the comment aggregation
    * is map-side-combined before its one exchange). Entity-bearing
    * display names prove the attribute decode rides the joins intact;
    * a zero-comment post must survive the left join with count 0, not
    * vanish; and the ownerless post's Body carries a raw `>` plus a
    * raw newline — the quote-aware row matcher must not tear. */
  val x266 = DQ("x266_sedump_relational", Some(
    """WITH p AS (SELECT doc_id, u.p AS p FROM documents,
      |    unnest(generate_series(1, 3)) AS u(p)),
      |e AS (SELECT doc_id, CAST(doc_id * 10 + p AS BIGINT) AS post_id,
      |  CASE WHEN p = 1 THEN 'User A' || CAST(doc_id AS VARCHAR)
      |       WHEN p = 2 THEN 'B & C <' || CAST(doc_id AS VARCHAR) || '>'
      |       END AS owner_name,
      |  CAST(CASE WHEN p = 1 THEN doc_id % 1000
      |       WHEN p = 2 THEN doc_id % 577 END AS BIGINT) AS owner_rep,
      |  CAST(CASE WHEN p = 1 THEN doc_id % 3 WHEN p = 2 THEN 1
      |       ELSE 0 END AS BIGINT) AS n_comments,
      |  CAST(CASE WHEN p = 1 THEN (doc_id % 3) * ((doc_id % 3) + 1) / 2
      |       WHEN p = 2 THEN doc_id % 7 ELSE 0 END AS BIGINT) AS sum_score
      |  FROM p)
      |SELECT doc_id AS media_id, post_id, owner_name, owner_rep,
      |  n_comments, sum_score
      |FROM e ORDER BY media_id, post_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.SevenZip
      val arcs = spread(table(spark, dir, "documents").select(col("doc_id")))
        .as[Long]
        .map { id =>
          (id, SevenZip.build(sedumpTablesFixture(id),
            encodedHeader = id % 2 == 0))
        }.toDF("media_id", "media")
      val arcDf = arcs.select(col("media_id").cast("string").as("path"),
        col("media").as("content"))
      def tbl(member: String, attrs: Seq[String]) =
        graft.streaming.Pipelines.sedumpTable(arcDf, member, attrs)
          .where(col("ok"))
      val users = tbl("Users.xml", Seq("Id", "DisplayName", "Reputation"))
        .select(col("path"), col("Id").cast("long").as("uid"),
          col("DisplayName").as("owner_name"),
          col("Reputation").cast("long").as("owner_rep"))
      val posts = tbl("Posts.xml", Seq("Id", "OwnerUserId"))
        .select(col("path"), col("Id").cast("long").as("post_id"),
          col("OwnerUserId").cast("long").as("uid"))
      val comments = tbl("Comments.xml", Seq("PostId", "Score"))
        .groupBy(col("path"), col("PostId").cast("long").as("post_id"))
        .agg(count(lit(1)).as("n_comments"),
          sum(col("Score").cast("long")).as("sum_score"))
      posts
        // LEFT: real dumps carry ownerless posts (deleted users) — the
        // corpus keeps the text with a null owner, it does not shrink
        .join(users, Seq("path", "uid"), "left")
        .join(comments, Seq("path", "post_id"), "left")
        .select(col("path").cast("long").as("media_id"), col("post_id"),
          col("owner_name"), col("owner_rep"),
          coalesce(col("n_comments"), lit(0L)).as("n_comments"),
          coalesce(col("sum_score"), lit(0L)).as("sum_score"))
        .orderBy("media_id", "post_id")
  }

  /** The 3-table site dump both relational SE-dump gates build (x266
    * bounded, x269 ranged): Users/Posts/Comments with entity-bearing
    * display names, an ownerless post whose Body carries a raw `>`
    * and a raw newline (the quote-aware matcher's hostile arm), and a
    * `ParentId` planted between `Id` and `PostTypeId`. Same rows →
    * same oracle for both ingest modes. */
  private def sedumpTablesFixture(id: Long): Seq[(String, Array[Byte])] = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val users =
      s"""<?xml version="1.0"?><users>""" +
        s"""<row Id="${id * 100 + 1}" DisplayName="User A$id" """ +
        s"""Reputation="${id % 1000}" />""" +
        s"""<row Id="${id * 100 + 2}" DisplayName="${esc(s"B & C <$id>")}" """ +
        s"""Reputation="${id % 577}" /></users>"""
    val posts =
      s"""<?xml version="1.0"?><posts>""" +
        s"""<row Id="${id * 10 + 1}" PostTypeId="1" """ +
        s"""OwnerUserId="${id * 100 + 1}" Body="q" />""" +
        s"""<row Id="${id * 10 + 2}" ParentId="${id * 10 + 1}" """ +
        s"""PostTypeId="2" OwnerUserId="${id * 100 + 2}" Body="a" />""" +
        // the hostile arm: OWNERLESS (deleted user — real dumps
        // carry these; must survive the owner join as null, not
        // vanish), with a RAW `>` and a raw newline in Body —
        // legal in XML attribute values (.NET's XmlWriter leaves
        // `>` unescaped there); the quote-aware row matcher must
        // not tear on either
        s"""<row Id="${id * 10 + 3}" PostTypeId="1" """ +
        "Body=\"q > 0\nnext\" />" +
        "</posts>"
    val k = (id % 3).toInt
    val comments =
      s"""<?xml version="1.0"?><comments>""" +
        (1 to k).map(c =>
          s"""<row Id="${id * 1000 + c}" PostId="${id * 10 + 1}" """ +
            s"""Score="$c" />""").mkString +
        s"""<row Id="${id * 1000 + 9}" PostId="${id * 10 + 2}" """ +
        s"""Score="${id % 7}" /></comments>"""
    Seq(
      ("Users.xml", users.getBytes("UTF-8")),
      ("Posts.xml", posts.getBytes("UTF-8")),
      ("Comments.xml", comments.getBytes("UTF-8")))
  }

  /** x267: RANGED SE-DUMP INGEST — the streaming answer to the one
    * artifact the bounded path cannot serve (a stackoverflow.com
    * `Posts.xml` is tens of GB inside its `.7z`): dumps live ON DISK
    * as files, input is a LISTING, the member layout comes from a
    * header-only pread, and rows stream through an O(dict-window)
    * LZMA2 ring decode ([[Pipelines.sedumpPostsRanged]] /
    * `sources/Ranged7z.scala`; the >2 GiB soak is
    * Sedump7zRangedSoakSpec). SAME post construction as x263 — the
    * oracle states the corpus by construction and both ingest modes
    * must land string-exact — with the ranged routing arms: every
    * 13th doc's container is torn (header unreachable → one
    * null-member row) and every 17th wears an exotic branch-converter
    * chain (a non-x86 arch) that neither mode streams (one routed
    * member row). Coders rotate Copy/LZMA2/raw-LZMA1 and headers
    * raw/encoded by parity — LZMA1, pre-2015 7-Zip's default, streams
    * through the same ring as one sequential slice. At 100 TB this is
    * the plan that matters: per-file parallel header scans, per-slice
    * parallel decodes, no byte of payload through the driver. */
  val x267 = DQ("x267_sedump_ranged", Some(
    """WITH d AS (SELECT doc_id, doc_id % 13 = 0 AS tq,
      |    doc_id % 17 = 0 AND doc_id % 13 <> 0 AS fq FROM documents),
      |p AS (SELECT doc_id, u.p AS p FROM d,
      |    unnest(generate_series(1, 3)) AS u(p) WHERE NOT tq AND NOT fq),
      |e AS (SELECT doc_id, CAST(doc_id * 10 + p AS BIGINT) AS post_id,
      |    CAST(p AS INTEGER) AS post_type,
      |    CASE WHEN p = 1
      |      THEN 'Question body ' || CAST(doc_id AS VARCHAR) || ' & more.'
      |      WHEN p = 2
      |      THEN 'Answer for ' || CAST(doc_id AS VARCHAR) || ' x < 1'
      |      ELSE 'Note ' || CAST(doc_id AS VARCHAR) || ': a > b c'
      |    END AS text
      |  FROM p)
      |SELECT media_id, post_id, post_type, text, n_chars, ok FROM (
      |  SELECT doc_id AS media_id, post_id, post_type, text,
      |    CAST(length(text) AS BIGINT) AS n_chars, true AS ok FROM e
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL, NULL, NULL, false FROM d WHERE tq OR fq)
      |ORDER BY media_id, post_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.SevenZip
      // fixture build is SETUP, not the operator under test: built in
      // Bench's untimed setup phase (fixtureSetups); bench repetitions
      // measure the ranged read
      val tmp = Dataflow.x267FixtureDir(spark, dir)
      val paths = table(spark, dir, "documents").select(
        concat(lit(tmp + "/"), col("doc_id"), lit(".7z")).as("path"))
      graft.streaming.Pipelines.sedumpPostsRanged(paths)
        .select(
          expr("regexp_extract(path, '(\\\\d+)\\\\.7z$', 1)")
            .cast("long").as("media_id"),
          col("post_id"), col("post_type"), col("text"),
          when(col("ok"), length(col("text"))).cast("long").as("n_chars"),
          col("ok"))
        .orderBy("media_id", "post_id")
  }

  /** x268's fixture directories (the x267 setup-caching note applies). */
  private val x268Fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** x268 fixture build — dictionary training + .warc.zst sink (x264/
    * x265's operators, gated there). Bench runs this untimed via
    * [[fixtureSetups]]; first use elsewhere builds on demand. */
  private[graft] def x268FixtureDir(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    x268Fixtures.computeIfAbsent(dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("x268_ranged")
        .toFile.getAbsolutePath
      val boiler = "HTTP/1.1 200 OK | Content-Type: text/html; " +
        "charset=utf-8 | Server: graft-origin/2.4 (corpus mirror tier) | " +
        "Cache-Control: max-age=86400, public | " +
        "X-Crawl-Tier: curated-common-corpus | " +
        "<!doctype html><html lang=en><head><meta charset=utf-8>" +
        "<title>corpus page</title></head><body><main id=content>"
      val recs = table(spark, dir, "documents").select(col("doc_id"))
        .select(
          concat(lit("http://d"), col("doc_id"), lit(".example/p")).as("uri"),
          lit("2024-01-01T00:00:00Z").as("date"),
          concat(lit(boiler), lit("doc "), col("doc_id"), lit(" tail "),
            col("doc_id") % 7, lit("</main></body></html>"))
            .cast("binary").as("payload"))
        .repartition(4)
      val dict = graft.streaming.Pipelines.trainWarcDict(
        recs, maxSamples = 1024, dictBytes = 4 << 10)
      graft.streaming.Pipelines.warcZstSink(recs, t, dict = Some(dict))
      t
    })

  /** x268: RANGED WARC.ZST INGEST — the zstd member of the ranged
    * trio, lifting the column path's 2 GB bound for crawl monoliths:
    * the x265 dictionary sink writes real `.warc.zst` files (leading
    * skippable dictionary frame, dictionary-referencing record
    * frames), and [[Pipelines.warcZstRanged]] reads them back from a
    * LISTING — frame extents from a streaming block-header walk
    * (3 bytes read per block, payloads skipped, no decompression:
    * `sources/RangedZstd.scala`, deriving from the format what real
    * tooling keeps in external seek tables), the (path, frame)
    * repartition spreading decode before any payload byte is read,
    * each task range-reading exactly one frame and resolving the IIPC
    * dictionary once per file. Same record projection as the bounded
    * path verbatim; uri + payload round-trip byte-exactly (oracle by
    * construction). RangedZstdSpec pins extent parity with
    * `frameExtents`, row parity with `warcZstRecords`, and the
    * routing arms (not-zstd, torn tail, over-cap frame, RLE/raw
    * blocks). */
  val x268 = DQ("x268_warczst_ranged", Some(
    """WITH p AS (SELECT doc_id,
      |  'HTTP/1.1 200 OK | Content-Type: text/html; charset=utf-8 | '
      |  || 'Server: graft-origin/2.4 (corpus mirror tier) | '
      |  || 'Cache-Control: max-age=86400, public | '
      |  || 'X-Crawl-Tier: curated-common-corpus | '
      |  || '<!doctype html><html lang=en><head><meta charset=utf-8>'
      |  || '<title>corpus page</title></head><body><main id=content>'
      |  || 'doc ' || CAST(doc_id AS VARCHAR) || ' tail '
      |  || CAST(doc_id % 7 AS VARCHAR) || '</main></body></html>' AS payload
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  'http://d' || CAST(doc_id AS VARCHAR) || '.example/p' AS uri,
      |  md5(payload) AS payload_md5,
      |  CAST(length(payload) AS BIGINT) AS n_bytes
      |FROM p ORDER BY media_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      // fixture build is SETUP, not the operator under test: built in
      // Bench's untimed setup phase (fixtureSetups); bench repetitions
      // measure the RANGED READ
      val tmp = Dataflow.x268FixtureDir(spark, dir)
      val listing = spark.read.format("binaryFile").load(tmp)
        .select(regexp_replace(col("path"), "^file:", "").as("path"))
      graft.streaming.Pipelines.warcZstRanged(listing)
        .where(col("ok"))
        .select(
          regexp_extract(col("uri"), "http://d(\\d+)\\.example", 1)
            .cast("long").as("media_id"),
          col("uri"),
          md5(col("payload")).as("payload_md5"),
          length(col("payload")).cast("long").as("n_bytes"))
        .orderBy("media_id")
  }

  /** x269's fixture directories, one per sf dir per JVM (the x267
    * setup-caching note applies). */
  private val x269Fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** x269 fixture build — see the x256FixtureDir note. */
  private[graft] def x269FixtureDir(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    x269Fixtures.computeIfAbsent(dir, { _ =>
      import spark.implicits._
      import graft.functions.SevenZip
      val t = java.nio.file.Files.createTempDirectory("x269_sedump")
        .toFile.getAbsolutePath
      spread(table(spark, dir, "documents").select(col("doc_id"))).as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            val arc = SevenZip.build(sedumpTablesFixture(id),
              encodedHeader = id % 4 < 2,
              coderFor = _ => if (id % 2 == 0) 0 else 1)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(t, s"$id.7z"), arc)
          }
        }
      t
    })

  /** x269: RANGED SE-DUMP RELATIONAL — x266's composition (generic
    * attribute tables, LEFT owner join for ownerless posts, map-side
    * combined comment aggregation on the composite (archive, key))
    * with every table read through the RANGED path
    * ([[Pipelines.sedumpTableRanged]]): dumps live on disk, each of
    * the three tables is its own header-scan + slice plan + streamed
    * row scan, and the joins see EXACTLY the bounded path's rows — the
    * same oracle as x266 proves the two ingest modes compose
    * identically, not just project identically. Coders rotate
    * Copy/LZMA2 and headers raw/encoded by archive parity. */
  val x269 = DQ("x269_sedump_ranged_relational", Some(
    """WITH p AS (SELECT doc_id, u.p AS p FROM documents,
      |    unnest(generate_series(1, 3)) AS u(p)),
      |e AS (SELECT doc_id, CAST(doc_id * 10 + p AS BIGINT) AS post_id,
      |  CASE WHEN p = 1 THEN 'User A' || CAST(doc_id AS VARCHAR)
      |       WHEN p = 2 THEN 'B & C <' || CAST(doc_id AS VARCHAR) || '>'
      |       END AS owner_name,
      |  CAST(CASE WHEN p = 1 THEN doc_id % 1000
      |       WHEN p = 2 THEN doc_id % 577 END AS BIGINT) AS owner_rep,
      |  CAST(CASE WHEN p = 1 THEN doc_id % 3 WHEN p = 2 THEN 1
      |       ELSE 0 END AS BIGINT) AS n_comments,
      |  CAST(CASE WHEN p = 1 THEN (doc_id % 3) * ((doc_id % 3) + 1) / 2
      |       WHEN p = 2 THEN doc_id % 7 ELSE 0 END AS BIGINT) AS sum_score
      |  FROM p)
      |SELECT doc_id AS media_id, post_id, owner_name, owner_rep,
      |  n_comments, sum_score
      |FROM e ORDER BY media_id, post_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.SevenZip
      // fixture build: Bench untimed setup phase (fixtureSetups)
      val tmp = Dataflow.x269FixtureDir(spark, dir)
      val paths = table(spark, dir, "documents").select(
        concat(lit(tmp + "/"), col("doc_id"), lit(".7z")).as("path"))
      def tbl(member: String, attrs: Seq[String]) =
        graft.streaming.Pipelines.sedumpTableRanged(paths, member, attrs)
          .where(col("ok"))
      val users = tbl("Users.xml", Seq("Id", "DisplayName", "Reputation"))
        .select(col("path"), col("Id").cast("long").as("uid"),
          col("DisplayName").as("owner_name"),
          col("Reputation").cast("long").as("owner_rep"))
      val posts = tbl("Posts.xml", Seq("Id", "OwnerUserId"))
        .select(col("path"), col("Id").cast("long").as("post_id"),
          col("OwnerUserId").cast("long").as("uid"))
      val comments = tbl("Comments.xml", Seq("PostId", "Score"))
        .groupBy(col("path"), col("PostId").cast("long").as("post_id"))
        .agg(count(lit(1)).as("n_comments"),
          sum(col("Score").cast("long")).as("sum_score"))
      posts
        .join(users, Seq("path", "uid"), "left")
        .join(comments, Seq("path", "post_id"), "left")
        .select(
          expr("regexp_extract(path, '(\\\\d+)\\\\.7z$', 1)")
            .cast("long").as("media_id"),
          col("post_id"), col("owner_name"), col("owner_rep"),
          coalesce(col("n_comments"), lit(0L)).as("n_comments"),
          coalesce(col("sum_score"), lit(0L)).as("sum_score"))
        .orderBy("media_id", "post_id")
  }

  /** x270's fixture directories (the x267 setup-caching note applies). */
  private val x270Fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** x270 fixture build — see the x256FixtureDir note. */
  private[graft] def x270FixtureDir(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    x270Fixtures.computeIfAbsent(dir, { _ =>
      import spark.implicits._
      import graft.functions.SevenZip
      val t = java.nio.file.Files.createTempDirectory("x270_lzma1")
        .toFile.getAbsolutePath
      spread(table(spark, dir, "documents").select(col("doc_id"))).as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            val arc = SevenZip.build(sedumpTablesFixture(id),
              encodedHeader = id % 2 == 0,
              coderFor = _ => 2) // every member raw LZMA1
            java.nio.file.Files.write(
              java.nio.file.Paths.get(t, s"$id.7z"), arc)
          }
        }
      t
    })

  /** x270: RANGED SE-DUMP OVER RAW-LZMA1 ARCHIVES — the coder
    * pre-2015 7-Zip wrote by DEFAULT, so a large slice of real
    * archive.org-era dumps wears it: one range-coded stream per
    * member, no chunk framing and no reset points, which previously
    * had NO ingest path past the bounded reader's 256 MiB member cap.
    * [[graft.functions.Xz.Lzma1StreamReader]] streams it through the
    * same O(dict-window) ring as LZMA2 — one sequential slice per
    * member, per-FILE parallelism (the honest bound for a format that
    * is sequential by construction). Same 3-table relational
    * composition and SAME oracle as x266/x269: every table of every
    * archive reads through [[Pipelines.sedumpTableRanged]] with every
    * member raw-LZMA1, so the coder swap must be invisible to the
    * composed plan. Headers rotate raw/encoded by parity; XzSpec pins
    * the decoder against system `xz --format=lzma` output (real
    * matches, ring wraparound); Ranged7zSpec pins truncation/flip
    * routing. */
  val x270 = DQ("x270_sedump_lzma1_ranged", Some(
    """WITH p AS (SELECT doc_id, u.p AS p FROM documents,
      |    unnest(generate_series(1, 3)) AS u(p)),
      |e AS (SELECT doc_id, CAST(doc_id * 10 + p AS BIGINT) AS post_id,
      |  CASE WHEN p = 1 THEN 'User A' || CAST(doc_id AS VARCHAR)
      |       WHEN p = 2 THEN 'B & C <' || CAST(doc_id AS VARCHAR) || '>'
      |       END AS owner_name,
      |  CAST(CASE WHEN p = 1 THEN doc_id % 1000
      |       WHEN p = 2 THEN doc_id % 577 END AS BIGINT) AS owner_rep,
      |  CAST(CASE WHEN p = 1 THEN doc_id % 3 WHEN p = 2 THEN 1
      |       ELSE 0 END AS BIGINT) AS n_comments,
      |  CAST(CASE WHEN p = 1 THEN (doc_id % 3) * ((doc_id % 3) + 1) / 2
      |       WHEN p = 2 THEN doc_id % 7 ELSE 0 END AS BIGINT) AS sum_score
      |  FROM p)
      |SELECT doc_id AS media_id, post_id, owner_name, owner_rep,
      |  n_comments, sum_score
      |FROM e ORDER BY media_id, post_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.SevenZip
      // fixture build: Bench untimed setup phase (fixtureSetups)
      val tmp = Dataflow.x270FixtureDir(spark, dir)
      val paths = table(spark, dir, "documents").select(
        concat(lit(tmp + "/"), col("doc_id"), lit(".7z")).as("path"))
      def tbl(member: String, attrs: Seq[String]) =
        graft.streaming.Pipelines.sedumpTableRanged(paths, member, attrs)
          .where(col("ok"))
      val users = tbl("Users.xml", Seq("Id", "DisplayName", "Reputation"))
        .select(col("path"), col("Id").cast("long").as("uid"),
          col("DisplayName").as("owner_name"),
          col("Reputation").cast("long").as("owner_rep"))
      val posts = tbl("Posts.xml", Seq("Id", "OwnerUserId"))
        .select(col("path"), col("Id").cast("long").as("post_id"),
          col("OwnerUserId").cast("long").as("uid"))
      val comments = tbl("Comments.xml", Seq("PostId", "Score"))
        .groupBy(col("path"), col("PostId").cast("long").as("post_id"))
        .agg(count(lit(1)).as("n_comments"),
          sum(col("Score").cast("long")).as("sum_score"))
      posts
        .join(users, Seq("path", "uid"), "left")
        .join(comments, Seq("path", "post_id"), "left")
        .select(
          expr("regexp_extract(path, '(\\\\d+)\\\\.7z$', 1)")
            .cast("long").as("media_id"),
          col("post_id"), col("owner_name"), col("owner_rep"),
          coalesce(col("n_comments"), lit(0L)).as("n_comments"),
          coalesce(col("sum_score"), lit(0L)).as("sum_score"))
        .orderBy("media_id", "post_id")
  }

  /** x271's fixture directories (the x267 setup-caching note applies). */
  private val x271Fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** x271 fixture build — see the x256FixtureDir note. */
  private[graft] def x271FixtureDir(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    x271Fixtures.computeIfAbsent(dir, { _ =>
      import spark.implicits._
      import graft.functions.SevenZip
      val t = java.nio.file.Files.createTempDirectory("x271_chained")
        .toFile.getAbsolutePath
      spread(table(spark, dir, "documents").select(col("doc_id"))).as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            val xml = sedumpPostsFixtureXml(id)
            val chains: Int => Option[(Long, Array[Byte])] = _ =>
              if (id % 17 == 0 && id % 13 != 0)
                Some((0x05L, Array.empty[Byte])) // exotic: routes
              else (id % 3) match {
                case 0 => None
                case 1 => Some((0x03L, Array[Byte]((id % 4).toByte)))
                case _ => Some((
                  if (id % 2 == 0) 0x04L else 0x03030103L,
                  Array.empty[Byte]))
              }
            val arc = SevenZip.build(
              Seq(("Posts.xml", xml.getBytes("UTF-8"))),
              encodedHeader = id % 2 == 1,
              chainFor = chains,
              coderFor = _ => if (id % 5 == 0) 2 else 1)
            val arm = if (id % 13 == 0) arc.dropRight(5) else arc
            java.nio.file.Files.write(
              java.nio.file.Paths.get(t, s"$id.7z"), arm)
          }
        }
      t
    })

  /** x271: RANGED SE-DUMP OVER FILTER-CHAINED ARCHIVES — delta and
    * BCJ-x86 folders (`-mf=…`, the real-world chained layout x262/x263
    * decode bounded) now STREAM through the ranged reader: the decoder
    * output pushes through [[graft.sources.Ranged7z.StreamFilters]]
    * chunk-by-chunk, so a chained multi-GB member ingests in
    * O(dict-window) heap. Chains rotate none / delta (distance 1-4) /
    * BCJ-x86 (new + legacy ids) per doc, and the unchained docs
    * rotate the LZMA2/LZMA1 payload coders;
    * because filter state spans the folder output, a chained member is
    * always ONE slice decoded from folder start (Ranged7zSpec pins
    * that, plus streaming-vs-whole-buffer kernel equivalence under
    * random chunkings in X86StreamSpec). Same corpus and oracle shape
    * as x263; routing arms: every 13th doc's container is torn, every
    * 17th wears an exotic branch-converter chain neither mode
    * streams. */
  val x271 = DQ("x271_sedump_chained_ranged", Some(
    """WITH d AS (SELECT doc_id, doc_id % 13 = 0 AS tq,
      |    doc_id % 17 = 0 AND doc_id % 13 <> 0 AS fq FROM documents),
      |p AS (SELECT doc_id, u.p AS p FROM d,
      |    unnest(generate_series(1, 3)) AS u(p) WHERE NOT tq AND NOT fq),
      |e AS (SELECT doc_id, CAST(doc_id * 10 + p AS BIGINT) AS post_id,
      |    CAST(p AS INTEGER) AS post_type,
      |    CASE WHEN p = 1
      |      THEN 'Question body ' || CAST(doc_id AS VARCHAR) || ' & more.'
      |      WHEN p = 2
      |      THEN 'Answer for ' || CAST(doc_id AS VARCHAR) || ' x < 1'
      |      ELSE 'Note ' || CAST(doc_id AS VARCHAR) || ': a > b c'
      |    END AS text
      |  FROM p)
      |SELECT media_id, post_id, post_type, text, n_chars, ok FROM (
      |  SELECT doc_id AS media_id, post_id, post_type, text,
      |    CAST(length(text) AS BIGINT) AS n_chars, true AS ok FROM e
      |  UNION ALL
      |  SELECT doc_id, NULL, NULL, NULL, NULL, false FROM d WHERE tq OR fq)
      |ORDER BY media_id, post_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.SevenZip
      // fixture build: Bench untimed setup phase (fixtureSetups)
      val tmp = Dataflow.x271FixtureDir(spark, dir)
      val paths = table(spark, dir, "documents").select(
        concat(lit(tmp + "/"), col("doc_id"), lit(".7z")).as("path"))
      graft.streaming.Pipelines.sedumpPostsRanged(paths)
        .select(
          expr("regexp_extract(path, '(\\\\d+)\\\\.7z$', 1)")
            .cast("long").as("media_id"),
          col("post_id"), col("post_type"), col("text"),
          when(col("ok"), length(col("text"))).cast("long").as("n_chars"),
          col("ok"))
        .orderBy("media_id", "post_id")
  }

  /** x272's fixture directories (the x267 setup-caching note applies). */
  private val x272Fixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** x272 fixture build — see the x256FixtureDir note. */
  private[graft] def x272FixtureDir(
      spark: org.apache.spark.sql.SparkSession, dir: String): String =
    x272Fixtures.computeIfAbsent(dir, { _ =>
      import spark.implicits._
      import graft.functions.SevenZip
      val t = java.nio.file.Files.createTempDirectory("x272_capstone")
        .toFile.getAbsolutePath
      spread(table(spark, dir, "documents").select(col("doc_id"))).as[Long]
        .foreachPartition { (it: Iterator[Long]) =>
          def esc(s: String) = s.replace("&", "&amp;")
            .replace("<", "&lt;").replace("\"", "&quot;")
          it.foreach { id =>
            val note =
              if (id % 7 == 0) "<p>no</p>"
              else s"<p>Note $id: a > b\nc</p>"
            val xml =
              s"""<?xml version="1.0"?><posts>""" +
                s"""<row Id="${id * 10 + 1}" PostTypeId="1" Body="${esc(
                  s"<p>Question body ${id % 37} &amp; more.</p>")}" />""" +
                s"""<row Id="${id * 10 + 2}" PostTypeId="2" Body="${esc(
                  s"<p>Answer for ${id % 53}</p>" +
                    "<pre><code>x &lt; 1</code></pre>")}" />""" +
                s"""<row Id="${id * 10 + 3}" PostTypeId="3" """ +
                s"""Body="${esc(note)}" /></posts>"""
            val chains: Int => Option[(Long, Array[Byte])] = _ =>
              if (id % 17 == 0 && id % 13 != 0)
                Some((0x05L, Array.empty[Byte])) // exotic: routes
              else (id % 3) match {
                case 1 => Some((0x03L, Array[Byte]((id % 4).toByte)))
                case 2 => Some((
                  if (id % 2 == 0) 0x04L else 0x03030103L,
                  Array.empty[Byte]))
                case _ => None
              }
            val arc = SevenZip.build(
              Seq(("Posts.xml", xml.getBytes("UTF-8"))),
              encodedHeader = id % 2 == 1,
              chainFor = chains,
              coderFor = _ => ((id % 5) % 3).toInt)
            val arm = if (id % 13 == 0) arc.dropRight(5) else arc
            java.nio.file.Files.write(
              java.nio.file.Paths.get(t, s"$id.7z"), arm)
          }
        }
      t
    })

  /** x272: SE-DUMP CAPSTONE — the ranged front door FEEDS the curation
    * pipeline end-to-end in ONE declarative plan: `.7z` site dumps on
    * disk (coders rotating Copy/LZMA2/LZMA1, filter chains rotating
    * delta/BCJ-x86, headers raw/encoded — the full ranged surface)
    * stream posts through [[Pipelines.sedumpPostsRanged]], the Body
    * HTML strips via the shared [[Pipelines.htmlTextCol]] chain, a
    * quality gate drops sub-length posts, and EXACT DEDUP collapses
    * the cross-site duplicate texts real dumps carry (question/answer
    * bodies repeat across sites here by construction: doc_id % 37 and
    * % 53 classes), keeping the first (media, post) of each class with
    * its duplicate count. Plan shape at 100 TB: the ranged reader's
    * two metadata-sized exchanges (listing, slices), then exactly ONE
    * data shuffle — the dedup groupBy on text — with map-side partial
    * aggregation; no post crosses the wire twice. Routing arms (torn
    * container %13, exotic chain %17) drop at the ok-gate without
    * disturbing the corpus. */
  val x272 = DQ("x272_sedump_ranged_corpus", Some(
    """WITH d AS (SELECT doc_id FROM documents
      |    WHERE doc_id % 13 <> 0 AND doc_id % 17 <> 0),
      |e AS (
      |  SELECT doc_id, CAST(doc_id * 10 + 1 AS BIGINT) AS post_id,
      |    'Question body ' || CAST(doc_id % 37 AS VARCHAR) || ' & more.'
      |      AS text FROM d
      |  UNION ALL
      |  SELECT doc_id, CAST(doc_id * 10 + 2 AS BIGINT),
      |    'Answer for ' || CAST(doc_id % 53 AS VARCHAR) || ' x < 1' FROM d
      |  UNION ALL
      |  SELECT doc_id, CAST(doc_id * 10 + 3 AS BIGINT),
      |    CASE WHEN doc_id % 7 = 0 THEN 'no'
      |         ELSE 'Note ' || CAST(doc_id AS VARCHAR) || ': a > b c' END
      |    FROM d),
      |q AS (SELECT * FROM e WHERE length(text) >= 12),
      |w AS (SELECT doc_id AS media_id, post_id, text,
      |    count(*) OVER (PARTITION BY text) AS n_dups,
      |    row_number() OVER (PARTITION BY text ORDER BY doc_id, post_id)
      |      AS rn
      |  FROM q)
      |SELECT media_id, post_id, text, CAST(n_dups AS BIGINT) AS n_dups
      |FROM w WHERE rn = 1 ORDER BY media_id, post_id""".stripMargin)) {
    (spark, dir) =>
      import spark.implicits._
      import graft.functions.SevenZip
      // fixture build: Bench untimed setup phase (fixtureSetups)
      val tmp = Dataflow.x272FixtureDir(spark, dir)
      val paths = table(spark, dir, "documents").select(
        concat(lit(tmp + "/"), col("doc_id"), lit(".7z")).as("path"))
      graft.streaming.Pipelines.sedumpPostsRanged(paths)
        .where(col("ok") && length(col("text")) >= 12) // quality gate
        .select(
          expr("regexp_extract(path, '(\\\\d+)\\\\.7z$', 1)")
            .cast("long").as("media_id"),
          col("post_id"), col("text"))
        .groupBy(col("text"))
        .agg(
          min(struct(col("media_id").as("m"), col("post_id").as("p")))
            .as("keeper"),
          count(lit(1)).as("n_dups"))
        .select(col("keeper.m").as("media_id"),
          col("keeper.p").as("post_id"), col("text"), col("n_dups"))
        .orderBy("media_id", "post_id")
  }

  /** Every per-(JVM, sf dir) cached fixture build, keyed by the query that
    * needs it. [[graft.Bench]] runs these in its explicit UNTIMED setup
    * phase (before the timing loop), so the timed region is honest by
    * construction: no run of a measured query — first or later — pays for
    * (or skips) fixture construction. Standalone callers (Verify, specs)
    * that never ran setup still build on first use via the same
    * computeIfAbsent, so results are unchanged everywhere. */
  val fixtureSetups: Seq[(String, (org.apache.spark.sql.SparkSession, String) => Unit)] =
    Seq(
      "x256_wikidump_fetch" -> ((s, d) => { x256FixtureDir(s, d); () }),
      "x267_sedump_ranged" -> ((s, d) => { x267FixtureDir(s, d); () }),
      "x268_warczst_ranged" -> ((s, d) => { x268FixtureDir(s, d); () }),
      "x269_sedump_ranged_relational" -> ((s, d) => { x269FixtureDir(s, d); () }),
      "x270_sedump_lzma1_ranged" -> ((s, d) => { x270FixtureDir(s, d); () }),
      "x271_sedump_chained_ranged" -> ((s, d) => { x271FixtureDir(s, d); () }),
      "x272_sedump_ranged_corpus" -> ((s, d) => { x272FixtureDir(s, d); () }))

  val all: Seq[DQ] = Seq(x01, x11, x102, x103, x104, x107, x108, x123, x125,
    x126, x127, x132, x133, x134, x135, x136, x137, x138, x139, x140, x141,
    x142, x143, x144, x145, x146, x147, x148, x149, x151, x152, x153, x153s,
    x154, x155, x156, x157, x158, x159, x160, x161, x162, x163, x164, x167,
    x168, x169, x170, x171, x176, x178, x179, x180, x181, x182, x189, x191,
    x201, x202, x203, x204, x205, x209, x211, x212, x213, x214, x222, x223,
    x225, x228, x229, x230, x231, x232, x233, x234, x236, x237, x238, x240,
    x241, x242, x243, x244, x245, x246, x247, x248, x249, x250, x251, x252,
    x253, x254, x255, x256, x257, x258, x259, x260, x261, x262, x263, x264,
    x265, x266, x267, x268, x269, x270, x271, x272)
}
