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
      |  CAST(NULL AS INT) AS height
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

  val all: Seq[DQ] = Seq(x01, x11, x102, x103, x104)
}
