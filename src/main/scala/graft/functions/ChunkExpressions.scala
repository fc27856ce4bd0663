package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{ChunkCodec, FileChunk}

/** Native Catalyst expressions for the chunk wire codec (C1/C2) — the
  * SURVEY §4 upgrade from the v0 udf: no Row/case-class round trip, null
  * semantics handled by `UnaryExpression.nullSafeEval`, usable from SQL via
  * [[ChunkFunctions.register]]. `doGenCode` emits a call back into the
  * expression object (the codec body is one opaque call, so inlining buys
  * nothing) — unlike CodegenFallback this keeps the surrounding operators
  * inside one WholeStageCodegen span instead of splitting the pipeline.
  */
case class PackChunk(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.length == FileChunk.schema.length =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_chunk expects the 10-field chunk struct, got $other")
    }
  override def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[InternalRow]
    val c = FileChunk(
      filename = r.getUTF8String(0).toString,
      fileHash = r.getBinary(1),
      chunkHash = r.getBinary(2),
      chunkOffsetWrite = r.getLong(3),
      chunkI = r.getInt(4),
      nTotalChunks = r.getInt(5),
      subdirStr = if (r.isNullAt(6)) "" else r.getUTF8String(6).toString,
      filenameAppend = if (r.isNullAt(7)) "" else r.getUTF8String(7).toString,
      data = r.getBinary(8),
      fileMtime = if (r.isNullAt(9)) None else Some(r.getDouble(9)))
    ChunkCodec.pack(c)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("packChunk", this, classOf[PackChunk].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (byte[]) $self.nullSafeEval($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): PackChunk =
    copy(child = newChild)
}

case class UnpackChunk(child: Expression) extends UnaryExpression {
  override def dataType: DataType = FileChunk.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unpack_chunk expects BINARY, got $other")
    }
  override def nullSafeEval(input: Any): Any = {
    val c = ChunkCodec.unpack(input.asInstanceOf[Array[Byte]])
    InternalRow(
      UTF8String.fromString(c.filename), c.fileHash, c.chunkHash,
      c.chunkOffsetWrite, c.chunkI, c.nTotalChunks,
      UTF8String.fromString(c.subdirStr), UTF8String.fromString(c.filenameAppend),
      c.data, c.fileMtime.map(Double.box).orNull)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unpackChunk", this, classOf[UnpackChunk].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.nullSafeEval($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): UnpackChunk =
    copy(child = newChild)
}

object ChunkFunctions {
  /** Register `pack_chunk` / `unpack_chunk` for SQL use in this session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("pack_chunk", es => PackChunk(es.head), "built-in")
    reg.createOrReplaceTempFunction("unpack_chunk", es => UnpackChunk(es.head), "built-in")
    reg.createOrReplaceTempFunction("chunk_binary",
      es => ChunkBinary(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_dot",
      es => FloatVecDot(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm",
      es => FloatVecNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("gear_boundaries",
      es => GearBoundaries(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("image_header",
      es => ImageHeader(es.head), "built-in")
    reg.createOrReplaceTempFunction("audio_header",
      es => AudioHeader(es.head), "built-in")
    reg.createOrReplaceTempFunction("video_header",
      es => VideoHeader(es.head), "built-in")
    reg.createOrReplaceTempFunction("video_tracks",
      es => VideoTracks(es.head), "built-in")
    reg.createOrReplaceTempFunction("video_samples",
      es => VideoSamples(es.head), "built-in")
    reg.createOrReplaceTempFunction("mkv_tracks",
      es => MkvTracks(es.head), "built-in")
    reg.createOrReplaceTempFunction("mkv_blocks",
      es => MkvBlocks(es.head), "built-in")
    reg.createOrReplaceTempFunction("id3_tags",
      es => Id3Tags(es.head), "built-in")
    reg.createOrReplaceTempFunction("exif_tags",
      es => ExifTags(es.head), "built-in")
    reg.createOrReplaceTempFunction("exif_scrub_gps",
      es => ExifScrubGps(es.head), "built-in")
    reg.createOrReplaceTempFunction("image_ahash",
      es => ImageAHash(es.head), "built-in")
    reg.createOrReplaceTempFunction("ts_packets",
      es => TsPackets(es.head), "built-in")
    reg.createOrReplaceTempFunction("ts_pes",
      es => TsPes(es.head), "built-in")
    reg.createOrReplaceTempFunction("annexb_nals",
      es => AnnexbNals(es.head), "built-in")
    reg.createOrReplaceTempFunction("h264_sps_meta",
      es => H264SpsMeta(es.head), "built-in")
    reg.createOrReplaceTempFunction("warc_records",
      es => WarcRecords(es.head), "built-in")
    reg.createOrReplaceTempFunction("zip_entries",
      es => ZipEntries(es.head), "built-in")
    reg.createOrReplaceTempFunction("tar_entries",
      es => TarEntries(es.head), "built-in")
    reg.createOrReplaceTempFunction("pcm_frames",
      es => PcmFrames(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("h264_meta",
      es => H264Meta(es.head), "built-in")
    reg.createOrReplaceTempFunction("hevc_meta",
      es => HevcMeta(es.head), "built-in")
    reg.createOrReplaceTempFunction("av1_meta",
      es => Av1Meta(es.head), "built-in")
    reg.createOrReplaceTempFunction("bmp_pixels",
      es => BmpPixels(es.head), "built-in")
    reg.createOrReplaceTempFunction("png_pixels",
      es => PngPixels(es.head), "built-in")
    reg.createOrReplaceTempFunction("gif_pixels",
      es => GifPixels(es.head), "built-in")
    reg.createOrReplaceTempFunction("jpeg_pixels",
      es => JpegPixels(es.head), "built-in")
    reg.createOrReplaceTempFunction("pcm_stats",
      es => PcmStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("odt_text",
      es => OdtText(es.head), "built-in")
    reg.createOrReplaceTempFunction("epub_chapters",
      es => EpubChapters(es.head), "built-in")
    reg.createOrReplaceTempFunction("rtf_text",
      es => RtfText(es.head), "built-in")
    reg.createOrReplaceTempFunction("eml_parse",
      es => EmlParse(es.head), "built-in")
    reg.createOrReplaceTempFunction("gunzip_bytes",
      es => GunzipBytes(es.head), "built-in")
    reg.createOrReplaceTempFunction("ods_text",
      es => OdsText(es.head), "built-in")
    reg.createOrReplaceTempFunction("bunzip_bytes",
      es => BunzipBytes(es.head), "built-in")
    reg.createOrReplaceTempFunction("bz2_extents",
      es => Bzip2Extents(es.head), "built-in")
    reg.createOrReplaceTempFunction("wikitext_plain",
      es => WikitextPlain(es.head), "built-in")
    reg.createOrReplaceTempFunction("zstd_bytes",
      es => ZstdBytes(es.head), "built-in")
    reg.createOrReplaceTempFunction("xz_bytes",
      es => XzBytes(es.head), "built-in")
    reg.createOrReplaceTempFunction("sevenz_entries",
      es => SevenZipEntries(es.head), "built-in")
    reg.createOrReplaceTempFunction("zstd_extents",
      es => ZstdExtents(es.head), "built-in")
    reg.createOrReplaceTempFunction("zstd_dict",
      es => ZstdDictExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("zstd_bytes_dict",
      es => ZstdBytesDict(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("odp_slides",
      es => OdpSlides(es.head), "built-in")
  }
}

/** Session extension installing the codec functions at session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("pack_chunk"),
      new ExpressionInfo(classOf[PackChunk].getName, "pack_chunk"),
      es => PackChunk(es.head)))
    e.injectFunction((FunctionIdentifier("unpack_chunk"),
      new ExpressionInfo(classOf[UnpackChunk].getName, "unpack_chunk"),
      es => UnpackChunk(es.head)))
    e.injectFunction((FunctionIdentifier("chunk_binary"),
      new ExpressionInfo(classOf[ChunkBinary].getName, "chunk_binary"),
      es => ChunkBinary(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      es => FloatVecDot(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[FloatVecNorm].getName, "vec_norm"),
      es => FloatVecNorm(es.head)))
    e.injectFunction((FunctionIdentifier("gear_boundaries"),
      new ExpressionInfo(classOf[GearBoundaries].getName, "gear_boundaries"),
      es => GearBoundaries(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("image_header"),
      new ExpressionInfo(classOf[ImageHeader].getName, "image_header"),
      es => ImageHeader(es.head)))
    e.injectFunction((FunctionIdentifier("audio_header"),
      new ExpressionInfo(classOf[AudioHeader].getName, "audio_header"),
      es => AudioHeader(es.head)))
    e.injectFunction((FunctionIdentifier("video_header"),
      new ExpressionInfo(classOf[VideoHeader].getName, "video_header"),
      es => VideoHeader(es.head)))
    e.injectFunction((FunctionIdentifier("video_tracks"),
      new ExpressionInfo(classOf[VideoTracks].getName, "video_tracks"),
      es => VideoTracks(es.head)))
    e.injectFunction((FunctionIdentifier("video_samples"),
      new ExpressionInfo(classOf[VideoSamples].getName, "video_samples"),
      es => VideoSamples(es.head)))
    e.injectFunction((FunctionIdentifier("mkv_tracks"),
      new ExpressionInfo(classOf[MkvTracks].getName, "mkv_tracks"),
      es => MkvTracks(es.head)))
    e.injectFunction((FunctionIdentifier("mkv_blocks"),
      new ExpressionInfo(classOf[MkvBlocks].getName, "mkv_blocks"),
      es => MkvBlocks(es.head)))
    e.injectFunction((FunctionIdentifier("id3_tags"),
      new ExpressionInfo(classOf[Id3Tags].getName, "id3_tags"),
      es => Id3Tags(es.head)))
    e.injectFunction((FunctionIdentifier("exif_tags"),
      new ExpressionInfo(classOf[ExifTags].getName, "exif_tags"),
      es => ExifTags(es.head)))
    e.injectFunction((FunctionIdentifier("exif_scrub_gps"),
      new ExpressionInfo(classOf[ExifScrubGps].getName, "exif_scrub_gps"),
      es => ExifScrubGps(es.head)))
    e.injectFunction((FunctionIdentifier("image_ahash"),
      new ExpressionInfo(classOf[ImageAHash].getName, "image_ahash"),
      es => ImageAHash(es.head)))
    e.injectFunction((FunctionIdentifier("ts_packets"),
      new ExpressionInfo(classOf[TsPackets].getName, "ts_packets"),
      es => TsPackets(es.head)))
    e.injectFunction((FunctionIdentifier("ts_pes"),
      new ExpressionInfo(classOf[TsPes].getName, "ts_pes"),
      es => TsPes(es.head)))
    e.injectFunction((FunctionIdentifier("annexb_nals"),
      new ExpressionInfo(classOf[AnnexbNals].getName, "annexb_nals"),
      es => AnnexbNals(es.head)))
    e.injectFunction((FunctionIdentifier("h264_sps_meta"),
      new ExpressionInfo(classOf[H264SpsMeta].getName, "h264_sps_meta"),
      es => H264SpsMeta(es.head)))
    e.injectFunction((FunctionIdentifier("warc_records"),
      new ExpressionInfo(classOf[WarcRecords].getName, "warc_records"),
      es => WarcRecords(es.head)))
    e.injectFunction((FunctionIdentifier("zip_entries"),
      new ExpressionInfo(classOf[ZipEntries].getName, "zip_entries"),
      es => ZipEntries(es.head)))
    e.injectFunction((FunctionIdentifier("tar_entries"),
      new ExpressionInfo(classOf[TarEntries].getName, "tar_entries"),
      es => TarEntries(es.head)))
    e.injectFunction((FunctionIdentifier("pcm_frames"),
      new ExpressionInfo(classOf[PcmFrames].getName, "pcm_frames"),
      es => PcmFrames(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("h264_meta"),
      new ExpressionInfo(classOf[H264Meta].getName, "h264_meta"),
      es => H264Meta(es.head)))
    e.injectFunction((FunctionIdentifier("hevc_meta"),
      new ExpressionInfo(classOf[HevcMeta].getName, "hevc_meta"),
      es => HevcMeta(es.head)))
    e.injectFunction((FunctionIdentifier("av1_meta"),
      new ExpressionInfo(classOf[Av1Meta].getName, "av1_meta"),
      es => Av1Meta(es.head)))
    e.injectFunction((FunctionIdentifier("bmp_pixels"),
      new ExpressionInfo(classOf[BmpPixels].getName, "bmp_pixels"),
      es => BmpPixels(es.head)))
    e.injectFunction((FunctionIdentifier("png_pixels"),
      new ExpressionInfo(classOf[PngPixels].getName, "png_pixels"),
      es => PngPixels(es.head)))
    e.injectFunction((FunctionIdentifier("gif_pixels"),
      new ExpressionInfo(classOf[GifPixels].getName, "gif_pixels"),
      es => GifPixels(es.head)))
    e.injectFunction((FunctionIdentifier("jpeg_pixels"),
      new ExpressionInfo(classOf[JpegPixels].getName, "jpeg_pixels"),
      es => JpegPixels(es.head)))
    e.injectFunction((FunctionIdentifier("pcm_stats"),
      new ExpressionInfo(classOf[PcmStats].getName, "pcm_stats"),
      es => PcmStats(es.head)))
    e.injectFunction((FunctionIdentifier("warc_index"),
      new ExpressionInfo(classOf[WarcIndex].getName, "warc_index"),
      es => WarcIndex(es.head)))
    e.injectFunction((FunctionIdentifier("pdf_meta"),
      new ExpressionInfo(classOf[PdfMeta].getName, "pdf_meta"),
      es => PdfMeta(es.head)))
    e.injectFunction((FunctionIdentifier("pdf_text"),
      new ExpressionInfo(classOf[PdfText].getName, "pdf_text"),
      es => PdfText(es.head)))
    e.injectFunction((FunctionIdentifier("flac_decode"),
      new ExpressionInfo(classOf[FlacDecode].getName, "flac_decode"),
      es => FlacDecode(es.head)))
    e.injectFunction((FunctionIdentifier("odt_text"),
      new ExpressionInfo(classOf[OdtText].getName, "odt_text"),
      es => OdtText(es.head)))
    e.injectFunction((FunctionIdentifier("epub_chapters"),
      new ExpressionInfo(classOf[EpubChapters].getName, "epub_chapters"),
      es => EpubChapters(es.head)))
    e.injectFunction((FunctionIdentifier("rtf_text"),
      new ExpressionInfo(classOf[RtfText].getName, "rtf_text"),
      es => RtfText(es.head)))
    e.injectFunction((FunctionIdentifier("eml_parse"),
      new ExpressionInfo(classOf[EmlParse].getName, "eml_parse"),
      es => EmlParse(es.head)))
    e.injectFunction((FunctionIdentifier("gunzip_bytes"),
      new ExpressionInfo(classOf[GunzipBytes].getName, "gunzip_bytes"),
      es => GunzipBytes(es.head)))
    e.injectFunction((FunctionIdentifier("ods_text"),
      new ExpressionInfo(classOf[OdsText].getName, "ods_text"),
      es => OdsText(es.head)))
    e.injectFunction((FunctionIdentifier("bunzip_bytes"),
      new ExpressionInfo(classOf[BunzipBytes].getName, "bunzip_bytes"),
      es => BunzipBytes(es.head)))
    e.injectFunction((FunctionIdentifier("bz2_extents"),
      new ExpressionInfo(classOf[Bzip2Extents].getName, "bz2_extents"),
      es => Bzip2Extents(es.head)))
    e.injectFunction((FunctionIdentifier("wikitext_plain"),
      new ExpressionInfo(classOf[WikitextPlain].getName, "wikitext_plain"),
      es => WikitextPlain(es.head)))
    e.injectFunction((FunctionIdentifier("zstd_bytes"),
      new ExpressionInfo(classOf[ZstdBytes].getName, "zstd_bytes"),
      es => ZstdBytes(es.head)))
    e.injectFunction((FunctionIdentifier("xz_bytes"),
      new ExpressionInfo(classOf[XzBytes].getName, "xz_bytes"),
      es => XzBytes(es.head)))
    e.injectFunction((FunctionIdentifier("sevenz_entries"),
      new ExpressionInfo(classOf[SevenZipEntries].getName, "sevenz_entries"),
      es => SevenZipEntries(es.head)))
    e.injectFunction((FunctionIdentifier("zstd_extents"),
      new ExpressionInfo(classOf[ZstdExtents].getName, "zstd_extents"),
      es => ZstdExtents(es.head)))
    e.injectFunction((FunctionIdentifier("zstd_dict"),
      new ExpressionInfo(classOf[ZstdDictExpr].getName, "zstd_dict"),
      es => ZstdDictExpr(es.head)))
    e.injectFunction((FunctionIdentifier("zstd_bytes_dict"),
      new ExpressionInfo(classOf[ZstdBytesDict].getName, "zstd_bytes_dict"),
      es => ZstdBytesDict(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("odp_slides"),
      new ExpressionInfo(classOf[OdpSlides].getName, "odp_slides"),
      es => OdpSlides(es.head)))
    // bloom_bits(hs, m): aggregate the array<bigint> bucket positions of
    // each row into an m-bit Bloom set (m from a foldable int literal)
    e.injectFunction((FunctionIdentifier("bloom_bits"),
      new ExpressionInfo(classOf[BloomBits].getName, "bloom_bits"),
      es => BloomBits(es.head,
        es(1).eval(null).asInstanceOf[Number].intValue())
        .toAggregateExpression()))
  }
}
