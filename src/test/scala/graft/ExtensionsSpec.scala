package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** The SparkSessionExtensions install path: a session built with
  * GraftExtensions resolves pack_chunk/unpack_chunk in SQL with no explicit
  * registration call. Runs in its own suite so the fresh session (with
  * extensions applied at build time) isn't shadowed by a cached default. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions installs codec functions for SQL") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      // Fail loudly (no interpreted fallback) if the codec expressions'
      // doGenCode emits Java that janino can't compile.
      .config("spark.sql.codegen.fallback", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import spark.implicits._
      val data = "extensions payload".getBytes
      val chunk = graft.core.Chunker.chunk("e.bin", "", data, 16, Nil, Some(7.0))
        .map(graft.batch.ChunkRow(_))
      spark.createDataset(chunk).createOrReplaceTempView("ext_chunks")
      val n = spark.sql(
        """SELECT count(*) AS n FROM ext_chunks
          |WHERE unpack_chunk(pack_chunk(struct(
          |  filename, file_hash, chunk_hash, chunk_offset_write, chunk_i,
          |  n_total_chunks, subdir_str, filename_append, data, file_mtime))).chunk_i = chunk_i
          |""".stripMargin).as[Long].head()
      assert(n == chunk.length)
      // Native vector math (same session, still with codegen fallback off):
      // exact doubles vs the HOF formulation they replaced.
      val (d, nrm, hofD) = spark.sql(
        """SELECT vec_dot(a, b), vec_norm(a),
          |       aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |                 CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)
          |FROM VALUES (array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT), CAST(0.25 AS FLOAT)),
          |             array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT), CAST(8.0 AS FLOAT))) t(a, b)
          |""".stripMargin).as[(Double, Double, Double)].head()
      assert(d == hofD && d == 1.5 * 4.0 + -2.0 * 0.5 + 0.25 * 8.0)
      assert(nrm == math.sqrt(1.5 * 1.5 + 2.0 * 2.0 + 0.25 * 0.25))
      // round-8 surface, same no-fallback session: EBML walk, block slice
      // and ID3 tags resolve in SQL and their doGenCode compiles
      val webm = graft.functions.Mkv.buildMkvBlocks("webm", 1000000L, 80L,
        Seq(graft.functions.Mkv.MkvTrackSpec(1, "video", "V_VP9",
          width = 640, height = 360)),
        Seq(graft.functions.Mkv.MkvClusterSpec(0L,
          Seq((1, 40, "frame!".getBytes)))))
      val tagged = graft.functions.Id3.buildV2(4, 3, "T", "A", "B", "2001") ++
        graft.functions.AudioHeaders.buildMp3(9, 0, 2)
      spark.createDataset(Seq((webm, tagged))).toDF("w", "m")
        .createOrReplaceTempView("ext_media")
      val (codec, w, ts, frame, title) = spark.sql(
        """SELECT mkv_tracks(w)[0].codec, mkv_tracks(w)[0].width,
          |       mkv_blocks(w)[0].ts_ticks,
          |       CAST(substring(w, CAST(mkv_blocks(w)[0].offset AS INT) + 1,
          |                      mkv_blocks(w)[0].size) AS STRING),
          |       id3_tags(m).title
          |FROM ext_media""".stripMargin)
        .as[(String, Int, Long, String, String)].head()
      assert(codec == "V_VP9" && w == 640 && ts == 40L &&
        frame == "frame!" && title == "T")
      // round-8 session-3 surface: CDX index + bloom aggregate in SQL,
      // same no-fallback session — the index extent slices and re-parses,
      // and the bloom bitset answers membership with pure builtins
      val warc = graft.functions.Warc.buildGz(Seq(
        ("response", "http://e.example/1", "2024-01-01T00:00:00Z",
          "sql body".getBytes)))
      spark.createDataset(Seq(Tuple1(warc))).toDF("a")
        .createOrReplaceTempView("ext_warc")
      val (uri, one, dig) = spark.sql(
        """SELECT warc_index(a)[0].uri,
          |       size(warc_records(substring(a,
          |         CAST(warc_index(a)[0].offset AS INT) + 1,
          |         CAST(warc_index(a)[0].length AS INT)))),
          |       warc_index(a)[0].payload_md5 = md5(warc_records(a)[0].payload)
          |FROM ext_warc""".stripMargin)
        .as[(String, Int, Boolean)].head()
      assert(uri == "http://e.example/1" && one == 1 && dig)
      val (w0, w1) = spark.sql(
        """SELECT bits[0], bits[1] FROM (
          |  SELECT bloom_bits(hs, 128) AS bits
          |  FROM VALUES (array(CAST(0 AS BIGINT), CAST(65 AS BIGINT))),
          |              (array(CAST(63 AS BIGINT))) t(hs))""".stripMargin)
        .as[(Long, Long)].head()
      assert(w0 == ((1L << 0) | (1L << 63)) && w1 == 2L)
      // round-8 session-6 surface: PDF structure walk in SQL, same
      // no-fallback session — version, xref /Size, and Pages /Count, plus
      // the null route for a tail-truncated (unopenable) file
      val pdf = graft.functions.Pdfs.buildPdf(4, 8)
      spark.createDataset(Seq((pdf, pdf.dropRight(30)))).toDF("p", "cut")
        .createOrReplaceTempView("ext_pdf")
      val (pv, pn, pp, cutNull) = spark.sql(
        """SELECT pdf_meta(p).version, pdf_meta(p).n_objects,
          |       pdf_meta(p).n_pages, pdf_meta(cut) IS NULL
          |FROM ext_pdf""".stripMargin)
        .as[(String, Int, Int, Boolean)].head()
      assert(pv == "1.7" && pn == 7 && pp == 4 && cutNull)
      // round-9 surface: pdf_text under the same no-fallback session —
      // escape decoding (parens, backslash, octal newline), TJ kern word
      // spaces, TD line ordering, and the FlateDecode path; plus the null
      // route for the truncated file
      val tricky = "line (one) with \\ and\nbreak"
      val pdfT = graft.functions.Pdfs.buildPdfWithText(
        Seq(tricky, "page two body"), flate = false)
      val pdfZ = graft.functions.Pdfs.buildPdfWithText(
        Seq(tricky), flate = true)
      spark.createDataset(Seq((pdfT, pdfZ, pdfT.dropRight(30))))
        .toDF("t", "z", "cut").createOrReplaceTempView("ext_pdftext")
      val (t1, t2, z1, cutTNull) = spark.sql(
        """SELECT pdf_text(t)[0], pdf_text(t)[1], pdf_text(z)[0],
          |       pdf_text(cut) IS NULL
          |FROM ext_pdftext""".stripMargin)
        .as[(String, String, String, Boolean)].head()
      assert(t1 == "p1 of 2\n" + tricky && cutTNull)
      assert(t2 == "p2 of 2\npage two body")
      assert(z1 == "p1 of 1\n" + tricky)
      // round-9 surface: flac_decode → WAV → pcm_stats chain in SQL under
      // the same no-fallback session, plus the CRC null route
      val pcm = Array.tabulate(300)(i => ((i * 37 + 11) % 1601 - 800) * 20)
      val flac = graft.functions.FlacCodec.encode(1, 8000, 16, Array(pcm), 128)
      val bad = flac.clone(); bad(flac.length - 9) = (bad(flac.length - 9) ^ 1).toByte
      spark.createDataset(Seq((flac, bad))).toDF("f", "bad")
        .createOrReplaceTempView("ext_flac")
      val (fn, fsum, badNull) = spark.sql(
        """SELECT pcm_stats(flac_decode(f)).n_samples,
          |       pcm_stats(flac_decode(f)).sum_sq,
          |       flac_decode(bad) IS NULL
          |FROM ext_flac""".stripMargin)
        .as[(Long, Long, Boolean)].head()
      assert(fn == 300 && fsum == pcm.map(v => v.toLong * v).sum && badNull)
      // NearestCentroid (DataFrame-side; ships a collected model object)
      // under the same fallback=false session
      import org.apache.spark.sql.functions.col
      val cids = spark.createDataset(Seq(
          (1L, Array(0.0f, 0.0f)), (2L, Array(10.0f, 10.0f))))
        .toDF("vec_id", "embedding")
        .withColumn("cid", graft.functions.VectorFunctions.nearestCentroid(
          col("embedding"), Array(7L, 8L),
          Array(Array(0.0f, 1.0f), Array(9.0f, 9.0f))))
        .select("vec_id", "cid").as[(Long, Long)].collect().toMap
      assert(cids == Map(1L -> 7L, 2L -> 8L))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
