package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.batch.AssembledFile

/** G4/G5 reproducer: completion → result message produced to a DIFFERENT
  * topic (reference actor/data_file_stream_reproducer.py:65-297 with the
  * metadata-JSON concrete subclass metadata_json_reproducer.py:12-98).
  * Spark-first: the completed-file stream maps to `(key, value)` rows and
  * the Kafka (or file-topic) sink owns produce/ACK/retry semantics — the
  * reference's per-message broker-ACK registry and recompute-on-failure
  * loop collapse into the sink's checkpointed microbatch commit.
  *
  * Result key mirrors `entity/reproducer_message.py:16-25`, which builds
  * `get_message_prepend(subdir, filename) + "_processing_result"`; the
  * prepend (utilities.py:59-64) itself ends in `_chunk`, so the wire key is
  * `{rel_filepath with /→_}_chunk_processing_result`; value is the metadata JSON
  * (metadata_json_message.py:8-24): file identity, size, chunk count,
  * sha512, mtime, plus `k: v` header lines parsed from the payload head
  * when it is text (the XRD-CSV example's header-block shape,
  * examples/extracting_metadata/xrd_csv_metadata_reproducer.py:9-70).
  */
object Reproducer {

  /** Parse `key: value` header lines from the start of a text payload —
    * stops at the first non-matching line; non-text payloads yield none.
    * Pure function, usable from both the streaming map and tests. */
  def headerMeta(payload: Array[Byte], maxLines: Int = 16): Map[String, String] = {
    if (payload == null) return Map.empty
    val head = new String(payload, 0, math.min(payload.length, 4096),
      java.nio.charset.StandardCharsets.UTF_8)
    val line = "^([A-Za-z0-9_ .-]{1,64}):\\s*(.{0,256})$".r
    head.linesIterator.take(maxLines).map(_.trim).takeWhile {
      case line(_, _) => true
      case _ => false
    }.collect { case line(k, v) => k.trim -> v.trim }.toMap
  }

  /** Completed files → `(key, value)` result messages. Narrow per-row map:
    * no shuffle, payloads never visit the driver. */
  def resultMessages(completed: Dataset[AssembledFile]): DataFrame = {
    import completed.sparkSession.implicits._
    completed
      .filter(_.code == graft.core.Assembly.Code.Complete)
      .map { f =>
        val key = f.rel_filepath.replace("/", "_") + "_chunk_processing_result"
        val headers = headerMeta(f.data)
        val sha = if (f.file_hash == null) ""
          else f.file_hash.map("%02x".format(_)).mkString
        (key, f.rel_filepath, f.size, f.n_chunks, sha,
          f.file_mtime.getOrElse(0.0), headers)
      }
      .toDF("key", "rel_filepath", "size", "n_chunks", "sha512", "mtime", "headers")
      .select(col("key"), to_json(struct(
        col("rel_filepath"), col("size"), col("n_chunks"), col("sha512"),
        col("mtime"), col("headers"))).cast("binary").as("value"))
  }
}
