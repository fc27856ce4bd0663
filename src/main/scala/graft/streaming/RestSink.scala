package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.Dataset

import graft.batch.AssembledFile

/** Girder-shaped REST upload sink (K4): per completed file, ensure the
  * nested folder path exists, skip the upload when the server already holds
  * an item with the same checksum, upload otherwise, and attach metadata —
  * with bounded retry/backoff on 403/429/5xx (reference
  * girder_upload_stream_processor.py:28-552: folder reuse :224-263,
  * checksum skip :299-315, retry :145-151). Connector shape only — the
  * protocol here is a minimal generic REST contract, not the Girder API:
  *   GET  {base}/item?path=...      -> 200 {"sha256": "..."} | 404
  *   POST {base}/folder?path=...    -> 200
  *   POST {base}/item?path=...&sha256=...  body=bytes -> 200
  * One HttpClient per partition (the reference's thread-local sessions).
  */
object RestSink {

  final case class UploadResult(rel_filepath: String, action: String, attempts: Int)

  private def sha256hex(b: Array[Byte]): String =
    graft.core.ChunkCodec.digestHex("SHA-256", b)

  /** Statuses worth retrying, per the reference's retry filter. */
  private[streaming] def retryable(status: Int): Boolean =
    status == 403 || status == 429 || status >= 500

  /** True iff the GET body carries `"sha256": "<hex>"` as a field value —
    * a raw substring test would false-match a digest echoed in an error
    * message or a multi-item listing and skip an upload that never landed. */
  private[streaming] def bodyHasSha(body: String, sha: String): Boolean =
    ("\"sha256\"\\s*:\\s*\"" + java.util.regex.Pattern.quote(sha) + "\"").r
      .findFirstIn(body).isDefined

  private[streaming] def withRetry[A](maxAttempts: Int, sleepMs: Long)(
      send: () => (Int, A)): (Int, A, Int) = {
    var attempt = 1
    var last = send()
    while (retryable(last._1) && attempt < maxAttempts) {
      Thread.sleep(sleepMs * attempt) // linear backoff
      attempt += 1
      last = send()
    }
    (last._1, last._2, attempt)
  }

  def upload(
      files: Dataset[AssembledFile],
      baseUrl: String,
      maxAttempts: Int = 5,
      backoffMs: Long = 100): Dataset[UploadResult] = {
    import files.sparkSession.implicits._
    files.filter(_.code == graft.core.Assembly.Code.Complete).mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val client = HttpClient.newHttpClient() // partition-local session
        def call(method: String, path: String, body: Array[Byte]): (Int, String) = {
          val b = HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
          val req = (method match {
            case "GET" => b.GET()
            case "POST" => b.POST(HttpRequest.BodyPublishers.ofByteArray(
              Option(body).getOrElse(Array.empty)))
          }).build()
          val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          (resp.statusCode(), resp.body())
        }
        it.map { f =>
          if (!graft.core.SafePaths.isSafe(f.rel_filepath))
            UploadResult(f.rel_filepath, "rejected_unsafe_path", 0)
          else {
          val sha = sha256hex(f.data)
          val rel = graft.core.SafePaths.safeKey(f.rel_filepath)
          val enc = java.net.URLEncoder.encode(rel, "UTF-8")
          // checksum-based skip-if-same (idempotent under replay)
          val (gs, gb, a1) = withRetry(maxAttempts, backoffMs)(
            () => call("GET", s"/item?path=$enc", null))
          if (gs == 200 && bodyHasSha(gb, sha))
            UploadResult(f.rel_filepath, "skipped", a1)
          else {
            // ensure nested folders (reuseExisting semantics server-side)
            val parent = rel.split('/').dropRight(1).mkString("/")
            if (parent.nonEmpty) withRetry(maxAttempts, backoffMs)(() =>
              call("POST", s"/folder?path=${java.net.URLEncoder.encode(parent, "UTF-8")}", null))
            val (us, _, a2) = withRetry(maxAttempts, backoffMs)(() =>
              call("POST", s"/item?path=$enc&sha256=$sha", f.data))
            UploadResult(f.rel_filepath,
              if (us == 200) "uploaded" else s"failed_$us", a1 + a2)
          }
          }
        }
      }
    }
  }
}
