package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video travel as opaque `binary`
  * columns with typed metadata. The Spark-side plumbing — schema, hash
  * partitioning, batched per-partition decode loop (the Scala analog of a
  * batched Pandas-UDF `mapInPandas` stage) — is real and tested; the codec
  * itself is STUBBED with a deterministic fake because no image/audio
  * libraries exist in this container (see [[StubCodec.decode]]).
  *
  * Scale posture: decode runs inside `mapPartitions` so a real codec
  * amortizes model/library init once per partition-batch, payloads never
  * visit the driver, and `repartition(id hash)` bounds batch skew.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      first_cp: Int,
      sig: String)

  object StubCodec {
    /** STUB: a real implementation would decode image/audio bytes
      * (e.g. JPEG dims, PCM duration). Deterministic fake: byte length,
      * first code point, md5 head — enough to pin the plumbing end-to-end. */
    def decode(id: Long, kind: String, payload: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      MediaMeta(id, kind, payload.length.toLong,
        if (payload.isEmpty) -1
        else new String(payload, java.nio.charset.StandardCharsets.UTF_8)
          .codePointAt(0),
        md.take(4).map("%02x".format(_)).mkString)
    }
  }

  /** The batched decode stage over `(media_id, kind, media binary)` rows.
    * Batch shape: one iterator pass per partition, codec state initialized
    * once per partition (the expensive part for real codecs). */
  def decodeStage(media: DataFrame, partitions: Int = 0): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    val parted = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    parted.select("media_id", "kind", "media").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here (??? for a real library)
        rows.map { case (id, kind, payload) => StubCodec.decode(id, kind, payload) }
      }
  }
}
