package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.functions._

/** C4 encryption serde layer — the reference's KafkaCrypto chained serde
  * (openmsistream kafka_wrapper/serialization.py:16-160 `CompoundSerDes`
  * stacks encryption around msgpack; config_file_parser.py:30-42 names the
  * chain). Spark-first: the wire `value` column routes through the built-in
  * `aes_encrypt` / `try_aes_decrypt` expressions (codegen'd; AES-GCM with a
  * random IV per message), so encrypt-after-pack chains compose as plain
  * column functions — `encryptValues(ChunkPipeline.encode(chunks), key)`.
  *
  * Undecryptable messages (wrong key, corrupt ciphertext) must NOT fail
  * tasks: `try_aes_decrypt` yields null and [[splitDecrypted]] routes those
  * rows to a dead-letter frame — the reference's `ENCRYPTED_MESSAGES/` dump
  * of key/value `.bin` pairs (data_file_download_directory.py:108-136) —
  * while good rows flow on. At 100 TB both paths are narrow per-row maps:
  * no shuffle, no driver involvement, poison messages never stall a
  * partition.
  */
object WireCrypto {

  /** Fail fast on a malformed key — otherwise the length check surfaces as
    * per-row task failures deep in a streaming job. */
  private def checkKey(key: Array[Byte]): Unit =
    require(key != null && (key.length == 16 || key.length == 24 || key.length == 32),
      s"AES key must be 16/24/32 bytes, got ${if (key == null) "null" else key.length}")

  /** Encrypt the `value` column in place (AES-GCM, random IV — ciphertext
    * is non-deterministic, roundtrip is exact). Key must be 16/24/32
    * bytes. */
  def encryptValues(wire: DataFrame, key: Array[Byte]): DataFrame = {
    checkKey(key)
    wire.withColumn("value", aes_encrypt(col("value"), lit(key)))
  }

  /** Attempt decryption: adds a `plain` column, null where the message does
    * not decrypt under `key`. */
  def tryDecryptValues(wire: DataFrame, key: Array[Byte]): DataFrame = {
    checkKey(key)
    wire.withColumn("plain", try_aes_decrypt(col("value"), lit(key)))
  }

  /** (decrypted, deadLetters): decrypted has `value` replaced by the
    * plaintext; deadLetters keeps the original ciphertext rows. */
  def splitDecrypted(wire: DataFrame, key: Array[Byte]): (DataFrame, DataFrame) = {
    val tried = tryDecryptValues(wire, key)
    (tried.filter(col("plain").isNotNull)
       .withColumn("value", col("plain")).drop("plain"),
     tried.filter(col("plain").isNull).drop("plain"))
  }

  /** ROTATION-aware decryption: a topic whose data key rotates
    * (KeyExchange generations) carries messages under SEVERAL keys during
    * the overlap window — a consumer holding the known generations tries
    * each (`coalesce` over `try_aes_decrypt` columns, newest first: the
    * common case short-circuits) and only messages under an UNKNOWN
    * generation dead-letter. Still one codegen'd projection per row — the
    * key ring is plan literals, no per-row branching beyond the coalesce.
    * Keys ordered newest-first. */
  def splitDecryptedAny(wire: DataFrame,
      keys: Seq[Array[Byte]]): (DataFrame, DataFrame) = {
    require(keys.nonEmpty, "at least one key required")
    keys.foreach(checkKey)
    val tried = wire.withColumn("plain",
      coalesce(keys.map(k => try_aes_decrypt(col("value"), lit(k))): _*))
    (tried.filter(col("plain").isNotNull)
       .withColumn("value", col("plain")).drop("plain"),
     tried.filter(col("plain").isNull).drop("plain"))
  }

  /** Dead-letter sink matching the reference's on-disk shape: each
    * undecryptable message becomes a `<base>.key.bin` / `<base>.value.bin`
    * pair under `dir`, where `base` is the sha256 of key-bytes‖ciphertext
    * (stable under at-least-once replay — a duplicate delivery rewrites the
    * same pair — while two records that share a ciphertext but differ in
    * Kafka key keep distinct pairs). Expects rows with string `key` and
    * binary `value` columns. */
  final class UndecryptableDumpWriter(dir: String) extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = {
      Files.createDirectories(Paths.get(dir)); true
    }
    override def process(r: Row): Unit = {
      val key = Option(r.getAs[String]("key")).getOrElse("")
      val value = r.getAs[Array[Byte]]("value")
      if (value == null) {
        // a null-valued row carries nothing to recover; skipping it beats
        // an NPE that would poison the dead-letter query on every restart
        System.err.println(s"[UndecryptableDumpWriter] null value skipped (key='$key')")
        return
      }
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(key.getBytes("UTF-8"))
      md.update(value)
      val base = md.digest().map("%02x".format(_)).mkString
      Files.write(Paths.get(dir, s"$base.key.bin"), key.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.write(Paths.get(dir, s"$base.value.bin"), value,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
    override def close(errorOrNull: Throwable): Unit = ()
  }

  /** S6 recovery tool (reference
    * tools/undecryptable_messages/reproduce_undecryptable_messages.py:15-82):
    * read saved key/value `.bin` pairs and re-emit `(key, value)` rows in
    * mtime order, ready for the Kafka sink — run after the decryption key
    * finally arrives. Batch `binaryFile` scan; the pair pivot is one tiny
    * aggregation over the dump (dead letters are rare by construction). */
  def reproduceUndecryptable(spark: SparkSession, dir: String): DataFrame = {
    // an empty/missing dump dir is a normal state (nothing ever failed to
    // decrypt) — return an empty frame instead of a Path-does-not-exist
    // error from the glob
    val d = new java.io.File(dir)
    if (!d.isDirectory || !d.listFiles().exists(_.getName.endsWith(".bin")))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "key STRING, value BINARY, mtime TIMESTAMP"))
    val files = spark.read.format("binaryFile").load(s"$dir/*.bin")
      .select(col("path"), col("modificationTime"), col("content"))
      .withColumn("base", regexp_extract(col("path"), "([^/]+)\\.(key|value)\\.bin$", 1))
      .withColumn("kind", regexp_extract(col("path"), "\\.(key|value)\\.bin$", 1))
      .filter(col("base") =!= "")
    files.groupBy("base").agg(
        max(when(col("kind") === "key", col("content"))).as("key_bytes"),
        max(when(col("kind") === "value", col("content"))).as("value"),
        max(col("modificationTime")).as("mtime"))
      .filter(col("key_bytes").isNotNull && col("value").isNotNull)
      .select(col("key_bytes").cast("string").as("key"), col("value"), col("mtime"))
      .orderBy("mtime", "key")
  }
}
