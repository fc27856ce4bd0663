package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Core._

/** Document/chunk declared queries (SURVEY.md §2.12 Q2, Q4–Q7, Q9, Q10, Q25,
  * Q27, Q28) — the relational mirrors of the reference's chunk/assembly
  * dataflow plus the north-star dedup/text ops.
  */
object Documents {

  /** Q2 the chunker as SQL (T1, reference upload_data_file.py:230-304). */
  val q02 = DQ("q02_chunker", Some(
    s"""WITH $chunksCte
       |SELECT doc_id, chunk_i, chunk FROM chunks ORDER BY doc_id, chunk_i""".stripMargin)) {
    (spark, dir) =>
      chunks(spark, dir).select("doc_id", "chunk_i", "chunk").orderBy("doc_id", "chunk_i")
  }

  /** Q4 per-chunk integrity hash (T8, reference data_file_chunk.py:243-270;
    * sha512 on the wire, sha256 here for oracle parity). */
  val q04 = DQ("q04_hash_integrity", Some(
    """SELECT doc_id, sha256(text) AS sha FROM documents ORDER BY doc_id LIMIT 500""")) {
    (spark, dir) =>
      table(spark, dir, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("sha"))
        .orderBy("doc_id").limit(500)
  }

  /** Q5 reassembly as ordered group-agg (G1,
    * reference download_data_file.py:76-156): groups are complete when the
    * distinct chunk count reaches n_total; the whole doc is the in-order
    * concatenation. */
  val q05 = DQ("q05_reassembly", Some(
    s"""WITH $chunksCte
       |SELECT doc_id, count(*) AS n, string_agg(chunk, '' ORDER BY chunk_i) AS whole
       |FROM chunks GROUP BY doc_id HAVING count(*) = max(n_total)
       |ORDER BY doc_id""".stripMargin)) {
    (spark, dir) =>
      chunks(spark, dir)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"), max("n_total").as("nt"),
          array_join(
            transform(array_sort(collect_list(struct(col("chunk_i"), col("chunk")))),
              x => x.getField("chunk")), "").as("whole"))
        .filter(col("n") === col("nt"))
        .select("doc_id", "n", "whole").orderBy("doc_id")
  }

  /** Q6 duplicate-chunk dedup (J5, reference download_data_file.py:98-107). */
  val q06 = DQ("q06_chunk_dedup", Some(
    s"""WITH $chunksDupCte,
       |ranked AS (
       |  SELECT doc_id, chunk_i,
       |         row_number() OVER (PARTITION BY doc_id, chunk_i
       |                            ORDER BY generation DESC) AS rn
       |  FROM chunks_dup)
       |SELECT doc_id, count(*) AS n_surviving FROM ranked WHERE rn = 1
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin)) {
    (spark, dir) =>
      // rn=1 keeps exactly one row per (doc_id, chunk_i), so the count per
      // doc is the distinct chunk_i count — two hash aggregations (both with
      // map-side partials) instead of a per-partition sort + row_number;
      // at-least-once duplicate inflation collapses before the exchange.
      chunksDup(spark, dir)
        .groupBy("doc_id", "chunk_i").agg(count(lit(1)).as("dups"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_surviving"))
        .orderBy("doc_id")
  }

  /** Q7 generation argmax (G2/J4, reference download_data_file.py:160-272):
    * newest generation = max (n_total, generation). */
  val q07 = DQ("q07_generation_argmax", Some(
    s"""WITH $chunksDupCte,
       |gens AS (SELECT DISTINCT doc_id, generation, n_total FROM chunks_dup),
       |ranked AS (
       |  SELECT doc_id, generation,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY n_total DESC, generation DESC) AS rn
       |  FROM gens)
       |SELECT doc_id, generation AS kept_generation FROM ranked WHERE rn = 1
       |ORDER BY doc_id""".stripMargin)) {
    (spark, dir) =>
      // Argmax, not sort: max_by over the (n_total, generation) struct picks
      // the same winner as the oracle's ORDER BY n_total DESC, generation
      // DESC rn=1, and duplicate chunks of one generation can't change a
      // max — so the pre-DISTINCT and the window sort both disappear into
      // one partial-aggregating shuffle (the q15_asof/x23 argmax pattern).
      chunksDup(spark, dir)
        .groupBy("doc_id")
        .agg(max_by(col("generation"), struct(col("n_total"), col("generation")))
          .as("kept_generation"))
        .orderBy("doc_id")
  }

  private val tokenPat = "^(\\S+)\\s+(\\S+)\\s+(\\S+)"

  /** Q9 metadata extraction to key/value rows (G5,
    * reference metadata_json_reproducer.py:74-93). */
  val q09 = DQ("q09_metadata_kv", Some(
    s"""SELECT doc_id, k, v FROM (
       |  SELECT doc_id, 'w1' AS k, regexp_extract(text, '^(\\S+)\\s+(\\S+)\\s+(\\S+)', 1) AS v FROM documents
       |  UNION ALL
       |  SELECT doc_id, 'w2' AS k, regexp_extract(text, '^(\\S+)\\s+(\\S+)\\s+(\\S+)', 2) AS v FROM documents
       |  UNION ALL
       |  SELECT doc_id, 'w3' AS k, regexp_extract(text, '^(\\S+)\\s+(\\S+)\\s+(\\S+)', 3) AS v FROM documents
       |) t ORDER BY doc_id, k""".stripMargin)) {
    (spark, dir) =>
      val d = table(spark, dir, "documents")
      (1 to 3).map { i =>
        d.select(col("doc_id"), lit(s"w$i").as("k"),
          regexp_extract(col("text"), tokenPat, i).as("v"))
      }.reduce(_ unionByName _).orderBy("doc_id", "k")
  }

  /** Q10 JSON construction, length-checked (G5 metadata JSON,
    * reference metadata_json_message.py:14-20). */
  val q10 = DQ("q10_json_build", Some(
    """SELECT doc_id,
      |  CAST(length(CAST(json_object('doc_id', doc_id, 'lang', lang, 'n_chars', n_chars) AS VARCHAR)) AS INT) AS json_len
      |FROM documents ORDER BY doc_id""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "documents")
        .select(col("doc_id"),
          length(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))))
            .cast("int").as("json_len"))
        .orderBy("doc_id")
  }

  /** Q25 exact dedup (north star). */
  val q25 = DQ("q25_exact_dedup", Some(
    """SELECT 'distinct_texts' AS metric, count(*) AS n
      |  FROM (SELECT DISTINCT text FROM documents) t
      |UNION ALL
      |SELECT 'dup_groups' AS metric, count(*) AS n
      |  FROM (SELECT text FROM documents GROUP BY text HAVING count(*) > 1) t
      |ORDER BY metric""".stripMargin)) {
    (spark, dir) =>
      val d = table(spark, dir, "documents").select("text")
      val distinctTexts = d.distinct().agg(count(lit(1)).as("n"))
        .withColumn("metric", lit("distinct_texts"))
      val dupGroups = d.groupBy("text").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).agg(count(lit(1)).as("n"))
        .withColumn("metric", lit("dup_groups"))
      distinctTexts.unionByName(dupGroups).select("metric", "n").orderBy("metric")
  }

  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "on", "for", "with", "as", "by", "at", "from", "that",
    "this", "be", "are", "was", "were", "has", "have", "had", "not", "but",
    "they", "you")

  private val stopwordsValues = stopwords.map(w => s"('$w')").mkString(", ")

  /** Q27 token counts with stopword anti-join (north star text analysis). */
  val q27 = DQ("q27_token_counts", Some(
    s"""WITH stopwords AS (SELECT * FROM (VALUES $stopwordsValues) AS s(w)),
       |toks AS (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok FROM documents),
       |counts AS (
       |  SELECT tok, count(*) AS n FROM toks
       |  WHERE tok <> '' AND tok NOT IN (SELECT w FROM stopwords)
       |  GROUP BY tok)
       |SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT 20""".stripMargin)) {
    (spark, dir) =>
      val toks = table(spark, dir, "documents")
        .select(explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
        .filter(col("tok") =!= "")
      val stop = spark.createDataFrame(stopwords.map(Tuple1(_))).toDF("tok")
      toks.join(broadcast(stop), Seq("tok"), "left_anti")
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(20)
  }

  /** Q28 near-dup 5-gram shingle Jaccard at 0.8 within lang (north star;
    * deterministically empty on the synthetic corpus — the 0.8 bar is the
    * spec; x-prefixed extras exercise lower thresholds). */
  val q28 = DQ("q28_neardup_shingles", Some(neardupSql(0.8))) {
    (spark, dir) => neardup(spark, dir, 0.8)
  }

  def neardupSql(threshold: Double): String =
    s"""WITH docs AS (SELECT doc_id, lang, lower(text) AS t FROM documents WHERE doc_id < 100),
       |idx AS (SELECT doc_id, lang, t,
       |               unnest(generate_series(1, greatest(length(t)-4, 0))) AS i
       |        FROM docs),
       |sh AS (SELECT DISTINCT doc_id, lang, substring(t, CAST(i AS INT), 5) AS g FROM idx),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS ninter
       |  FROM sh a JOIN sh b ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |j AS (
       |  SELECT id1, id2,
       |         round(CAST(ninter AS DOUBLE) / (c1.n + c2.n - ninter), 6) AS jac
       |  FROM inter JOIN cnt c1 ON c1.doc_id = id1 JOIN cnt c2 ON c2.doc_id = id2)
       |SELECT id1, id2, jac FROM j WHERE jac >= $threshold ORDER BY id1, id2""".stripMargin

  /** Shared shingle-Jaccard pipeline: distinct char-5-gram sets, intersection
    * via self-join on the shingle (partitioned hash join — the LSH-banded
    * variant in TextOps is the 100 TB path), |A∪B| by inclusion-exclusion. */
  def neardup(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    val docs = table(spark, dir, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"), col("lang"), lower(col("text")).as("t"))
    val sh = docs
      .select(col("doc_id"), col("lang"),
        explode(charShingles(col("t"), 5)).as("g"))
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("id1"), col("lang"), col("g"))
    val b = sh.select(col("doc_id").as("id2"), col("lang").as("lang2"), col("g").as("g2"))
    val inter = a.join(b,
        col("g") === col("g2") && col("lang") === col("lang2") && col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("ninter"))
    inter
      .join(cnt.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
      .join(cnt.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
      .withColumn("jac",
        round(col("ninter").cast("double") / (col("n1") + col("n2") - col("ninter")), 6))
      .filter(col("jac") >= threshold)
      .select("id1", "id2", "jac").orderBy("id1", "id2")
  }

  val all: Seq[DQ] = Seq(q02, q04, q05, q06, q07, q09, q10, q25, q27, q28)
}
