package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Core._

/** Relational declared queries over the TPC-H-ish star + `events`
  * (SURVEY.md §2.12 Q1, Q3, Q8, Q11–Q24). Spark-first: DataFrame API,
  * Catalyst handles pushdown/pruning; dimension joins broadcast.
  */
object Relational {

  /** Q1 projection / expression (T6 key derivation shape,
    * reference data_file_chunk.py:101-107). */
  val q01 = DQ("q01_projection", Some(
    """SELECT l_orderkey, l_linenumber, l_orderkey*10+l_linenumber AS k,
      |       concat(l_returnflag, '_', l_linestatus) AS tag
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, tag LIMIT 1000""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("k"),
          concat(col("l_returnflag"), lit("_"), col("l_linestatus")).as("tag"))
        .orderBy("l_orderkey", "l_linenumber", "tag").limit(1000)
  }

  /** Q3 regex/path admission filters (T3/T5,
    * reference upload_directory_event_handler.py:81-117). */
  val q03 = DQ("q03_path_filter", Some(
    """SELECT doc_id, source FROM documents
      |WHERE source NOT LIKE '.%' AND source NOT LIKE '%.log' AND lang = 'en'
      |ORDER BY doc_id""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "documents")
        .filter(!col("source").like(".%") && !col("source").like("%.log")
          && col("lang") === "en")
        .select("doc_id", "source").orderBy("doc_id")
  }

  /** Q8 offset-gated message-key filter (T4,
    * reference openmsistream_consumer.py:351-449). */
  val q08 = DQ("q08_offset_gate", Some(
    """SELECT event_type, count(*) AS n FROM events
      |WHERE event_id >= 1000 OR event_type LIKE 'click%'
      |GROUP BY event_type ORDER BY event_type""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "events")
        .filter(col("event_id") >= 1000 || col("event_type").like("click%"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
  }

  /** Q11 heartbeat tumbling-window aggregation (G6,
    * reference heartbeat_producibles.py:9-108). */
  val q11 = DQ("q11_heartbeat_window", Some(
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |       event_type, count(*) AS n,
      |       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 6) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(money(col("value"))).cast("double"), 6).as("sum_value"))
        .orderBy("window_start", "event_type")
  }

  /** Q12 recent-N per key (G8 "50 most recent files",
    * reference data_file_chunk_handlers.py:148-155). */
  val q12 = DQ("q12_recent_n", Some(
    """WITH ranked AS (
      |  SELECT user_id, event_id,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) AS rn
      |  FROM events)
      |SELECT user_id, count(*) AS n FROM ranked WHERE rn <= 50
      |GROUP BY user_id ORDER BY user_id""".stripMargin)) {
    (spark, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id"))
      table(spark, dir, "events")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 50)
        .groupBy("user_id").agg(count(lit(1)).as("n")).orderBy("user_id")
  }

  /** Q13 star join with broadcast dims (J3). */
  val q13 = DQ("q13_star_join", Some(
    """SELECT r_name, n_name,
      |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |                      (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE l_discount > 0.02
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)) {
    (spark, dir) =>
      // spread: the driver fixtures are single-row-group parquet, so the
      // scan is one task and the whole broadcast-join+partial-agg pipeline
      // above the first exchange would run on one core (13.4 s -> ~1.5 s).
      spread(table(spark, dir, "lineitem").filter(col("l_discount") > 0.02)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
        .join(table(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast("double"), 6).as("revenue"))
        .orderBy("r_name", "n_name")
  }

  /** Q14 outer/semi/anti joins (J1/J2 registry shapes). Deliberately built
    * from real left_semi/left_anti joins — the operators under test — rather
    * than one left-join + conditional aggregation; the extra scans are the
    * cost of exercising the actual plan shapes. */
  val q14 = DQ("q14_semi_anti", Some(
    """SELECT c.c_mktsegment, count(*) AS n_total,
      |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_with,
      |  CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_without
      |FROM customer c GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)) {
    (spark, dir) =>
      val customer = table(spark, dir, "customer")
      val orders = table(spark, dir, "orders")
      val cond = customer("c_custkey") === orders("o_custkey")
      val total = customer.groupBy("c_mktsegment").agg(count(lit(1)).as("n_total"))
      val nWith = customer.join(orders, cond, "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with"))
      val nWithout = customer.join(orders, cond, "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without"))
      total.join(nWith, Seq("c_mktsegment"), "left")
        .join(nWithout, Seq("c_mktsegment"), "left")
        .select(col("c_mktsegment"), col("n_total"),
          coalesce(col("n_with"), lit(0L)).as("n_with"),
          coalesce(col("n_without"), lit(0L)).as("n_without"))
        .orderBy("c_mktsegment")
  }

  /** Q15a range/interval join (J8 byte-range shape): events into hour buckets
    * via non-equi join (bucket list broadcast — nested-loop stays cheap). */
  val q15r = DQ("q15_range_join", Some(
    """WITH buckets AS (SELECT DISTINCT date_trunc('hour', ts) AS bucket_start FROM events)
      |SELECT strftime(b.bucket_start, '%Y-%m-%d %H:%M:%S') AS bucket, count(*) AS n
      |FROM events e JOIN buckets b
      |  ON e.ts >= b.bucket_start AND e.ts < b.bucket_start + INTERVAL 1 HOUR
      |GROUP BY 1 ORDER BY bucket""".stripMargin)) {
    (spark, dir) =>
      val events = table(spark, dir, "events")
      val buckets = events.select(date_trunc("hour", col("ts")).as("bucket_start")).distinct()
        .withColumn("bucket_end", col("bucket_start") + expr("INTERVAL 1 HOUR"))
      // spread the probe: single-row-group scan would bin+join on one core
      graft.batch.Joins.rangeJoinBinned(
          spread(events.select("ts")), "ts", buckets, "bucket_start", "bucket_end",
          binSeconds = 3600L)
        .groupBy(date_format(col("bucket_start"), "yyyy-MM-dd HH:mm:ss").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
  }

  /** Q15b as-of join (J4): latest order at-or-before each event ts per user. */
  val q15a = DQ("q15_asof_join", Some(
    """WITH pairs AS (
      |  SELECT e.event_id, o.o_orderkey,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
      |SELECT event_id, o_orderkey AS last_orderkey FROM pairs WHERE rn = 1
      |ORDER BY event_id""".stripMargin)) {
    (spark, dir) =>
      // As-of via argmax: the equi-join on custkey (range as residual)
      // feeds a partial-aggregating max_by instead of a full per-key sort +
      // row_number — map-side combine collapses each event's candidates
      // before the shuffle. Tie-break (o_orderdate, o_orderkey) struct
      // ordering == the oracle's ORDER BY ... DESC, ... DESC rn=1.
      // spread: single-row-group scan; the join probe + candidate fan-out
      // (≈10 orders/event) must not run on one core.
      spread(table(spark, dir, "events").select("event_id", "user_id", "ts"))
        .join(table(spark, dir, "orders"),
          col("o_custkey") === col("user_id") && col("o_orderdate") <= col("ts"))
        .groupBy("event_id")
        .agg(max_by(col("o_orderkey"),
          struct(col("o_orderdate"), col("o_orderkey"))).as("last_orderkey"))
        .orderBy("event_id")
  }

  /** Q16 registry anti/semi (J1/J2): completed = odd orderkeys,
    * failed = o_orderkey % 97 = 0 (FIXTURES.md §3). */
  val q16 = DQ("q16_registry_filter", Some(
    """WITH completed_registry AS
      |  (SELECT o_orderkey AS rel_key FROM orders WHERE o_orderkey % 2 = 1),
      |failed_registry AS
      |  (SELECT o_orderkey AS rel_key FROM orders WHERE o_orderkey % 97 = 0)
      |SELECT 'anti' AS part, count(*) AS n FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM completed_registry c WHERE c.rel_key = o.o_orderkey)
      |UNION ALL
      |SELECT 'semi' AS part, count(*) AS n FROM lineitem l
      |  WHERE EXISTS (SELECT 1 FROM failed_registry f WHERE f.rel_key = l.l_orderkey)
      |ORDER BY part""".stripMargin)) {
    (spark, dir) =>
      val orders = table(spark, dir, "orders")
      val lineitem = table(spark, dir, "lineitem")
      val completed = orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey").as("rel_key"))
      val failed = orders.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("rel_key"))
      val anti = orders.join(completed, orders("o_orderkey") === completed("rel_key"), "left_anti")
        .agg(count(lit(1)).as("n")).withColumn("part", lit("anti"))
      val semi = lineitem.join(failed, lineitem("l_orderkey") === failed("rel_key"), "left_semi")
        .agg(count(lit(1)).as("n")).withColumn("part", lit("semi"))
      anti.unionByName(semi).select("part", "n").orderBy("part")
  }

  /** Q17 set ops (J6/J7). */
  val q17 = DQ("q17_set_ops", Some(
    """WITH a AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0),
      |     b AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0)
      |SELECT 'except' AS op, count(*) AS n FROM (SELECT o_orderkey FROM a EXCEPT SELECT o_orderkey FROM b) t
      |UNION ALL
      |SELECT 'intersect' AS op, count(*) AS n FROM (SELECT o_orderkey FROM a INTERSECT SELECT o_orderkey FROM b) t
      |UNION ALL
      |SELECT 'union_all' AS op, count(*) AS n FROM (SELECT o_orderkey FROM a UNION ALL SELECT o_orderkey FROM b) t
      |ORDER BY op""".stripMargin)) {
    (spark, dir) =>
      val orders = table(spark, dir, "orders")
      val a = orders.filter(col("o_orderkey") % 3 === 0).select("o_orderkey")
      val b = orders.filter(col("o_orderkey") % 5 === 0).select("o_orderkey")
      val ex = a.except(b).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
      val in = a.intersect(b).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
      val un = a.unionByName(b).agg(count(lit(1)).as("n")).withColumn("op", lit("union_all"))
      ex.unionByName(in).unionByName(un).select("op", "n").orderBy("op")
  }

  /** Q18 aggregate breadth — TPC-H Q1 shape. */
  val q18 = DQ("q18_agg_breadth", Some(
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      |  round(sum(l_quantity), 6) AS sum_qty,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(min(l_extendedprice), 6) AS min_price,
      |  round(max(l_extendedprice), 6) AS max_price,
      |  round(stddev_samp(l_discount), 6) AS sd_disc,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |                 (1 - CAST(l_discount AS DECIMAL(4,2))) *
      |                 (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE), 6) AS revenue
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)) {
    (spark, dir) =>
      // spread before the partial aggregation: single-row-group input would
      // otherwise run the whole 600k-row partial agg (incl. the distinct
      // expand) on one core.
      spread(table(spark, dir, "lineitem")
          .select("l_returnflag", "l_linestatus", "l_orderkey", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          round(sum("l_quantity"), 6).as("sum_qty"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(min("l_extendedprice"), 6).as("min_price"),
          round(max("l_extendedprice"), 6).as("max_price"),
          round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          round(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
            * (lit(1) + rate(col("l_tax")))).cast("double"), 6).as("revenue"))
        .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q19 rollup with grouping() disambiguation. */
  val q19 = DQ("q19_rollup", Some(
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS INT) AS g1,
      |  CAST(grouping(l_linestatus) AS INT) AS g2,
      |  count(*) AS n, round(sum(l_quantity), 6) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g1"),
          grouping(col("l_linestatus")).cast("int").as("g2"),
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 6).as("sum_qty"))
        .orderBy(col("g1"), col("g2"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Q20 window functions: rank/dense_rank/lag/lead/moving sum. */
  val q20 = DQ("q20_window_funcs", Some(
    """SELECT o_custkey, o_orderkey,
      |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS INT) AS rnk,
      |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS INT) AS drnk,
      |  lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_key,
      |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_key,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS moving_sum
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)) {
    (spark, dir) =>
      val byDate = Window.partitionBy("o_custkey").orderBy("o_orderdate")
      val byDateKey = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val moving = byDateKey.rowsBetween(-3, Window.currentRow)
      table(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(byDate).cast("int").as("rnk"),
          dense_rank().over(byDate).cast("int").as("drnk"),
          lag("o_orderkey", 1).over(byDateKey).as("prev_key"),
          lead("o_orderkey", 1).over(byDateKey).as("next_key"),
          round(sum(money(col("o_totalprice"))).over(moving).cast("double"), 6).as("moving_sum"))
        .orderBy("o_custkey", "o_orderkey")
  }

  /** Q21a global top-k. */
  val q21t = DQ("q21_topk", Some(
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "orders").select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
  }

  /** Q21b per-group top-3 via window rank. */
  val q21g = DQ("q21_group_topk", Some(
    """WITH ranked AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
      |FROM ranked WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)) {
    (spark, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("int").as("rn"))
        .filter(col("rn") <= 3).orderBy("o_custkey", "rn")
  }

  /** Q22 registry lifecycle status counts (K5/G8 shape,
    * reference stream_handler_registries.py:19-51). */
  val q22 = DQ("q22_registry_lifecycle", Some(
    """SELECT CASE o_orderstatus WHEN 'F' THEN 'completed'
      |                          WHEN 'O' THEN 'in_progress'
      |                          ELSE 'failed' END AS status,
      |       count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY status""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "orders")
        .withColumn("status",
          when(col("o_orderstatus") === "F", "completed")
            .when(col("o_orderstatus") === "O", "in_progress")
            .otherwise("failed"))
        .groupBy("status").agg(count(lit(1)).as("n")).orderBy("status")
  }

  /** Q23 scalar-function sweep (§2.7 surface). */
  val q23 = DQ("q23_scalar_sweep", Some(
    """SELECT l_orderkey, l_linenumber,
      |  upper(l_returnflag) AS u, substring(l_linestatus, 1, 1) AS s,
      |  replace(l_returnflag, 'N', 'X') AS r,
      |  round(abs(l_discount - 0.05), 6) AS ad,
      |  CAST(floor(l_extendedprice / 100) AS BIGINT) AS fl,
      |  round(ln(l_extendedprice + 1), 6) AS lg,
      |  CAST(extract(year FROM l_shipdate) AS INT) AS yr,
      |  CAST(length(concat(l_returnflag, l_linestatus)) AS INT) AS len
      |FROM lineitem WHERE l_orderkey % 100 = 0
      |ORDER BY l_orderkey, l_linenumber, u, s, ad, fl, lg, yr""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "lineitem").filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          upper(col("l_returnflag")).as("u"),
          substring(col("l_linestatus"), 1, 1).as("s"),
          regexp_replace(col("l_returnflag"), "N", "X").as("r"),
          round(abs(col("l_discount") - 0.05), 6).as("ad"),
          floor(col("l_extendedprice") / 100).cast("bigint").as("fl"),
          round(log(col("l_extendedprice") + 1), 6).as("lg"),
          year(col("l_shipdate")).cast("int").as("yr"),
          length(concat(col("l_returnflag"), col("l_linestatus"))).cast("int").as("len"))
        .orderBy("l_orderkey", "l_linenumber", "u", "s", "ad", "fl", "lg", "yr")
  }

  /** Q24 date/time histogram. */
  val q24 = DQ("q24_date_histogram", Some(
    """SELECT CAST(ts AS DATE) AS day, CAST(extract(hour FROM ts) AS INT) AS hr,
      |       count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY day, hr""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), hour(col("ts")).cast("int").as("hr"))
        .agg(count(lit(1)).as("n"))
        .orderBy("day", "hr")
  }

  /** x16: event sessionization — the gaps-and-islands operator every
    * training-data pipeline needs (session = run of events per user with
    * inter-event gaps ≤ 30 min). Session id = running count of gap-breaks,
    * all integer arithmetic → engine-exact. */
  val x16 = DQ("x16_sessionize", Some(
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |gaps AS (
      |  SELECT user_id, event_id, us,
      |         CASE WHEN lag(us) OVER w IS NULL THEN 1
      |              WHEN us - lag(us) OVER w > 1800000000 THEN 1
      |              ELSE 0 END AS new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (
      |  SELECT user_id, event_id,
      |         CAST(sum(new_session) OVER (PARTITION BY user_id
      |                                     ORDER BY us, event_id
      |                                     ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
      |  FROM gaps),
      |per_session AS (
      |  SELECT user_id, session_id, count(*) AS n_events FROM sess
      |  GROUP BY user_id, session_id)
      |SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
      |       CAST(sum(n_events) AS BIGINT) AS n_events
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin)) {
    (spark, dir) =>
      val byTs = Window.partitionBy("user_id").orderBy("us", "event_id")
      val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(spark, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("new_session",
          when(lag("us", 1).over(byTs).isNull, 1)
            .when(col("us") - lag("us", 1).over(byTs) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum("new_session").over(cum).cast("int"))
        .groupBy("user_id", "session_id").agg(count(lit(1)).as("n_events"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max("n_events").as("max_session_events"),
          sum("n_events").cast("bigint").as("n_events"))
        .orderBy("user_id")
  }

  /** x17: exact percentiles per group (Spark `percentile` and DuckDB
    * `quantile_cont` share the linear-interpolation definition; rounded to
    * 6 dp; at 100 TB the swap is percentile_approx, noted in SCALE.md). */
  val x17 = DQ("x17_percentiles", Some(
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)) {
    (spark, dir) =>
      // Round 16 (guide §1.2 step 2 / §4): `percentile()` aggregates
      // through an interpreted ObjectHashAggregate whose per-(group,
      // partition) state is an OpenHashMap of EVERY distinct value,
      // built twice (one buffer per requested percentile), serialized
      // whole through the exchange and merged per group on one core —
      // the values are near-unique, so "partial" aggregation reduced
      // nothing and the query anti-scaled (driver r15: 2.2 s at 32
      // cores, 0.7 s at 8). Equivalent whole-stage-codegen plan via
      // Joins.exactPercentiles: range-partitioned parallel ranking over
      // (group, value), within-group rank from broadcast group offsets,
      // and the two order statistics per percentile interpolate with
      // the EXACT formula of Spark's Percentile.getPercentile
      // ((higher-pos)*lo + (pos-lower)*hi, lo when the indices
      // coincide) — value-at-rank is deterministic under ties because
      // tied rows hold equal values, so the declared result is
      // bit-identical (JoinsSpec pins it).
      graft.batch.Joins.exactPercentiles(
          table(spark, dir, "orders")
            .select("o_orderpriority", "o_totalprice"),
          "o_orderpriority", "o_totalprice", Seq(0.5, 0.9))
        .select(col("o_orderpriority"),
          round(col("_ep_p0"), 6).as("p50"),
          round(col("_ep_p1"), 6).as("p90"),
          col("_ep_n").as("n"))
        .orderBy("o_orderpriority")
  }

  /** x18: CUBE grouping sets (all four grouping combinations, vs Q19's
    * rollup prefix sets). */
  val x18 = DQ("x18_cube", Some(
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS INT) AS g1,
      |  CAST(grouping(l_linestatus) AS INT) AS g2,
      |  count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast("int").as("g1"),
          grouping(col("l_linestatus")).cast("int").as("g2"),
          count(lit(1)).as("n"))
        .orderBy(col("g1"), col("g2"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** x19: array-function sweep (Q23's deferred array leg): array_agg with
    * distinct/sort/slice caps, joined to strings for engine-neutral output. */
  val x19 = DQ("x19_array_sweep", Some(
    """SELECT l_returnflag,
      |  CAST(len(list_distinct(array_agg(l_linestatus))) AS INT) AS n_status,
      |  array_to_string(list_sort(list_distinct(array_agg(l_linestatus))), ',') AS statuses,
      |  array_to_string(list_sort(list_distinct(array_agg(l_orderkey)))[1:5], ',') AS first_keys
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          size(array_distinct(collect_list(col("l_linestatus")))).cast("int").as("n_status"),
          array_join(sort_array(array_distinct(collect_list(col("l_linestatus")))), ",")
            .as("statuses"),
          array_join(transform(
            slice(sort_array(array_distinct(collect_list(col("l_orderkey")))), 1, 5),
            x => x.cast("string")), ",").as("first_keys"))
        .orderBy("l_returnflag")
  }

  /** x20: pivot / conditional aggregation (status counts spread to columns). */
  val x20 = DQ("x20_pivot", Some(
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .withColumnRenamed("F", "n_f")
        .withColumnRenamed("O", "n_o")
        .withColumnRenamed("P", "n_p")
        .orderBy("o_orderpriority")
  }

  /** x21: variable-width interval-overlap join — the general
    * [[graft.batch.Joins.rangeJoinBinned]] path (q15_range_join's intervals
    * are bin-aligned; these are 1–7 min wide starting at arbitrary
    * timestamps, so each interval explodes into 1–5 of the 2-minute bins).
    * Anchors = every 101st event; probe = all events. */
  val x21 = DQ("x21_interval_overlap", Some(
    """WITH anchors AS (
      |  SELECT event_id AS anchor_id, ts AS astart,
      |         ts + to_minutes(CAST(event_id % 7 + 1 AS BIGINT)) AS aend
      |  FROM events WHERE event_id % 101 = 0)
      |SELECT anchor_id, count(*) AS n
      |FROM events e JOIN anchors a ON e.ts >= a.astart AND e.ts < a.aend
      |GROUP BY anchor_id ORDER BY anchor_id""".stripMargin)) {
    (spark, dir) =>
      val events = table(spark, dir, "events")
      val anchors = events.filter(col("event_id") % 101 === 0)
        .select(col("event_id").as("anchor_id"), col("ts").as("astart"),
          (col("ts") + make_dt_interval(
            lit(0), lit(0), col("event_id") % 7 + 1, lit(0))).as("aend"))
      graft.batch.Joins.rangeJoinBinned(
          spread(events.select(col("ts"))), "ts", anchors, "astart", "aend",
          binSeconds = 120L)
        .groupBy("anchor_id").agg(count(lit(1)).as("n"))
        .orderBy("anchor_id")
  }

  /** x24: sketch-based approximate statistics — the operators that replace
    * their exact counterparts at 100 TB: HyperLogLog++ distinct counts
    * (fixed-size sketch, map-side mergeable — vs q18's exact countDistinct
    * expand) and Greenwald-Khanna approximate percentiles (bounded state —
    * vs x17's exact sort-based percentiles). Raw sketch values are
    * engine-specific (no DuckDB equivalent), so the DECLARED query is the
    * accuracy AUDIT (x43's pattern for MinHash): each estimate is checked
    * in-engine against its exact counterpart — HLL++ within 5% relative
    * error (rsd 0.02 → 2^12 registers, measured 0.8 s vs 2.1 s at rsd
    * 0.01), GK checked via the RANK of its returned value (conditional
    * ≤/< counts against the broadcast estimate must bracket q·n within
    * the guarantee's 0.002·n plus slack — O(1) agg state; an exact
    * `percentile` over l_extendedprice's ~full-cardinality doubles
    * hash-maps every distinct value per partial and measured 65 s at
    * sf0.1, so value-bracket checking is the wrong audit at ANY scale)
    * and exact distinct via a two-level agg (no distinct-expand). The
    * oracle pins the exact group counts plus all-TRUE verdicts. The
    * production path at 100 TB is the sketch aggregation alone; the audit
    * branches are map-side-combining longs. */
  val x24 = DQ("x24_approx_stats", Some(
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |       TRUE AS nd_ok, TRUE AS p50_ok, TRUE AS p90_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) {
    (spark, dir) =>
      val li = table(spark, dir, "lineitem")
        .select("l_returnflag", "l_orderkey", "l_quantity", "l_extendedprice")
      // spread: the HLL++/GK partial aggregation is the CPU; a
      // single-row-group scan would build every sketch on one core.
      val est = spread(li)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("nd_est"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(500)).as("p50_est"),
          percentile_approx(col("l_extendedprice"), lit(0.9), lit(500)).as("p90_est"))
      // exact distinct WITHOUT the distinct-expand plan: two map-side-
      // combining aggs (pairs collapse before the exchange)
      val nd = li.groupBy("l_returnflag", "l_orderkey").agg(count(lit(1)))
        .groupBy("l_returnflag").agg(count(lit(1)).as("nd_exact"))
      // GK rank audit: the estimate's rank interval (n_lt, n_le] must
      // intersect q·n within the 0.002·n guarantee (+0.010 slack)
      val audit = li.join(broadcast(est), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_quantity") <= col("p50_est"), 1L).otherwise(0L)).as("le_p50"),
          sum(when(col("l_quantity") < col("p50_est"), 1L).otherwise(0L)).as("lt_p50"),
          sum(when(col("l_extendedprice") <= col("p90_est"), 1L).otherwise(0L)).as("le_p90"),
          sum(when(col("l_extendedprice") < col("p90_est"), 1L).otherwise(0L)).as("lt_p90"),
          first(col("nd_est")).as("nd_est"))
      audit.join(broadcast(nd), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"),
          (abs(col("nd_est").cast("double") / col("nd_exact") - 1.0) <= 0.05).as("nd_ok"),
          (col("le_p50") >= col("n") * 0.488 && col("lt_p50") <= col("n") * 0.512).as("p50_ok"),
          (col("le_p90") >= col("n") * 0.888 && col("lt_p90") <= col("n") * 0.912).as("p90_ok"))
        .orderBy("l_returnflag")
  }

  /** x25: time-RANGE window frames — per-user rolling 10-minute event count
    * (velocity / rate-limit shape) plus inter-event gap. The frame is
    * value-based (micros since epoch), so tied timestamps are peers and the
    * result is deterministic without a row tiebreak; the gap uses a
    * row-ordered window with (ts, event_id) for a total order. */
  val x25 = DQ("x25_window_range", Some(
    """SELECT user_id, event_id,
      |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |         RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n10m,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |         ORDER BY ts, event_id) AS gap_us
      |FROM events ORDER BY user_id, event_id""".stripMargin)) {
    (spark, dir) =>
      val e = table(spark, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
      val wRange = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-600000000L, Window.currentRow)
      val wRow = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      e.select(col("user_id"), col("event_id"),
          count(lit(1)).over(wRange).as("n10m"),
          (col("ts_us") - lag(col("ts_us"), 1).over(wRow)).as("gap_us"))
        .orderBy("user_id", "event_id")
  }

  /** x33: native session windows — the same 30-minute-gap sessionization as
    * x16, but via Spark's built-in `session_window` aggregation (the
    * Structured-Streaming session operator run in batch: one hash exchange
    * by user, in-partition window merge — no gaps-and-islands double window
    * pass, and the identical code runs over `readStream` with a watermark).
    * The oracle reproduces the native semantics manually: a gap of EXACTLY
    * the threshold starts a new session ([ts, ts+gap) intervals must
    * overlap to merge), and session end = last event + gap. Epoch-micro
    * BIGINTs keep the comparison engine-neutral. */
  val x33 = DQ("x33_session_window", Some(
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |gaps AS (
      |  SELECT user_id, us,
      |         CASE WHEN lag(us) OVER w IS NULL THEN 1
      |              WHEN us - lag(us) OVER w >= 1800000000 THEN 1
      |              ELSE 0 END AS new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (
      |  SELECT user_id, us,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY us
      |                                ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM gaps)
      |SELECT user_id, min(us) AS sess_start_us,
      |       max(us) + 1800000000 AS sess_end_us,
      |       count(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, sess_start_us""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("sess_start_us"),
          unix_micros(col("sw.end")).as("sess_end_us"),
          col("n_events"))
        .orderBy("user_id", "sess_start_us")
  }

  /** x34: as-of join with TOLERANCE (pandas merge_asof's bounded-staleness
    * variant of q15a): latest order at-or-before each event, but only if it
    * is within the tolerance — stale matches drop instead of joining. Same
    * argmax shape as q15a (equi-join on custkey + range residual feeding a
    * map-side-combining max_by); the tolerance is one more residual
    * predicate, so the plan is identical and the bound caps the candidate
    * fan-in per event at scale. (Tolerance = 8400 days: the fixture's
    * orders end in 2001 and its events run in 2024, so nearest-order
    * staleness spans 8190–9799 days; 8400 keeps roughly half — a 90-day
    * tolerance would keep nothing.) */
  val x34 = DQ("x34_asof_tolerance", Some(
    """WITH pairs AS (
      |  SELECT e.event_id, o.o_orderkey,
      |         date_diff('day', o.o_orderdate, CAST(e.ts AS DATE)) AS staleness_days,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON o.o_custkey = e.user_id
      |   AND o.o_orderdate <= e.ts
      |   AND o.o_orderdate >= e.ts - INTERVAL 8400 DAY)
      |SELECT event_id, o_orderkey AS last_orderkey,
      |       CAST(staleness_days AS BIGINT) AS staleness_days
      |FROM pairs WHERE rn = 1 ORDER BY event_id""".stripMargin)) {
    (spark, dir) =>
      // spread: same single-row-group rationale as q15_asof_join.
      spread(table(spark, dir, "events").select("event_id", "user_id", "ts"))
        .join(table(spark, dir, "orders"),
          col("o_custkey") === col("user_id")
            && col("o_orderdate") <= col("ts")
            && col("o_orderdate") >= col("ts") - expr("INTERVAL 8400 DAY"))
        .groupBy("event_id")
        .agg(max_by(
          struct(col("o_orderkey"),
            datediff(col("ts").cast("date"), col("o_orderdate")).cast("bigint")
              .as("staleness_days")),
          struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
        .select(col("event_id"), col("m.o_orderkey").as("last_orderkey"),
          col("m.staleness_days").as("staleness_days"))
        .orderBy("event_id")
  }

  /** x56: bivariate aggregates — corr / covar / least-squares fit of price
    * on quantity (the feature-correlation audit a curation pass runs before
    * trusting a quality signal). Computed over the l_orderkey % 100 slice
    * (bounded accumulation keeps the 4-dp rounding engine-stable; both
    * engines use numerically-stable single-pass merges). Partial-merging
    * hash agg — the same fixed-size-state shape as sum/avg, so it scales
    * like q18, not like a sort. */
  val x56 = DQ("x56_regr_corr", Some(
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 4) AS r,
      |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov,
      |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem WHERE l_orderkey % 100 = 0
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "lineitem").filter(col("l_orderkey") % 100 === 0)
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("r"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("icept"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
  }

  /** x57: navigation window functions (q20's deferred leg): first/last/nth
    * value over the per-customer full frame, plus percent_rank/cume_dist
    * (frame-less rank functions). The (o_orderdate, o_orderkey) ordering is
    * a total order per partition, so every value is deterministic; explicit
    * UNBOUNDED..UNBOUNDED frames make first/last/nth engine-identical. */
  val x57 = DQ("x57_window_nav", Some(
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER wf AS first_key,
      |  last_value(o_orderkey) OVER wf AS last_key,
      |  nth_value(o_orderkey, 2) OVER wf AS second_key,
      |  round(percent_rank() OVER wo, 6) AS prk,
      |  round(cume_dist() OVER wo, 6) AS cd
      |FROM orders
      |WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin)) {
    (spark, dir) =>
      val wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wf = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      table(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first("o_orderkey").over(wf).as("first_key"),
          last("o_orderkey").over(wf).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(wf).as("second_key"),
          round(percent_rank().over(wo), 6).as("prk"),
          round(cume_dist().over(wo), 6).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
  }

  /** x58: JSON field extraction — `events.props` is a JSON string (the
    * reference's metadata-JSON messages, metadata_json_reproducer.py shape);
    * parse out `k` and aggregate. Per-row `get_json_object` inside the scan
    * stage (codegen'd path extraction, no UDF), integer sums → engine-exact.
    * At 100 TB the parse cost is the scan stage's CPU and nothing else
    * changes: the exchange still carries only (event_type, partial sums). */
  val x58 = DQ("x58_json_props", Some(
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)) {
    (spark, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("bigint")
      table(spark, dir, "events")
        .select(col("event_type"), k.as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
  }

  /** x62: bitwise-operator sweep (the §2.7 leg behind every hash/partition/
    * signature trick in the engine: band masks, bucket ids, SimHash
    * distances). Integer-only → engine-exact; in-row, no shuffle. */
  val x62 = DQ("x62_bitwise", Some(
    """SELECT event_id,
      |  CAST(event_id & 255 AS BIGINT) AS b_and,
      |  CAST(event_id | 4096 AS BIGINT) AS b_or,
      |  CAST(xor(event_id, 1365) AS BIGINT) AS b_xor,
      |  CAST(event_id << 3 AS BIGINT) AS shl,
      |  CAST(event_id >> 2 AS BIGINT) AS shr,
      |  CAST(bit_count(event_id) AS INT) AS pc
      |FROM events WHERE event_id % 37 = 0 ORDER BY event_id""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "events").filter(col("event_id") % 37 === 0)
        .select(col("event_id"),
          col("event_id").bitwiseAND(255).as("b_and"),
          col("event_id").bitwiseOR(4096).as("b_or"),
          col("event_id").bitwiseXOR(1365).as("b_xor"),
          shiftleft(col("event_id"), 3).as("shl"),
          shiftright(col("event_id"), 2).as("shr"),
          bit_count(col("event_id")).cast("int").as("pc"))
        .orderBy("event_id")
  }

  /** x64: explicit GROUPING SETS (the general form behind Q19's rollup and
    * x18's cube — here a set NEITHER can express: both one-dimension
    * margins, no grand total, no detail-free pair). Single expand +
    * hash agg, same scale shape as rollup. */
  val x64 = DQ("x64_grouping_sets", Some(
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) AS INT) AS g1,
      |  CAST(grouping(l_linestatus) AS INT) AS g2,
      |  count(*) AS n, round(sum(l_quantity), 6) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "lineitem")
        .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g1"),
          grouping(col("l_linestatus")).cast("int").as("g2"),
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 6).as("sum_qty"))
        .orderBy(col("g1"), col("g2"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** x65: calendar gap-fill + forward fill — the time-series densification
    * every monitoring/heartbeat rollup needs (G6's windows skip empty
    * intervals; this materializes them): a generated hourly calendar
    * (global bounds — two-row agg, broadcast) crossed with the observed
    * event types, left-joined to the hourly aggregates; missing hours take
    * n=0 and carry the last observed sum forward via `last(..., ignore
    * nulls)` over a rows frame. One window per type partition; the
    * calendar join is broadcast, so the fact side never reshuffles for
    * densification. */
  val x65 = DQ("x65_gap_fill", Some(
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
      |         sum(CAST(value AS DECIMAL(12,2))) AS s
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      |      FROM events),
      |cal AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
      |grid AS (SELECT t.event_type, c.h
      |         FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN cal c)
      |SELECT g.event_type, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
      |  CAST(coalesce(hy.n, 0) AS BIGINT) AS n,
      |  round(CAST(last_value(hy.s IGNORE NULLS)
      |        OVER (PARTITION BY g.event_type ORDER BY g.h
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
      |    AS ffill_sum
      |FROM grid g LEFT JOIN hourly hy ON hy.event_type = g.event_type AND hy.h = g.h
      |ORDER BY 1, 2""".stripMargin)) {
    (spark, dir) =>
      val e = table(spark, dir, "events")
      val hourly = e.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"), sum(money(col("value"))).as("s"))
      val cal = e.agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      val grid = e.select("event_type").distinct().crossJoin(broadcast(cal))
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          coalesce(col("n"), lit(0L)).as("n"),
          round(last(col("s"), ignoreNulls = true).over(w).cast("double"), 6)
            .as("ffill_sum"))
        .orderBy("event_type", "hour")
  }

  /** x100: linear-interpolation gap fill — x65's densified hourly grid with
    * gaps INTERPOLATED between the surrounding observations instead of
    * carried forward (the time-series resample a sensor/metrics consumer
    * runs; x65's ffill is the step-function variant). Two frames over the
    * same event_type exchange find the bracketing observations (last
    * non-null behind, first ahead — each carrying its hour), then the
    * interpolation is pure row math: pv + (nv−pv)·(h−ph)/(nh−ph), edges
    * clamp to the nearest observation. All arithmetic is pinned to DOUBLE
    * on both engines (the hourly means are rounded DECIMAL first, so the
    * doubles start identical and the expression trees match op-for-op).
    * One exchange, two sorts sharing it; the grid is x65's broadcast
    * calendar — the fact table never reshuffles to densify. */
  val x100 = DQ("x100_interp_fill", Some(
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |         CAST(round(avg(CAST(value AS DECIMAL(12,2))), 6) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      |      FROM events),
      |cal AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
      |grid AS (SELECT t.event_type, c.h
      |         FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN cal c),
      |j AS (SELECT g.event_type, CAST(epoch(g.h) AS BIGINT) AS hs, hy.v
      |      FROM grid g LEFT JOIN hourly hy ON hy.event_type = g.event_type AND hy.h = g.h),
      |ctx AS (
      |  SELECT event_type, hs, v,
      |    last_value(v IGNORE NULLS) OVER wb AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN hs END IGNORE NULLS) OVER wb AS ph,
      |    first_value(v IGNORE NULLS) OVER wf AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN hs END IGNORE NULLS) OVER wf AS nh
      |  FROM j
      |  WINDOW wb AS (PARTITION BY event_type ORDER BY hs
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wf AS (PARTITION BY event_type ORDER BY hs
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_type, hs,
      |  round(CASE
      |    WHEN v IS NOT NULL THEN v
      |    WHEN pv IS NULL THEN nv
      |    WHEN nv IS NULL THEN pv
      |    ELSE pv + (nv - pv) * (hs - ph) / (nh - ph)
      |  END, 6) AS v_interp,
      |  (v IS NULL) AS was_gap
      |FROM ctx ORDER BY event_type, hs""".stripMargin)) {
    (spark, dir) =>
      val e = table(spark, dir, "events")
      val hourly = e.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(round(avg(money(col("value"))), 6).cast("double").as("v"))
      val cal = e.agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
      val grid = e.select("event_type").distinct().crossJoin(broadcast(cal))
      val j = grid.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"), unix_timestamp(col("h")).as("hs"), col("v"))
      val wb = Window.partitionBy("event_type").orderBy("hs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("event_type").orderBy("hs")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val hsWhenV = when(col("v").isNotNull, col("hs"))
      val pv = last(col("v"), ignoreNulls = true).over(wb)
      val ph = last(hsWhenV, ignoreNulls = true).over(wb)
      val nv = first(col("v"), ignoreNulls = true).over(wf)
      val nh = first(hsWhenV, ignoreNulls = true).over(wf)
      j.select(col("event_type"), col("hs"), col("v"),
          pv.as("pv"), ph.as("ph"), nv.as("nv"), nh.as("nh"))
        .select(col("event_type"), col("hs"),
          round(when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("hs") - col("ph")) / (col("nh") - col("ph"))), 6)
            .as("v_interp"),
          col("v").isNull.as("was_gap"))
        .orderBy("event_type", "hs")
  }

  /** x66: date-function sweep (q23/x61's calendar leg — the §2.7 surface
    * behind retention windows, partition keys, and freshness checks).
    * Engine deltas handled explicitly: Spark `dayofweek` is 1-based
    * (Sunday=1), DuckDB's is 0-based — aligned by `-1`; everything else
    * (ISO weekofyear, clamped add_months, Monday-start week trunc) agrees.
    * Pure per-row projection. */
  val x66 = DQ("x66_date_sweep", Some(
    """SELECT o_orderkey,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
      |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
      |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
      |  last_day(o_orderdate) AS eom,
      |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  CAST(date_diff('day', o_orderdate, DATE '1998-12-31') AS INT) AS days_to_end,
      |  CAST(date_trunc('week', o_orderdate) AS DATE) AS wk
      |FROM orders WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "orders").filter(col("o_orderkey") % 500 === 0)
        .select(col("o_orderkey"),
          quarter(col("o_orderdate")).cast("int").as("qtr"),
          dayofyear(col("o_orderdate")).cast("int").as("doy"),
          (dayofweek(col("o_orderdate")) - 1).cast("int").as("dow"),
          weekofyear(col("o_orderdate")).cast("int").as("woy"),
          last_day(col("o_orderdate")).as("eom"),
          add_months(col("o_orderdate"), 3).as("plus3m"),
          datediff(lit(java.sql.Date.valueOf("1998-12-31")), col("o_orderdate"))
            .cast("int").as("days_to_end"),
          date_trunc("week", col("o_orderdate")).cast("date").as("wk"))
        .orderBy("o_orderkey")
  }

  /** x67: FULL OUTER join — the two-registry reconciliation the reference
    * never does but operators always need: the producer-side completed set
    * vs the consumer-side succeeded set (producer_file_registry.py vs
    * stream_handler_registries.py keep these in separate CSVs with no
    * cross-check). Each key lands in exactly one of both/producer_only/
    * consumer_only. Shuffled sort-merge full-outer on the key — at 100 TB
    * both registries hash-partition on the same key, one exchange each,
    * no broadcast needed and none possible (both sides large). */
  val x67 = DQ("x67_full_outer", Some(
    """WITH prod AS (SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'),
      |     cons AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT CASE WHEN p.k IS NOT NULL AND c.k IS NOT NULL THEN 'both'
      |            WHEN p.k IS NOT NULL THEN 'producer_only'
      |            ELSE 'consumer_only' END AS side,
      |       count(*) AS n, CAST(min(coalesce(p.k, c.k)) AS BIGINT) AS min_key,
      |       CAST(max(coalesce(p.k, c.k)) AS BIGINT) AS max_key
      |FROM prod p FULL OUTER JOIN cons c ON p.k = c.k
      |GROUP BY side ORDER BY side""".stripMargin)) {
    (spark, dir) =>
      val orders = table(spark, dir, "orders")
      val prod = orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("pk"))
      val cons = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("ck"))
      prod.join(cons, col("pk") === col("ck"), "full_outer")
        .select(
          when(col("pk").isNotNull && col("ck").isNotNull, "both")
            .when(col("pk").isNotNull, "producer_only")
            .otherwise("consumer_only").as("side"),
          coalesce(col("pk"), col("ck")).as("k"))
        .groupBy("side")
        .agg(count(lit(1)).as("n"),
          min("k").cast("bigint").as("min_key"),
          max("k").cast("bigint").as("max_key"))
        .orderBy("side")
  }

  /** x68: fixed-width histogram via `width_bucket` — the size/price
    * distribution profile a curation pass reads before picking filter
    * thresholds (the continuous sibling of x41's ntile deciles). Spark's
    * native width_bucket; the oracle mirrors the same IEEE arithmetic
    * explicitly (floor((v-lo)/step)+1, clamped) — bounds 0..600000 over 12
    * buckets give an exactly-representable 50000 step, so the division is
    * bit-identical in both engines. Map-side-combining hash agg on a
    * 14-value key: the scale shape of a histogram is a broadcast-sized
    * result off one scan. */
  val x68 = DQ("x68_histogram", Some(
    """SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
      |            WHEN o_totalprice >= 600000 THEN 13
      |            ELSE CAST(floor(o_totalprice / 50000.0) AS INT) + 1 END AS INT) AS bucket,
      |       count(*) AS n,
      |       round(min(o_totalprice), 2) AS lo,
      |       round(max(o_totalprice), 2) AS hi
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "orders")
        .select(width_bucket(col("o_totalprice"), lit(0d), lit(600000d), lit(12L))
          .cast("int").as("bucket"), col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(min("o_totalprice"), 2).as("lo"),
          round(max("o_totalprice"), 2).as("hi"))
        .orderBy("bucket")
  }

  /** x69: correlated scalar subquery — customers above their nation's mean
    * balance (the per-stratum outlier gate, phrased the way an analyst
    * writes it). Run through `spark.sql` so Catalyst's subquery
    * decorrelation actually executes: both correlated scalars rewrite to
    * ONE per-nation aggregate joined back (25 rows, broadcast) — the same
    * physical plan the hand-decorrelated DataFrame version would build,
    * which is why the shape survives 100 TB. Exact math: the comparison is
    * `balance * n > sum` in DECIMAL, so no float mean crosses an
    * inequality boundary differently per engine. */
  val x69 = DQ("x69_correlated_sub", Some(
    """SELECT c.c_nationkey, count(*) AS n_above
      |FROM customer c
      |WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) *
      |      (SELECT count(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |      > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(12,2)))
      |         FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin)) {
    (spark, dir) =>
      table(spark, dir, "customer").createOrReplaceTempView("customer")
      spark.sql(
        """SELECT c.c_nationkey, count(*) AS n_above
          |FROM customer c
          |WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) *
          |      (SELECT count(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          |      > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(12,2)))
          |         FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin)
  }

  /** x70: error-tolerant casts (`try_cast` / null-safe divide) — the
    * dirty-data salvage pass every ingest runs: parse what parses, null the
    * rest, never fail the task (the engine-level form of the reference's
    * route-bad-rows-to-dead-letter posture, serialization.py:244-253).
    * Min/max of the salvaged doubles (order-independent) instead of a float
    * sum keeps the comparison engine-exact. Pure per-row projection +
    * 3-key hash agg. */
  val x70 = DQ("x70_try_cast", Some(
    """SELECT lang, count(*) AS n,
      |  CAST(count(try_cast(substring(source, 4) AS INT)) AS BIGINT) AS n_id_ok,
      |  CAST(count(try_cast(substring(text, 1, 2) AS INT)) AS BIGINT) AS n_tok_num,
      |  round(min(CAST(n_chars AS DOUBLE) /
      |            nullif(try_cast(substring(source, 4) AS INT) % 10, 0)), 6) AS min_ratio,
      |  round(max(CAST(n_chars AS DOUBLE) /
      |            nullif(try_cast(substring(source, 4) AS INT) % 10, 0)), 6) AS max_ratio
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)) {
    (spark, dir) =>
      val idNum = expr("try_cast(substring(source, 4) AS INT)")
      val ratio = col("n_chars").cast("double") /
        nullif(idNum % 10, lit(0))
      table(spark, dir, "documents")
        .select(col("lang"),
          idNum.as("id_num"),
          expr("try_cast(substring(text, 1, 2) AS INT)").as("tok_num"),
          ratio.as("ratio"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          count(col("id_num")).as("n_id_ok"),
          count(col("tok_num")).as("n_tok_num"),
          round(min("ratio"), 6).as("min_ratio"),
          round(max("ratio"), 6).as("max_ratio"))
        .orderBy("lang")
  }

  /** x71: Z-order (Morton) interleave as a layout key — the
    * multi-dimensional clustering trick behind Delta/Iceberg OPTIMIZE
    * ZORDER: interleave the bits of two dimensions so one range partition
    * of the key is a locality square in (a, b) space, and min/max column
    * stats prune BOTH dimensions at scan time. Classic
    * shift-or-mask bit spreading (exactly the public parallel-bits trick),
    * integer-only → engine-exact; at 100 TB the key feeds
    * `repartitionByRange(zkey).sortWithinPartitions(zkey)` before the
    * parquet write. Bucketed counts verify the interleave. */
  val x71 = DQ("x71_zorder", {
    def spreadSql(v: String): String = {
      val s1 = s"(($v | ($v << 4)) & 3855)" // 0x0F0F
      val s2 = s"(($s1 | ($s1 << 2)) & 13107)" // 0x3333
      s"(($s2 | ($s2 << 1)) & 21845)" // 0x5555
    }
    val za = spreadSql("(event_id & 255)")
    val zb = spreadSql("(user_id & 255)")
    Some(
      s"""WITH z AS (
         |  SELECT ($za | ($zb << 1)) AS zkey FROM events)
         |SELECT CAST(zkey >> 10 AS BIGINT) AS zbucket, count(*) AS n,
         |  CAST(min(zkey) AS BIGINT) AS zmin, CAST(max(zkey) AS BIGINT) AS zmax
         |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin)
  }) {
    (spark, dir) =>
      def spreadBits(c: Column): Column = {
        val s1 = (c.bitwiseOR(shiftleft(c, 4))).bitwiseAND(lit(0x0F0F))
        val s2 = (s1.bitwiseOR(shiftleft(s1, 2))).bitwiseAND(lit(0x3333))
        (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x5555))
      }
      val zkey = spreadBits(col("event_id").bitwiseAND(lit(255)))
        .bitwiseOR(shiftleft(spreadBits(col("user_id").bitwiseAND(lit(255))), 1))
      table(spark, dir, "events")
        .select(zkey.as("zkey"))
        .groupBy(shiftright(col("zkey"), 10).cast("bigint").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min("zkey").cast("bigint").as("zmin"),
          max("zkey").cast("bigint").as("zmax"))
        .orderBy("zbucket")
  }

  /** x206: HOURLY BURST DETECTION — the traffic-anomaly flag an ingest
    * pipeline runs per tenant: a user's hour is a burst when its event
    * count sits more than 3 population-σ above that user's own hourly
    * mean. The test is computed WITHOUT sqrt or division —
    * (x·n − s)² > 9·(n·ss − s²) is the z² > 9 inequality scaled by n², all
    * BIGINT, so Spark and DuckDB agree bit-for-bit where a float z-score
    * would drift. Two aggregations (hour rollup, then per-user moments)
    * and one equi-join back on user_id; everything combines map-side. */
  val x206 = DQ("x206_burst_hours", Some(
    """WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(cnt) AS BIGINT) AS s, CAST(sum(cnt * cnt) AS BIGINT) AS ss
      |  FROM h GROUP BY 1),
      |f AS (SELECT h.user_id, h.hr, h.cnt, s.n,
      |    (h.cnt * s.n - s.s) > 0 AND
      |    (h.cnt * s.n - s.s) * (h.cnt * s.n - s.s)
      |      > 9 * (s.n * s.ss - s.s * s.s) AS burst
      |  FROM h JOIN s ON h.user_id = s.user_id)
      |SELECT user_id, CAST(max(n) AS BIGINT) AS n_hours,
      |  CAST(sum(cnt) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN burst THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
      |  CAST(min(CASE WHEN burst THEN hr END) AS BIGINT) AS first_burst_hr
      |FROM f GROUP BY user_id
      |HAVING sum(CASE WHEN burst THEN 1 ELSE 0 END) > 0
      |ORDER BY user_id""".stripMargin)) {
    (spark, dir) =>
      val h = table(spark, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), expr("us div 3600000000").as("hr"))
        .groupBy("user_id", "hr").agg(count(lit(1)).as("cnt"))
      val s = h.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("cnt").as("s"),
          sum(col("cnt") * col("cnt")).as("ss"))
      h.join(s, "user_id")
        .withColumn("dev", col("cnt") * col("n") - col("s"))
        .withColumn("burst", col("dev") > 0 &&
          col("dev") * col("dev") >
            lit(9L) * (col("n") * col("ss") - col("s") * col("s")))
        .groupBy("user_id")
        .agg(max("n").as("n_hours"), sum("cnt").as("n_events"),
          sum(when(col("burst"), 1L).otherwise(0L)).as("n_bursts"),
          min(when(col("burst"), col("hr"))).as("first_burst_hr"))
        .filter(col("n_bursts") > 0)
        .orderBy("user_id")
  }

  /** x220: K-ANONYMITY AUDIT — the privacy sibling of x115's PII scrub:
    * before an events table ships with a corpus, every quasi-identifier
    * combination (cohort × event type × hour-of-day here) must hide each
    * row among ≥ k peers; groups below k are re-identification risks. The
    * audit reports, per event type, how many QI groups violate k=5 and
    * how many ROWS sit exposed in them — the number a release review
    * acts on (suppress or generalize those cells). Two rollups, both
    * map-side-combinable; integer ppm. */
  val x220 = DQ("x220_k_anonymity", Some(
    """WITH g AS (SELECT event_type, user_id % 100 AS cohort,
      |    epoch_us(ts) // 3600000000 % 24 AS hod,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating,
      |  CAST(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) AS BIGINT)
      |    AS rows_at_risk,
      |  CAST(coalesce(sum(CASE WHEN n < 5 THEN n END), 0) * 1000000
      |    // sum(n) AS BIGINT) AS risk_ppm
      |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin)) {
    (spark, dir) =>
      val g = table(spark, dir, "events")
        .withColumn("us", unix_micros(col("ts")))
        .select(col("event_type"), (col("user_id") % 100).as("cohort"),
          expr("us div 3600000000 % 24").as("hod"))
        .groupBy("event_type", "cohort", "hod")
        .agg(count(lit(1)).as("n"))
      g.groupBy("event_type")
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_violating"),
          coalesce(sum(when(col("n") < 5, col("n"))), lit(0L))
            .as("rows_at_risk"),
          expr("coalesce(sum(CASE WHEN n < 5 THEN n END), 0) * 1000000" +
            " div sum(n)").as("risk_ppm"))
        .orderBy("event_type")
  }

  val all: Seq[DQ] = Seq(q01, q03, q08, q11, q12, q13, q14, q15r, q15a,
    q16, q17, q18, q19, q20, q21t, q21g, q22, q23, q24, x16, x17, x18, x19, x20,
    x21, x24, x25, x33, x34, x56, x57, x58, x62, x64, x65, x66, x67, x68, x69,
    x70, x71, x100, x206, x220)
}
