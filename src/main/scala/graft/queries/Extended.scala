package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dims.Dims
import graft.sources.Sources
import graft.queries.Relational.{Q, decStr}

/** Warehouse-style queries beyond the minimal operator inventory: deep join
  * trees, CUBE grouping sets, correlated subqueries, capped generators. */
object Extended {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Sources.table(s, dir, name)

  private val dec = DecimalType(38, 4)

  val all: Seq[Q] = Seq(

    // Deep join tree (fact -> orders -> customer -> nation -> region) with
    // aggregation: exercises Catalyst join reordering. nation/region
    // broadcast (explicitly); orders and customer are fact-scale at 100x so
    // they correctly stay sort-merge — the two fact-side shuffles are the
    // genuine cost of this shape, not a planning miss.
    Q("q46_deep_join_tree",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = broadcast(t(s, dir, "nation"))
        val r = broadcast(t(s, dir, "region"))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_lines"),
            decStr(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec)))
              .as("revenue"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS n_lines,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS VARCHAR) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin)),

    // L1 faithful: the reference's [:10] date-dim cap (ET:184, bug #9) as a
    // first-class parameter — deterministic earliest-10 dates.
    Q("q47_date_dim_capped",
      (s, dir) => Dims.dates(t(s, dir, "orders"), "o_orderdate", cap = Some(10))
        .orderBy("date_id_pk"),
      Some("""WITH d AS (
             |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS full_date
             |  FROM orders WHERE o_orderdate IS NOT NULL
             |  ORDER BY full_date LIMIT 10)
             |SELECT CAST(row_number() OVER (ORDER BY full_date) - 1 AS BIGINT) AS date_id_pk,
             |  CAST(day(full_date) AS INT) AS day,
             |  CAST(month(full_date) AS INT) AS month,
             |  CAST(year(full_date) AS INT) AS year,
             |  ((dayofweek(full_date) + 6) % 7) <= 4 AS is_work_day,
             |  ((dayofweek(full_date) + 6) % 7) > 4 AS is_weekday,
             |  CAST(quarter(full_date) AS INT) AS quarter,
             |  full_date
             |FROM d ORDER BY date_id_pk""".stripMargin)),

    // CUBE grouping sets (all four combinations), '(all)' markers so sort
    // keys stay null-free.
    Q("q48_cube",
      (s, dir) => t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          decStr(sum(col("o_totalprice").cast(dec))).as("sum_total"),
          grouping(col("o_orderstatus")).as("g_s"),
          grouping(col("o_orderpriority")).as("g_p"))
        .select(
          when(col("g_s") === 1, "(all)").otherwise(col("o_orderstatus")).as("status"),
          when(col("g_p") === 1, "(all)").otherwise(col("o_orderpriority")).as("priority"),
          col("n"), col("sum_total"))
        .orderBy("status", "priority"),
      Some("""SELECT
             |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
             |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
             |  count(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS sum_total
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // Correlated scalar subquery through the SQL surface (identical text on
    // both engines).
    Q("q49_correlated_scalar_subquery",
      (s, dir) => {
        graft.warehouse.Warehouse.registerTestdata(s, dir)
        s.sql(corrSql)
      },
      Some(corrSql)),

    // S1-S5: CSV sink + schema'd CSV scan round-trip. Spark writes a subset
    // as headered CSV, re-reads it with an explicit schema, and aggregates;
    // the oracle aggregates the original parquet — equality proves the CSV
    // codec (quoting, double formatting) is lossless.
    Q("q50_csv_roundtrip",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val sub = t(s, dir, "lineitem").where(col("l_orderkey") < 500)
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_returnflag")
        // one dir per JVM: overwrite-reused within a process (no /tmp
        // growth across repeated runs), pid-isolated across processes
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_csv_roundtrip_${ProcessHandle.current().pid()}"
        Sources.writeCsv(sub, path)
        val schema = StructType(Seq(
          StructField("l_orderkey", LongType),
          StructField("l_linenumber", IntegerType),
          StructField("l_quantity", DoubleType),
          StructField("l_extendedprice", DoubleType),
          StructField("l_returnflag", StringType)))
        Sources.csv(s, path, schema)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            decStr(sum(col("l_quantity").cast(dec))).as("sum_qty"),
            decStr(sum(col("l_extendedprice").cast(dec))).as("sum_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS sum_price
             |FROM lineitem WHERE l_orderkey < 500
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // P10-P13: casts, null imputation (column + constant), arithmetic
    // derivation — nulls synthesized from a predicate since testdata has
    // none.
    Q("q51_null_impute",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val withNulls = t(s, dir, "lineitem")
          .withColumn("qty_n",
            when(col("l_discount") > 0.05, lit(null).cast(DoubleType))
              .otherwise(col("l_quantity")))
        withNulls.select(
          col("l_orderkey"), col("l_linenumber"),
          coalesce(col("qty_n"), col("l_quantity")).as("qty_from_col"),   // P11
          coalesce(col("qty_n"), lit(0.0)).as("qty_from_const"),          // P12
          (col("l_extendedprice") - col("l_quantity")).as("price_minus_qty"), // P13
          col("l_quantity").cast(LongType).as("qty_long"))                // P10
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH w AS (
             |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             |    CASE WHEN l_discount > 0.05 THEN NULL ELSE l_quantity END AS qty_n
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber,
             |  coalesce(qty_n, l_quantity) AS qty_from_col,
             |  coalesce(qty_n, 0.0) AS qty_from_const,
             |  l_extendedprice - l_quantity AS price_minus_qty,
             |  CAST(trunc(l_quantity) AS BIGINT) AS qty_long
             |FROM w ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Exact continuous percentiles (interpolating): Spark `percentile` vs
    // DuckDB `quantile_cont`.
    Q("q52_percentiles",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
          percentile(col("l_extendedprice"), lit(0.9)).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.5) AS p50_qty,
             |  quantile_cont(l_extendedprice, 0.9) AS p90_price,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Exact distinct counts (two-phase partial dedup; the approximate HLL
    // variant exists as approx_count_distinct but has no cross-engine
    // oracle — see SCALING.md).
    Q("q53_distinct_counts",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("nd_parts"),
          count_distinct(col("l_suppkey")).as("nd_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS nd_parts,
             |  count(DISTINCT l_suppkey) AS nd_supps,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Scalar string-function battery (P1-P9 cousins exposed as first-class
    // engine surface).
    Q("q54_string_funcs",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lpad(col("p_partkey").cast(StringType), 8, "0").as("padded"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        instr(col("p_name"), "widget").as("widget_at"),
        substring(col("p_name"), 2, 5).as("sub"),
        reverse(col("p_name")).as("rev"),
        expr("left(p_name, 3)").as("l3"),
        expr("right(p_type, 3)").as("r3"),
        levenshtein(col("p_brand"), col("p_type")).as("lev"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tr"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  upper(p_name) AS up,
             |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
             |  regexp_replace(p_name, ' ', '_', 'g') AS snake,
             |  CAST(instr(p_name, 'widget') AS INT) AS widget_at,
             |  substr(p_name, 2, 5) AS sub,
             |  reverse(p_name) AS rev,
             |  left(p_name, 3) AS l3,
             |  right(p_type, 3) AS r3,
             |  CAST(levenshtein(p_brand, p_type) AS INT) AS lev,
             |  translate(p_name, 'aeiou', 'AEIOU') AS tr
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Array-column operators over embeddings (size/min/max/element/sum).
    Q("q55_array_ops",
      (s, dir) => t(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        array_min(col("embedding")).as("min_e"),
        array_max(col("embedding")).as("max_e"),
        get(col("embedding"), lit(0)).as("first_e"),
        graft.similarity.Similarity.dot(col("embedding"), col("embedding"))
          .as("sq_norm"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  CAST(len(embedding) AS INT) AS dim,
             |  list_min(embedding) AS min_e,
             |  list_max(embedding) AS max_e,
             |  embedding[1] AS first_e,
             |  list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) AS sq_norm
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // Regex extraction/counting over semi-structured text.
    Q("q56_regexp_extract",
      (s, dir) => Sources.events(s, dir).select(
        col("event_id"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).as("k_str"),
        size(regexp_extract_all(col("props"), lit("[0-9]"), lit(0))).as("n_digits"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str,
             |  CAST(len(regexp_extract_all(props, '[0-9]')) AS INT) AS n_digits
             |FROM events ORDER BY event_id""".stripMargin)),

    // Generator/explode (UDTF-shaped): token frequency via explode ->
    // groupBy — the Spark Generator path the reference's loops map onto.
    Q("q57_word_freq",
      (s, dir) => t(s, dir, "documents")
        .select(explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20),
      Some("""SELECT tok, count(*) AS n
             |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             |      FROM documents)
             |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin)),

    // Window-function battery: lag/lead/row_number/running decimal sum.
    Q("q58_window_battery",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val run = w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Sources.events(s, dir).select(
          col("event_id"), col("user_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          row_number().over(w).as("rn"),
          decStr(sum(col("value").cast(dec)).over(run)).as("running_value"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  lag(value) OVER w AS prev_value,
             |  lead(value) OVER w AS next_value,
             |  CAST(row_number() OVER w AS INT) AS rn,
             |  CAST(SUM(CAST(value AS DECIMAL(38,4)))
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS running_value
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    // As-of join (point-in-time lookup): each event picks the most recent
    // signup at-or-before its timestamp for the same user. Spark-side:
    // union+sort+LOCF composition (operators.AsOfJoin — one shuffle, no
    // range-join explosion); oracle: DuckDB's native ASOF JOIN.
    Q("q59_asof_join",
      (s, dir) => {
        val events = Sources.events(s, dir)
        val signups = events.where(col("event_type") === "signup")
          .groupBy("user_id", "ts")
          .agg(max(col("event_id")).as("signup_event"))
        graft.operators.AsOfJoin.backward(
          events, signups, Seq("user_id"), "ts", "ts", Seq("signup_event"))
          .select("event_id", "user_id", "signup_event")
          .orderBy("event_id")
      },
      Some("""WITH s AS (
             |  SELECT user_id, ts AS s_ts, max(event_id) AS signup_event
             |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts)
             |SELECT e.event_id, e.user_id, s.signup_event
             |FROM events e ASOF LEFT JOIN s
             |  ON e.user_id = s.user_id AND e.ts >= s.s_ts
             |ORDER BY e.event_id""".stripMargin)),

    // IVF-flat ANN (nprobe=1): vectors partitioned into inverted lists by
    // nearest centroid (centroids = first 8 vectors standing in for a
    // k-means output); each query scans only its own list.
    Q("q60_ann_ivf",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val centroids = e.where(col("id") < 8)
          .select(col("id").as("cid"), col("vec"))
        graft.similarity.Similarity.ivfTopK(
          e.where(col("id").between(100, 104)), e, centroids, 3)
          .orderBy("query_id", "rank")
      },
      Some("""WITH cents AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 8),
             |assign AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT e.vec_id, c.cid,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) DESC,
             |                 c.cid) AS rn
             |    FROM embeddings e CROSS JOIN cents c)
             |  WHERE rn = 1),
             |q AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, a.cid
             |      FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id
             |      WHERE e.vec_id BETWEEN 100 AND 104),
             |cand AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, a.cid
             |         FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id),
             |scored AS (
             |  SELECT q.vec_id AS query_id, cand.vec_id AS neighbor_id,
             |         list_cosine_similarity(q.v, cand.v) AS sim
             |  FROM q JOIN cand ON q.cid = cand.cid AND q.vec_id <> cand.vec_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, sim,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |              ORDER BY sim DESC, neighbor_id) AS INT) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, sim
             |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    // Multi-probe IVF (nprobe=2): each query unions the inverted lists of
    // its TWO nearest centroids before ranking — the recall knob of
    // production IVF search, recovering true neighbors that live just
    // across a Voronoi boundary from the query (invisible at nprobe=1; see
    // KMeansLiteSpec's planted-neighbor proof and SCALING.md's measured
    // recall-vs-nprobe curve). Corpus vectors keep their single rank-1
    // list assignment (the index invariant), so the probed union is
    // dedup-free. The oracle replays the exact algorithm: query
    // assignment rn <= 2, corpus assignment rn = 1, rank once.
    Q("q104_ann_ivf_multiprobe",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val centroids = e.where(col("id") < 8)
          .select(col("id").as("cid"), col("vec"))
        graft.similarity.Similarity.ivfTopK(
          e.where(col("id").between(100, 104)), e, centroids, 3, nprobe = 2)
          .orderBy("query_id", "rank")
      },
      Some("""WITH cents AS (
             |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
             |  FROM embeddings WHERE vec_id < 8),
             |ranked_assign AS (
             |  SELECT e.vec_id, c.cid,
             |    row_number() OVER (PARTITION BY e.vec_id
             |      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) DESC,
             |               c.cid) AS rn
             |  FROM embeddings e CROSS JOIN cents c),
             |q AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, a.cid
             |      FROM embeddings e JOIN ranked_assign a
             |        ON a.vec_id = e.vec_id AND a.rn <= 2
             |      WHERE e.vec_id BETWEEN 100 AND 104),
             |cand AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, a.cid
             |         FROM embeddings e JOIN ranked_assign a
             |           ON a.vec_id = e.vec_id AND a.rn = 1),
             |scored AS (
             |  SELECT q.vec_id AS query_id, cand.vec_id AS neighbor_id,
             |         list_cosine_similarity(q.v, cand.v) AS sim
             |  FROM q JOIN cand ON q.cid = cand.cid AND q.vec_id <> cand.vec_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, sim,
             |         CAST(row_number() OVER (PARTITION BY query_id
             |              ORDER BY sim DESC, neighbor_id) AS INT) AS rank
             |  FROM scored)
             |SELECT query_id, rank, neighbor_id, sim
             |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)),

    // TPC-H Q13-style distribution: orders-per-customer histogram (left
    // join preserving zero-order customers, two-level aggregation).
    Q("q61_count_histogram",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(c("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .groupBy("n_orders")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("n_orders"))
      },
      Some("""SELECT n_orders, count(*) AS n_customers FROM (
             |  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
             |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
             |  GROUP BY c.c_custkey)
             |GROUP BY n_orders ORDER BY n_orders""".stripMargin)),

    // Calendar gap-fill: dense hour spine via sequence+explode (the G1
    // generator pattern as a join dimension), zero-filled counts.
    Q("q62_time_gap_fill",
      (s, dir) => {
        val ev = Sources.events(s, dir)
        val bounds = ev.agg(
          date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        val spine = bounds.select(explode(sequence(
          col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hour_ts"))
        val counts = ev.groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
          .agg(count(lit(1)).as("n0"))
        spine.join(counts, Seq("hour_ts"), "left")
          .select(col("hour_ts"), coalesce(col("n0"), lit(0L)).as("n"))
          .orderBy("hour_ts")
      },
      Some("""WITH bounds AS (
             |  SELECT date_trunc('hour', min(ts)) AS lo,
             |         date_trunc('hour', max(ts)) AS hi FROM events),
             |spine AS (
             |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
             |  FROM bounds),
             |counts AS (
             |  SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS n0
             |  FROM events GROUP BY date_trunc('hour', ts))
             |SELECT s.hour_ts, coalesce(c.n0, 0) AS n
             |FROM spine s LEFT JOIN counts c ON s.hour_ts = c.hour_ts
             |ORDER BY s.hour_ts""".stripMargin)),

    // Bounded-memory group-wise top-k via a custom typed Aggregator
    // (functions.TopKAgg): O(k) heap buffer per group with map-side partial
    // merge — vs collect_list's O(group) or a window's full shuffle+sort.
    Q("q63_grouped_topk",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(graft.functions.TopKAgg.topK(col("l_extendedprice"), 5).as("topk"))
        .select(col("l_returnflag"), posexplode(col("topk")).as(Seq("pos", "price")))
        .select(col("l_returnflag"), (col("pos") + 1).cast(IntegerType).as("rank"),
          col("price"))
        .orderBy("l_returnflag", "rank"),
      Some("""WITH t AS (
             |  SELECT l_returnflag, list_sort(list(l_extendedprice), 'DESC')[1:5] AS v
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, CAST(i AS INT) AS rank, v[CAST(i AS INT)] AS price
             |FROM t CROSS JOIN range(1, 6) r(i)
             |WHERE i <= len(v)
             |ORDER BY l_returnflag, rank""".stripMargin)),

    // Full outer join (both null sides exercised: odd-key customers vs
    // high-value order customers) + explicit cross join (region x nation
    // grouped). Sort keys coalesced to stay null-free.
    Q("q65_outer_cross_join",
      (s, dir) => {
        val a = t(s, dir, "customer").where(col("c_custkey") % 2 === 1)
          .select(col("c_custkey").as("k"), col("c_mktsegment"))
        val b = t(s, dir, "orders").where(col("o_totalprice") > 200000)
          .select(col("o_custkey").as("k"), col("o_orderkey"))
        a.join(b, Seq("k"), "full_outer")
          .groupBy(coalesce(col("c_mktsegment"), lit("(none)")).as("segment"))
          .agg(count(lit(1)).as("n"),
            count(col("o_orderkey")).as("n_orders"))
          .orderBy("segment")
      },
      Some("""WITH a AS (SELECT c_custkey AS k, c_mktsegment FROM customer
             |          WHERE c_custkey % 2 = 1),
             |b AS (SELECT o_custkey AS k, o_orderkey FROM orders
             |      WHERE o_totalprice > 200000)
             |SELECT coalesce(c_mktsegment, '(none)') AS segment,
             |       count(*) AS n, count(o_orderkey) AS n_orders
             |FROM a FULL OUTER JOIN b USING (k)
             |GROUP BY coalesce(c_mktsegment, '(none)')
             |ORDER BY segment""".stripMargin)),

    // Date/interval arithmetic battery.
    Q("q66_date_arith",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
              .as("ship_lag_days"),
            date_add(to_date(col("o_orderdate")), 30).as("due_date"),
            last_day(to_date(col("o_orderdate"))).as("month_end"),
            dayofyear(to_date(col("o_orderdate"))).as("doy"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
             |                 CAST(l_shipdate AS DATE)) AS INT) AS ship_lag_days,
             |  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |  CAST(dayofyear(o_orderdate) AS INT) AS doy
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Conditional-expression battery: CASE/nullif/ifnull/greatest/least.
    Q("q69_conditionals",
      (s, dir) => t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "low").otherwise("high").as("band"),
        nullif(col("c_mktsegment"), lit("MACHINERY")).as("seg_nullable"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("(m)"))
          .as("seg_filled"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor0"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  CASE WHEN c_acctbal < 0 THEN 'debt'
             |       WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band,
             |  nullif(c_mktsegment, 'MACHINERY') AS seg_nullable,
             |  coalesce(nullif(c_mktsegment, 'MACHINERY'), '(m)') AS seg_filled,
             |  greatest(c_acctbal, 0.0) AS bal_floor0,
             |  least(c_acctbal, 1000.0) AS bal_cap
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Exact numeric functions (abs/sign/sqrt/floor/ceil/pmod — IEEE-exact
    // ops only; transcendentals excluded: libm results differ per engine).
    Q("q70_numeric_funcs",
      (s, dir) => t(s, dir, "supplier").select(
        col("s_suppkey"),
        abs(col("s_acctbal") - 3000).as("abs_dev"),
        signum(col("s_acctbal") - 3000).as("sgn"),
        sqrt(abs(col("s_acctbal"))).as("root"),
        floor(col("s_acctbal")).as("flr"),
        ceil(col("s_acctbal")).as("cl"),
        pmod(col("s_suppkey"), lit(7)).as("m7"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey,
             |  abs(s_acctbal - 3000) AS abs_dev,
             |  CAST(sign(s_acctbal - 3000) AS DOUBLE) AS sgn,
             |  sqrt(abs(s_acctbal)) AS root,
             |  CAST(floor(s_acctbal) AS BIGINT) AS flr,
             |  CAST(ceil(s_acctbal) AS BIGINT) AS cl,
             |  CAST(s_suppkey % 7 AS BIGINT) AS m7
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // Ranking-window battery: ntile/percent_rank/cume_dist/dense_rank over
    // a unique ordering (rank ties impossible -> exact cross-engine values;
    // percent_rank/cume_dist are ratios of exact ints, bit-identical).
    Q("q71_window_stats",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        t(s, dir, "customer").select(
          col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          dense_rank().over(w).as("drank"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  percent_rank() OVER w AS pct_rank,
             |  cume_dist() OVER w AS cume,
             |  CAST(dense_rank() OVER w AS INT) AS drank
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // Pivot: hour-of-day x event-type count matrix via conditional
    // aggregation (explicit value list -> stable cross-engine column names,
    // single pass — what Dataset.pivot compiles to under the hood).
    Q("q72_pivot",
      (s, dir) => {
        val hr = hour(col("ts")).cast(IntegerType)
        val types = Seq("click", "error", "purchase", "signup", "view")
        val aggs = types.map(t =>
          count(when(col("event_type") === t, 1)).as(s"${t}_n"))
        Sources.events(s, dir)
          .groupBy(hr.as("hr"))
          .agg(aggs.head, aggs.tail: _*)
          .orderBy("hr")
      },
      Some("""SELECT CAST(hour(ts) AS INT) AS hr,
             |  count(*) FILTER (WHERE event_type = 'click') AS click_n,
             |  count(*) FILTER (WHERE event_type = 'error') AS error_n,
             |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
             |  count(*) FILTER (WHERE event_type = 'signup') AS signup_n,
             |  count(*) FILTER (WHERE event_type = 'view') AS view_n
             |FROM events GROUP BY CAST(hour(ts) AS INT) ORDER BY hr""".stripMargin)),

    // Unpivot (melt): wide per-order money columns back to (measure, value)
    // rows via stack — the inverse reshape, exercised as a Generator.
    Q("q73_unpivot",
      (s, dir) => t(s, dir, "orders")
        .where(col("o_orderkey") < 100)
        .selectExpr("o_orderkey",
          "stack(2, 'total', o_totalprice, 'half', o_totalprice / 2) AS (measure, value)")
        .orderBy("o_orderkey", "measure"),
      Some("""SELECT o_orderkey, 'total' AS measure, o_totalprice AS value
             |FROM orders WHERE o_orderkey < 100
             |UNION ALL
             |SELECT o_orderkey, 'half', o_totalprice / 2
             |FROM orders WHERE o_orderkey < 100
             |ORDER BY o_orderkey, measure""".stripMargin)),

    // Range (interval containment) join: orders against a tiny tier table on
    // lo <= price < hi. The build side broadcasts, so the non-equi condition
    // runs as a broadcast nested-loop over 3 rows — no shuffle, no cartesian
    // blowup; the general pattern for binning against non-aligned intervals
    // where a CASE ladder can't be generated.
    Q("q78_range_join",
      (s, dir) => {
        import s.implicits._
        val tiers = broadcast(Seq(
          ("t0_small", 0.0, 50000.0),
          ("t1_mid", 50000.0, 150000.0),
          ("t2_large", 150000.0, 1.0e12)).toDF("tier", "lo", "hi"))
        t(s, dir, "orders")
          .join(tiers, col("o_totalprice") >= col("lo") &&
            col("o_totalprice") < col("hi"))
          .groupBy("tier")
          .agg(count(lit(1)).as("n_orders"),
            decStr(sum(col("o_totalprice").cast(dec))).as("sum_price"))
          .orderBy("tier")
      },
      Some("""SELECT tier, count(*) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS sum_price
             |FROM orders JOIN (VALUES
             |    ('t0_small', 0.0, 50000.0),
             |    ('t1_mid', 50000.0, 150000.0),
             |    ('t2_large', 150000.0, 1.0e12)) t(tier, lo, hi)
             |  ON o_totalprice >= lo AND o_totalprice < hi
             |GROUP BY tier ORDER BY tier""".stripMargin)),

    // Time-based rolling aggregate: per-customer 7-day RANGE frame (q58/q71
    // cover ROWS frames; RANGE over a numeric day key is the time-windowed
    // variant). DECIMAL sum keeps the frame total order-independent.
    Q("q79_rolling_window_range",
      (s, dir) => {
        val day = unix_date(to_date(col("o_orderdate")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy(day)
          .rangeBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
        t(s, dir, "orders").where(col("o_custkey") < 200)
          .select(col("o_orderkey"), col("o_custkey"), day.as("order_day"),
            decStr(sum(col("o_totalprice").cast(dec)).over(w)).as("roll_sum_7d"),
            count(lit(1)).over(w).as("roll_n_7d"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT) AS order_day,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) OVER w AS VARCHAR) AS roll_sum_7d,
             |  count(*) OVER w AS roll_n_7d
             |FROM orders WHERE o_custkey < 200
             |WINDOW w AS (
             |  PARTITION BY o_custkey
             |  ORDER BY CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT)
             |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             |ORDER BY o_orderkey""".stripMargin)),

    // Schema-evolution union: two readers with divergent column sets merge
    // via union-by-name with missing columns null-filled — the lakehouse
    // pattern for appending files written under an older schema.
    Q("q80_union_by_name",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.select(col("o_orderkey"), col("o_totalprice"))
          .unionByName(o.select(col("o_orderkey"), col("o_orderstatus")),
            allowMissingColumns = true)
          .groupBy(coalesce(col("o_orderstatus"), lit("(price-rows)")).as("status"))
          .agg(count(lit(1)).as("n"),
            decStr(sum(coalesce(col("o_totalprice"), lit(0.0)).cast(dec))).as("sum_price"))
          .orderBy("status")
      },
      Some("""WITH u AS (
             |  SELECT o_orderkey, o_totalprice FROM orders
             |  UNION ALL BY NAME
             |  SELECT o_orderkey, o_orderstatus FROM orders)
             |SELECT coalesce(o_orderstatus, '(price-rows)') AS status,
             |  count(*) AS n,
             |  CAST(sum(CAST(coalesce(o_totalprice, 0.0) AS DECIMAL(38,4))) AS VARCHAR) AS sum_price
             |FROM u GROUP BY 1 ORDER BY status""".stripMargin)),

    // SCD2 dimension history: each observation becomes a version row with
    // [valid_from, valid_to) from lead() over the key's timeline; the open
    // version has valid_to null. One shuffle on the key — history for a
    // 100 TB dimension costs the same as any keyed window.
    Q("q83_scd2_history",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        Sources.events(s, dir).where(col("user_id") < 10)
          .select(col("user_id"), col("event_id"), col("value"),
            col("ts").as("valid_from"),
            lead(col("ts"), 1).over(w).as("valid_to"))
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy("user_id", "valid_from", "event_id")
      },
      Some("""SELECT user_id, event_id, value,
             |  ts AS valid_from,
             |  lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |    AS valid_to,
             |  lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |    IS NULL AS is_current
             |FROM events WHERE user_id < 10
             |ORDER BY user_id, valid_from, event_id""".stripMargin)),

    // JSON-lines sink + source roundtrip (explicit schema on re-read — no
    // inference pass): the interchange-format twin of q50's CSV roundtrip.
    Q("q84_json_roundtrip",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val sub = t(s, dir, "orders").where(col("o_orderkey") < 500)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_json_roundtrip_${ProcessHandle.current().pid()}"
        Sources.writeJson(sub, path)
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType)))
        Sources.json(s, path, schema)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            decStr(sum(col("o_totalprice").cast(dec))).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS sum_price
             |FROM orders WHERE o_orderkey < 500
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Exact distributed moments: float stddev/corr are summation-order
    // dependent (not reproducible under AQE re-partitioning), so the
    // scale-safe pattern is exact DECIMAL sufficient statistics (n, Σx,
    // Σx², Σxy — source values are 2dp, products exactly 4dp) with the
    // derived statistics computed from the tiny grouped result
    // (MomentsSpec shows the derivation matches Spark's built-ins).
    Q("q89_exact_moments",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          decStr(sum(col("l_quantity").cast(dec))).as("sum_qty"),
          decStr(sum((col("l_quantity") * col("l_quantity")).cast(dec))).as("sum_qty2"),
          decStr(sum(col("l_extendedprice").cast(dec))).as("sum_price"),
          decStr(sum((col("l_extendedprice") * col("l_extendedprice")).cast(dec)))
            .as("sum_price2"),
          decStr(sum((col("l_extendedprice") * col("l_quantity")).cast(dec)))
            .as("sum_pq"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS sum_qty,
             |  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS sum_qty2,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS sum_price,
             |  CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS sum_price2,
             |  CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS sum_pq
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin))
  ) :+ q94 :+ q97 :+ q98

  /** Incremental aggregate maintenance (materialized-view refresh): the
    * accumulated table's aggregates fold with the delta's via
    * `Incremental.mergeAggregates` — history is never rescanned; the merge
    * shuffles aggregate rows, not the fact. The oracle recomputes from
    * scratch, asserting merge(agg(old), agg(delta)) == agg(all). */
  private lazy val q94: Q =
    Q("q94_incremental_agg",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        def aggOf(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("o_orderstatus")
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast(dec)).as("sum_total"))
        graft.delta.Incremental.mergeAggregates(
          aggOf(orders.where(col("o_orderkey") % 4 =!= 1)),
          aggOf(orders.where(col("o_orderkey") % 4 === 1)),
          Seq("o_orderstatus"))
          .select(col("o_orderstatus"), col("n"),
            decStr(col("sum_total")).as("sum_total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS sum_total
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  /** SCD1 upsert: an accumulated table with STALE rows (totalprice +1000
    * on every key % 3 == 0) merges with fresh update rows for those keys —
    * latest wins, the result must equal the source of truth, which is
    * exactly what the oracle selects. */
  private lazy val q97: Q =
    Q("q97_upsert_scd1",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val stale = orders.where(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        val acc = orders.where(col("o_orderkey") % 3 =!= 0).unionByName(stale)
        val fresh = orders.where(col("o_orderkey") % 3 === 0)
        graft.delta.Incremental.upsertByKey(acc, fresh, Seq("o_orderkey"))
          .orderBy("o_orderkey")
      },
      Some("SELECT * FROM orders ORDER BY o_orderkey"))

  /** In-plan JSON codec roundtrip: to_json(struct/array/nested) ->
    * from_json(schema) -> field extraction must be lossless (the in-memory
    * twin of q84's JSON-file roundtrip; doubles survive via shortest-repr
    * printing). The oracle recomputes the fields directly from the base
    * columns — equality proves the codec dropped nothing. */
  private lazy val q98: Q =
    Q("q98_json_codec_roundtrip",
      (s, dir) => {
        val j = to_json(struct(
          col("event_id").as("id"), col("event_type").as("t"),
          array(col("user_id"), pmod(col("event_id"), lit(7L))).as("xs"),
          struct(col("value").as("v")).as("nest")))
        val parsed = from_json(j,
          org.apache.spark.sql.types.DataType.fromDDL(
            "STRUCT<id: BIGINT, t: STRING, xs: ARRAY<BIGINT>, nest: STRUCT<v: DOUBLE>>"))
        Sources.events(s, dir)
          .select(col("event_id"), parsed.as("p"))
          .select(col("event_id"), col("p.id").as("id"), col("p.t").as("t"),
            get(col("p.xs"), lit(0)).as("x0"), get(col("p.xs"), lit(1)).as("x1"),
            col("p.nest.v").as("v"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_id AS id, event_type AS t,
             |  user_id AS x0, event_id % 7 AS x1, value AS v
             |FROM events ORDER BY event_id""".stripMargin))

  private lazy val corrSql: String =
    """SELECT c_custkey,
      |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_total,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      |FROM customer
      |ORDER BY c_custkey""".stripMargin
}
