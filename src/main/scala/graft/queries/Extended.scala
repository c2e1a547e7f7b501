package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dims.Dims
import graft.sources.Sources
import graft.queries.Relational.Q

/** Warehouse-style queries beyond the minimal operator inventory: deep join
  * trees, CUBE grouping sets, correlated subqueries, capped generators. */
object Extended {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, name: String) =
    Sources.table(s, dir, name)

  private val dec = DecimalType(38, 4)

  val all: Seq[Q] = Seq(

    // Deep join tree (fact -> orders -> customer -> nation -> region) with
    // aggregation: exercises Catalyst join reordering; every dimension side
    // is broadcastable so the fact never shuffles before the final agg.
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
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
              .as("revenue"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS n_lines,
             |  SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS revenue
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
          sum(col("o_totalprice").cast(dec)).as("sum_total"),
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
             |  SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS sum_total
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // Correlated scalar subquery through the SQL surface (identical text on
    // both engines).
    Q("q49_correlated_scalar_subquery",
      (s, dir) => {
        graft.warehouse.Warehouse.registerTestdata(s, dir)
        s.sql(corrSql)
      },
      Some(corrSql))
  )

  private lazy val corrSql: String =
    """SELECT c_custkey,
      |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_total,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      |FROM customer
      |ORDER BY c_custkey""".stripMargin
}
