package graft

import org.apache.spark.sql.functions._

import graft.schemas.Tables

/** Typed Dataset API: case-class views stay plan-compatible with the
  * untyped suite and support typed transformations. */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("typed lineitem agg equals the untyped DataFrame aggregation") {
    val typed = Tables.lineitem(spark, sf)
      .filter(_.l_quantity > 45)
      .groupByKey(l => (l.l_returnflag, l.l_linestatus))
      .mapGroups { (key: (String, String), rows: Iterator[Tables.Lineitem]) =>
        val xs = rows.toSeq
        (key._1, key._2, xs.size.toLong, xs.map(_.l_quantity).sum)
      }
      .toDF("rf", "ls", "n", "sum_qty")
    val untyped = graft.sources.Sources.table(spark, sf, "lineitem")
      .where($"l_quantity" > 45)
      .groupBy($"l_returnflag".as("rf"), $"l_linestatus".as("ls"))
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
    assert(typed.exceptAll(untyped).isEmpty && untyped.exceptAll(typed).isEmpty)
  }

  test("typed filters still push down to the parquet scan") {
    // Column-based filter on a Dataset[T] keeps Catalyst visibility
    val q = Tables.orders(spark, sf).filter($"o_totalprice" > 100000)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_totalprice"))
    assert(q.count() > 0)
  }

  test("all ten typed table accessors decode") {
    assert(Tables.region(spark, sf).head.r_name.nonEmpty)
    assert(Tables.nation(spark, sf).head.n_name.nonEmpty)
    assert(Tables.customer(spark, sf).head.c_name.nonEmpty)
    assert(Tables.supplier(spark, sf).head.s_name.nonEmpty)
    assert(Tables.part(spark, sf).head.p_name.nonEmpty)
    assert(Tables.orders(spark, sf).head.o_orderkey >= 0)
    assert(Tables.lineitem(spark, sf).head.l_orderkey >= 0)
    assert(Tables.events(spark, sf).head.event_id >= 0)
    assert(Tables.documents(spark, sf).head.text.nonEmpty)
    assert(Tables.embeddings(spark, sf).head.embedding.length === 64)
  }
}
