package graft.operators

import graft.core.Core.Q
import graft.core.GraftCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H-shaped multi-join SQL contract queries, entered through
  * `spark.sql` over [[GraftCatalog]]'s registered views — the
  * analyzer/optimizer path a SQL user actually types, not the
  * DataFrame DSL the rest of the engine exercises. Each query is the
  * classic TPC-H shape adapted to the testdata columns (the corpus
  * ships no o_shippriority / l_commitdate / l_shipmode):
  *
  *  - Q3  "shipping priority": segment-filtered customer ⋈ orders ⋈
  *    lineitem, revenue per order, top 10.
  *  - Q4  "order priority checking": EXISTS-correlated lineitem probe
  *    (Catalyst decorrelates to a semi-join).
  *  - Q5  "local supplier volume": 6-table customer ⋈ orders ⋈
  *    lineitem ⋈ supplier ⋈ nation ⋈ region with the c_nationkey =
  *    s_nationkey locality constraint.
  *  - Q10 "returned items": returnflag-filtered revenue per customer,
  *    top 20.
  *
  * Scale shape: nation/region/supplier/customer are dimension-sized →
  * Catalyst broadcasts them (plan pinned in SqlSuiteSpec and
  * docs/PLANS.md); the lineitem fact scan keeps its date/flag filters
  * pushed to parquet; AQE re-plans the fact-side shuffle at runtime.
  * Revenue is exact integer-cents arithmetic — SUM(price_cents ×
  * (100 − discount_hundredths)) — divided once at the end, so Spark
  * and DuckDB produce bit-identical doubles (SURVEY.md §7.3).
  *
  * Dialect notes: orders/lineitem timestamps surface as TIMESTAMP_NTZ
  * in Spark 4 → literals are TIMESTAMP_NTZ on the Spark side, plain
  * TIMESTAMP in DuckDB; Spark parses `10000.0` as DECIMAL → every
  * literal division is CAST(... AS DOUBLE) on both sides.
  */
object SqlSuite {

  /** Exact revenue: Σ price_cents × (100 − discount_hundredths), as a
    * SQL fragment shared by every query (identical text on both
    * engines — pure ANSI). */
  private val RevenueCents =
    """SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
      |         * (100 - CAST(round(l_discount * 100) AS BIGINT)))""".stripMargin

  private val Revenue =
    s"CAST($RevenueCents AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue"

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    GraftCatalog.registerViews(s, dir)
    s.sql(text)
  }

  /** Q1's exact-integer aggregate block, shared verbatim by both
    * dialects (pure ANSI): quantities/prices in cents, discount/tax in
    * hundredths, every division once at the end over exact integers. */
  private val Q1Aggs =
    """       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
      |         / CAST(100 AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
      |         AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_base_price,
      |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
      |         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
      |         AS DOUBLE) / CAST(10000 AS DOUBLE) AS sum_disc_price,
      |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
      |         * (100 - CAST(round(l_discount * 100) AS BIGINT))
      |         * (100 + CAST(round(l_tax * 100) AS BIGINT)))
      |         AS DOUBLE) / CAST(1000000 AS DOUBLE) AS sum_charge,
      |       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
      |         / CAST(COUNT(*) * 100 AS DOUBLE) AS avg_qty,
      |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
      |         AS DOUBLE) / CAST(COUNT(*) * 100 AS DOUBLE) AS avg_price,
      |       CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
      |         / CAST(COUNT(*) * 100 AS DOUBLE) AS avg_disc,
      |       CAST(COUNT(*) AS BIGINT) AS count_order""".stripMargin

  def queries: Map[String, Q] = Map(
    "sql_tpch_q1" -> { (s, dir) =>
      sql(s, dir,
        s"""SELECT l_returnflag, l_linestatus,
           |$Q1Aggs
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP_NTZ '2001-09-01 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    },

    "sql_tpch_q3" -> { (s, dir) =>
      sql(s, dir,
        s"""SELECT l_orderkey,
           |       $Revenue,
           |       date_format(o_orderdate, 'yyyy-MM-dd') AS order_date,
           |       o_orderpriority
           |FROM customer
           |JOIN orders   ON c_custkey = o_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND o_orderdate < TIMESTAMP_NTZ '1997-06-01 00:00:00'
           |  AND l_shipdate  > TIMESTAMP_NTZ '1997-06-01 00:00:00'
           |GROUP BY l_orderkey, o_orderdate, o_orderpriority
           |ORDER BY revenue DESC, l_orderkey
           |LIMIT 10""".stripMargin)
    },

    "sql_tpch_q4" -> { (s, dir) =>
      sql(s, dir,
        """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
          |  AND o_orderdate <  TIMESTAMP_NTZ '1997-04-01 00:00:00'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate + INTERVAL '30' DAY)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    "sql_tpch_q5" -> { (s, dir) =>
      sql(s, dir,
        s"""SELECT n_name,
           |       $Revenue
           |FROM customer
           |JOIN orders   ON c_custkey = o_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |             AND c_nationkey = s_nationkey
           |JOIN nation   ON s_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
           |  AND o_orderdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
           |GROUP BY n_name
           |ORDER BY revenue DESC, n_name""".stripMargin)
    },

    "sql_tpch_q10" -> { (s, dir) =>
      sql(s, dir,
        s"""SELECT c_custkey, c_name,
           |       $Revenue,
           |       c_acctbal, n_name
           |FROM customer
           |JOIN orders   ON c_custkey = o_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |JOIN nation   ON c_nationkey = n_nationkey
           |WHERE l_returnflag = 'R'
           |  AND o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'
           |  AND o_orderdate <  TIMESTAMP_NTZ '1997-07-01 00:00:00'
           |GROUP BY c_custkey, c_name, c_acctbal, n_name
           |ORDER BY revenue DESC, c_custkey
           |LIMIT 20""".stripMargin)
    })

  def oracleSql: Map[String, String] = Map(
    "sql_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |$Q1Aggs
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "sql_tpch_q3" ->
      s"""SELECT l_orderkey,
         |       $Revenue,
         |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         |       o_orderpriority
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-06-01'
         |  AND l_shipdate  > TIMESTAMP '1997-06-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "sql_tpch_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "sql_tpch_q5" ->
      s"""SELECT n_name,
         |       $Revenue
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |             AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "sql_tpch_q10" ->
      s"""SELECT c_custkey, c_name,
         |       $Revenue,
         |       c_acctbal, n_name
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-07-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin)
}
