package graft

import graft.core.Core
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent replays of the TPC-H-shaped SQL contract queries: each
  * `spark.sql` text is recomputed through the DataFrame DSL (a
  * different analyzer entry path over the same tables) and must agree
  * row-for-row. Plan shape: the dimension sides must broadcast and the
  * fact-scan filters must reach parquet (the 100 TB property
  * docs/PLANS.md claims for the SQL surface). The DuckDB oracle
  * re-checks values at sf0.01. */
class SqlSuiteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def t(name: String) = Core.table(spark, dir, name)
  private def day(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd")
  // strict NTZ literal for replay FILTERS: a date-STRING compare
  // (day(col) > "1997-06-01") would silently truncate intra-day
  // timestamps — equal-date rows with a time-of-day component compare
  // 'equal', diverging from the contract's TIMESTAMP_NTZ predicate on
  // any non-midnight-aligned fixture (self-review round 10)
  private def ntz(d: String) =
    to_timestamp_ntz(lit(s"$d 00:00:00"))
  // Σ price_cents × (100 − discount_hundredths): the exact-integer
  // revenue both engines aggregate before the one final division
  private val revCents =
    sum(Core.cents(col("l_extendedprice")) *
      (lit(100L) - Core.cents(col("l_discount"))))
  private val revenue =
    (revCents.cast("double") / lit(10000).cast("double")).as("revenue")

  test("sql_tpch_q1 matches a DataFrame-DSL replay") {
    val got = SparkEntry.queries("sql_tpch_q1")(spark, dir).collect()
      .map(_.toSeq)
    val pc = Core.cents(col("l_extendedprice"))
    val dc = Core.cents(col("l_discount"))
    val tc = Core.cents(col("l_tax"))
    val qc = Core.cents(col("l_quantity"))
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val want = t("lineitem")
      .filter(col("l_shipdate") <= ntz("2001-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (dbl(sum(qc)) / 100d).as("sum_qty"),
        (dbl(sum(pc)) / 100d).as("sum_base_price"),
        (dbl(sum(pc * (lit(100L) - dc))) / 10000d).as("sum_disc_price"),
        (dbl(sum(pc * (lit(100L) - dc) * (lit(100L) + tc))) / 1000000d)
          .as("sum_charge"),
        (dbl(sum(qc)) / dbl(count(lit(1)) * 100)).as("avg_qty"),
        (dbl(sum(pc)) / dbl(count(lit(1)) * 100)).as("avg_price"),
        (dbl(sum(dc)) / dbl(count(lit(1)) * 100)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("sql_tpch_q3 matches a DataFrame-DSL replay") {
    val got = SparkEntry.queries("sql_tpch_q3")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getString(3)))
    val want = t("customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t("orders").filter(col("o_orderdate") < ntz("1997-06-01")),
        col("c_custkey") === col("o_custkey"))
      .join(t("lineitem").filter(col("l_shipdate") > ntz("1997-06-01")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), day(col("o_orderdate")).as("order_date"),
        col("o_orderpriority"))
      .agg(revenue)
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getString(1), r.getString(2)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("sql_tpch_q4 matches a distinct-semi-join replay of the EXISTS") {
    val got = SparkEntry.queries("sql_tpch_q4")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val o = t("orders")
      .filter(col("o_orderdate") >= ntz("1997-01-01") &&
        col("o_orderdate") < ntz("1997-04-01"))
    val want = o.join(t("lineitem"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"),
        "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("sql_tpch_q5 matches a DataFrame-DSL replay") {
    val got = SparkEntry.queries("sql_tpch_q5")(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = t("customer")
      .join(t("orders").filter(col("o_orderdate") >= ntz("1996-01-01") &&
          col("o_orderdate") < ntz("1998-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(t("nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t("region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name").agg(revenue)
      .orderBy(col("revenue").desc, col("n_name")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("sql_tpch_q10 matches a DataFrame-DSL replay") {
    val got = SparkEntry.queries("sql_tpch_q10")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getString(4)))
    val want = t("customer")
      .join(t("orders").filter(col("o_orderdate") >= ntz("1997-01-01") &&
          col("o_orderdate") < ntz("1997-07-01")),
        col("c_custkey") === col("o_custkey"))
      .join(t("lineitem").filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t("nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(revenue)
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(4),
        r.getDouble(2), r.getString(3)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("SQL-surface plans: dims broadcast, fact filters pushed, no cartesian") {
    for (q <- Seq("sql_tpch_q3", "sql_tpch_q5", "sql_tpch_q10")) {
      val qe = SparkEntry.queries(q)(spark, dir).queryExecution
      val p = qe.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"$q: dimension join did not broadcast")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian appeared")
      // date/flag predicates must reach the parquet fact scan
      assert(p.contains("PushedFilters: [IsNotNull"),
        s"$q: no pushed filters on a scan")
    }
    // Q4's EXISTS must decorrelate to a semi-join, not a subquery loop
    val p4 = SparkEntry.queries("sql_tpch_q4")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p4.contains("LeftSemi"), "q4 EXISTS did not become a semi-join")
  }
}
