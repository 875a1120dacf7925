package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The correlated-subquery TPC-H shapes (q2 / q13 / q21 / q22,
  * adapted to the reduced fixture schema — no partsupp, phone,
  * commitdate or comment columns; see TESTDATA.md).  These four cover
  * query shapes nothing else in the suite exercises:
  *
  *  - q2:  scalar CORRELATED subquery (per-part minimum price) that
  *         must be DECORRELATED into an aggregate + join;
  *  - q13: left-outer join whose per-key count feeds a second
  *         aggregation (the count-of-counts distribution);
  *  - q21: multi-way EXISTS + NOT EXISTS over the same fact table,
  *         the NOT EXISTS correlated on TWO outer relations
  *         (l1.l_orderkey and o.o_orderdate);
  *  - q22: uncorrelated scalar subquery (corpus average) combined
  *         with a NOT EXISTS anti-join.
  *
  * The engine entries deliberately run the SAME correlated-subquery
  * SQL text through Spark and let CATALYST do the decorrelation
  * (`RewriteCorrelatedScalarSubquery` → aggregate + left outer join;
  * `RewritePredicateSubquery` → left semi / left anti joins) instead
  * of hand-writing the join form — that the optimizer produced joins
  * and not per-row subquery execution is asserted by PlanShapeSpec.
  * The SQL is engine-portable (interval arithmetic, timestamp
  * literals and quantized-cent sums are spelled identically in Spark
  * and DuckDB), so the oracle is the very same text.
  *
  * Scale (100 TB):
  *  - q2 decorrelates to a per-part min aggregate (map-side partial)
  *    joined back on l_partkey — one shuffle each side of the join;
  *    part/supplier/nation are broadcast dims.
  *  - q13's left outer join shuffles customer/orders on custkey once;
  *    both aggregations are map-side-combining counts; the second
  *    groups on ≤ max-orders-per-customer distinct values.
  *  - q21's EXISTS/NOT EXISTS become semi/anti joins on l_orderkey —
  *    the SAME key the fact join uses, so AQE/exchange reuse keeps it
  *    to one physical shuffle of lineitem per side, and the anti
  *    join's extra predicate rides the join, never a per-row probe.
  *  - q22's scalar average is a one-row broadcast; the NOT EXISTS is
  *    one anti join shuffled on custkey.  Money sums accumulate
  *    exact integer cents (the µ-quantization discipline), so results
  *    are independent of partial-aggregation order in both engines.
  */
object SubqueryShapes {

  private def runSql(spark: SparkSession, dir: String, sql: String,
                     tables: Seq[String]): DataFrame = {
    tables.foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(sql)
  }

  // ------------------------------------------------- q2 (adapted): min-cost supplier

  /** For every small part (p_size ≤ 5), the supplier(s) whose
    * lineitem price IS the part's minimum observed price — the
    * reference shape's "supplier offering the minimum supply cost",
    * with lineitem standing in for the absent partsupp table.  The
    * correlated `min` must decorrelate or the plan re-scans lineitem
    * per part row. */
  val q2MinCostSupplierSql: String =
    """SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
      |  round(s.s_acctbal, 2) AS s_acctbal,
      |  round(l.l_extendedprice, 2) AS min_price
      |FROM part p, lineitem l, supplier s, nation n
      |WHERE l.l_partkey = p.p_partkey AND s.s_suppkey = l.l_suppkey
      |  AND s.s_nationkey = n.n_nationkey AND p.p_size <= 5
      |  AND l.l_extendedprice = (
      |    SELECT min(l2.l_extendedprice) FROM lineitem l2
      |    WHERE l2.l_partkey = p.p_partkey)
      |ORDER BY s_acctbal DESC, n.n_name, s.s_name, p.p_partkey""".stripMargin

  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame =
    runSql(spark, dir, q2MinCostSupplierSql,
      Seq("part", "lineitem", "supplier", "nation"))

  // ------------------------------------------------- q13: customer order distribution

  /** Count-of-counts over a filtered LEFT OUTER join: how many
    * customers placed exactly k non-urgent orders (k = 0 customers
    * survive via the outer join — the whole point of the shape). */
  val q13CustDistributionSql: String =
    """SELECT CAST(c_count AS BIGINT) AS c_count,
      |  CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c LEFT OUTER JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  def q13CustDistribution(spark: SparkSession, dir: String): DataFrame =
    runSql(spark, dir, q13CustDistributionSql, Seq("customer", "orders"))

  // ------------------------------------------------- q21: suppliers who kept waiting

  /** Suppliers who were the ONLY late shipper (ship > order date +
    * 365 days, standing in for the absent receipt/commit dates) on a
    * finished multi-supplier order: EXISTS (another supplier shipped
    * on the order) AND NOT EXISTS (another supplier was also late) —
    * the NOT EXISTS correlated on both l1 and o. */
  val q21WaitingSupplierSql: String =
    """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier s, lineitem l1, orders o
      |WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
      |  AND o.o_orderstatus = 'F'
      |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s.s_name""".stripMargin

  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame =
    runSql(spark, dir, q21WaitingSupplierSql,
      Seq("supplier", "lineitem", "orders"))

  // ------------------------------------------------- q22: dormant positive balances

  /** Per-nation count and total balance of customers whose balance
    * exceeds the positive-balance average (uncorrelated scalar
    * subquery) and who placed NO order since 1999 (NOT EXISTS,
    * standing in for q22's no-orders-in-7-years predicate; nation
    * stands in for the absent phone country code).  Both the
    * threshold average and the reported totals accumulate exact
    * integer cents so neither engine's partial-aggregation order can
    * shift a customer across the threshold. */
  val q22InactiveBalanceSql: String =
    """SELECT n.n_name AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100
      |    AS totacctbal
      |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      |WHERE c.c_acctbal > (
      |    SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
      |      / (100 * count(*))
      |    FROM customer c2 WHERE c2.c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY n.n_name
      |ORDER BY cntrycode""".stripMargin

  def q22InactiveBalance(spark: SparkSession, dir: String): DataFrame =
    runSql(spark, dir, q22InactiveBalanceSql,
      Seq("customer", "nation", "orders"))
}
