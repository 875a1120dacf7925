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
  * Exception (round 15): q21's REGISTERED entry is a single-pass
  * aggregate rewrite — the decorrelated semi/anti form still scans
  * the fact table three times, which the r14 floor audit priced as
  * the only removable cost left in the suite.  The correlated text
  * stays as the oracle and the decorrelation showcase
  * ([[q21WaitingSupplierCorrelated]], plan-asserted in
  * PlanShapeSpec).
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
    * the NOT EXISTS correlated on both l1 and o.
    *
    * This text is the DuckDB oracle AND the decorrelation showcase
    * (PlanShapeSpec runs it through Spark via
    * [[q21WaitingSupplierCorrelated]] and asserts semi/anti joins);
    * the REGISTERED engine entry is the single-pass rewrite below,
    * which reads lineitem once instead of three times. */
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

  /** The correlated-SQL form run through Spark — NOT the registered
    * bench entry (that is the single-pass rewrite below); kept public
    * so PlanShapeSpec can keep asserting Catalyst turns the
    * EXISTS/NOT-EXISTS pair into semi/anti joins. */
  def q21WaitingSupplierCorrelated(spark: SparkSession,
      dir: String): DataFrame =
    runSql(spark, dir, q21WaitingSupplierSql,
      Seq("supplier", "lineitem", "orders"))

  /** Single-pass q21: the EXISTS/NOT-EXISTS semantics fold into ONE
    * scan of the fact table instead of three (the decorrelated form
    * reads lineitem for l1, semi-probes it for l2 and anti-probes it
    * for l3 — three scans the r14 floor audit priced at ~0.5 s extra
    * at sf0.1 and ~2 extra corpus passes at 100 TB).
    *
    * Per order o (status F), a supplier s contributes count(late
    * lines of s in o) to numwait iff s shipped late in o, o has
    * another supplier (EXISTS l2), and no OTHER supplier shipped late
    * in o (NOT EXISTS l3).  Equivalently: the order's late-supplier
    * set has size exactly 1, its supplier count is > 1, and the
    * contribution is the sole late supplier's late-line count.  So:
    *
    *  1. join lineitem to F-orders once (orders broadcast at sf0.1;
    *     AQE picks a shuffle join when orders outgrows the threshold),
    *  2. aggregate per (orderkey, suppkey): any_late, late_lines —
    *     one shuffle with map-side combine, output ≈ |order,supplier|
    *     pairs, far smaller than lineitem,
    *  3. aggregate per orderkey: n_supp, n_late_supp, the sole late
    *     supplier + its line count — a second, much smaller shuffle
    *     (deliberately NOT multi-count_distinct in one pass, which
    *     would Expand the joined fact 3× before the first shuffle),
    *  4. filter, broadcast-join supplier for the name, final agg.
    *
    * No semi/anti probe, no repeated fact scan; bit-identical numwait
    * (integer line counts) to the correlated oracle text. */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val late = ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 365 DAY"))
      .cast("int")
    val perSupp = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(Tables.orders(spark, dir)
        .filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey", late.as("late"))
      // ONE exchange for both aggregates (r15): hash-partitioning by
      // l_orderkey alone satisfies the clustered distribution of the
      // (orderkey, suppkey) aggregate AND the orderkey aggregate, so
      // the per-supplier and per-order rollups run back-to-back with
      // no second shuffle.  The shuffled rows are the 3-column
      // projected fact (orderkey, suppkey, late int) — at ~1.5
      // lineitem rows per (order, supplier) the map-side combine the
      // default plan buys costs a SECOND full exchange of the pair
      // relation, strictly more bytes end-to-end.
      .repartition($"l_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max($"late").as("any_late"), sum($"late").as("late_lines"))
    val perOrder = perSupp
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum($"any_late").as("n_late_supp"),
        max(when($"any_late" === 1, $"l_suppkey")).as("late_supp"),
        sum(when($"any_late" === 1, $"late_lines")).as("sole_late_lines"))
      .filter($"n_supp" > 1 && $"n_late_supp" === 1)
    perOrder
      .join(Tables.supplier(spark, dir).select($"s_suppkey", $"s_name"),
        $"late_supp" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(sum($"sole_late_lines").cast("bigint").as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

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

  // ------------------------------------------------- q9: product-type profit

  /** Per-nation per-year profit on a part family — q9's five-way
    * fact-dim join with a derived profit measure (p_retailprice-based
    * cost stands in for the absent partsupp supplycost).  Cents are
    * accumulated as exact BIGINTs so neither engine's
    * partial-aggregation order moves the sum. */
  val q9ProductProfitSql: String =
    """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
      |    - 0.6 * p.p_retailprice * l.l_quantity) * 100) AS BIGINT)) AS DOUBLE)
      |    / 100 AS sum_profit
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE p.p_name LIKE '%gear%'
      |GROUP BY n.n_name, year(o.o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin

  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame =
    runSql(spark, dir, q9ProductProfitSql,
      Seq("lineitem", "part", "supplier", "orders", "nation"))

  // ------------------------------------------------- q12: priority classes

  /** q12's CASE-sum priority-class split over a windowed fact join:
    * per return flag, how many late 1998 shipments (> 30 days after
    * order) belonged to high- vs low-priority orders (return flag
    * stands in for the absent ship-mode column). */
  val q12PriorityClassSql: String =
    """SELECT l.l_returnflag,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1999-01-01'
      |  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      |GROUP BY l.l_returnflag
      |ORDER BY l.l_returnflag""".stripMargin

  def q12PriorityClass(spark: SparkSession, dir: String): DataFrame =
    runSql(spark, dir, q12PriorityClassSql, Seq("orders", "lineitem"))

  // ------------------------------------------------- q16: supplier diversity

  /** q16's distinct-supplier count per part attribute with a NOT IN
    * exclusion subquery (suppliers in deficit stand in for the
    * complaint filter) — the anti-membership + COUNT DISTINCT shape. */
  val q16SupplierDiversitySql: String =
    """SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
      |  CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#7'
      |  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND l.l_suppkey NOT IN (
      |    SELECT s.s_suppkey FROM supplier s WHERE s.s_acctbal < 0)
      |GROUP BY p.p_brand, p.p_type, p.p_size
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size""".stripMargin

  def q16SupplierDiversity(spark: SparkSession, dir: String): DataFrame =
    runSql(spark, dir, q16SupplierDiversitySql,
      Seq("part", "lineitem", "supplier"))

  // ------------------------------------------------- q20: nested IN chain

  /** q20's nested IN-subquery chain: suppliers whose recent (1998+)
    * shipped quantity of a name-filtered part family exceeds 55 % of
    * their all-time quantity — supplier IN (grouped fact subquery
    * whose part filter is itself an IN subquery), with the share
    * comparison in integer-scaled arithmetic (quantities are
    * integer-valued, so 100·recent > 55·total is exact in both
    * engines — no double-ratio boundary to drift across). */
  val q20RecentShareSql: String =
    """SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT l.l_suppkey FROM lineitem l
      |  WHERE l.l_partkey IN (
      |    SELECT p.p_partkey FROM part p WHERE p.p_name LIKE '%rod%')
      |  GROUP BY l.l_suppkey
      |  HAVING 100 * sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1998-01-01'
      |    THEN l.l_quantity ELSE 0 END) > 55 * sum(l.l_quantity))
      |ORDER BY s.s_name""".stripMargin

  def q20RecentShare(spark: SparkSession, dir: String): DataFrame =
    runSql(spark, dir, q20RecentShareSql,
      Seq("supplier", "lineitem", "part"))
}
