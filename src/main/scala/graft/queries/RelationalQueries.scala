package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryModule, Tables}

/** Relational analytics layer (SURVEY §7.1 step 7).
  *
  * The reference has no relational algebra (SURVEY §2.5) — these queries are
  * the analytics extension over the same data substrate, expressed purely as
  * declarative DataFrame plans so Catalyst applies pushdown, pruning, join
  * selection and AQE.
  *
  * Scale notes (100 TB design envelope):
  *  - only the FIXED-cardinality dimensions (region: 5 rows, nation: 25
  *    rows) carry an explicit `broadcast()` hint. customer/supplier/part
  *    grow with scale factor (TB-class at the 100 TB target), so their
  *    joins carry NO forced hint — AQE picks BroadcastHashJoin while the
  *    side fits `autoBroadcastJoinThreshold` and degrades to shuffled
  *    hash/sort-merge beyond it instead of OOMing the driver (the round-7
  *    doctrine, re-proven at 100x when ShingleIndex.probeFrames' forced
  *    broadcast OOM'd; see ADJUDICATIONS r15/r16);
  *  - aggregations are partial (map-side combine) by construction — plain
  *    `groupBy.agg` over codegen'd built-ins;
  *  - every query filters/prunes at the parquet scan (verified via
  *    `.explain("formatted")` → PushedFilters/ReadSchema).
  *
  * Cross-engine determinism: all money/quantity aggregations run in DECIMAL
  * (exact, order-independent) and cast to double only at output; summing
  * doubles directly would make the result depend on partition ordering and
  * never hash-match the DuckDB oracle. Ratios are computed as
  * double(exact_decimal) / long, which is a single deterministic FP op.
  */
object RelationalQueries extends QueryModule {
  private val dec2 = DecimalType(18, 2)

  private def d2(c: Column): Column = c.cast(dec2)

  /** DuckDB-side spelling of the same decimal cast. */
  private def od2(e: String): String = s"CAST($e AS DECIMAL(18,2))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- q1: wide aggregate with map-side combine (TPC-H Q1 analog) ---
    "q1_agg" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(d2($"l_quantity")).cast("double").as("sum_qty"),
          sum(d2($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(d2($"l_extendedprice") * (d2(lit(1)) - d2($"l_discount"))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // --- q2: 5-way star join, small dims broadcast (TPC-H Q5 analog) ---
    "q2_join5" -> { (s, dir) =>
      import s.implicits._
      val customer = Tables.load(s, dir, "customer")
      val orders = Tables.load(s, dir, "orders")
      val lineitem = Tables.load(s, dir, "lineitem")
      val nation = Tables.load(s, dir, "nation")
      val region = Tables.load(s, dir, "region").filter($"r_name" === "ASIA")
      lineitem
        .join(orders, $"l_orderkey" === $"o_orderkey")
        .join(customer, $"o_custkey" === $"c_custkey")
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum(d2($"l_extendedprice") * (d2(lit(1)) - d2($"l_discount"))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // --- q3: top-N by computed revenue (TPC-H Q3 analog) ---
    "q3_topn" -> { (s, dir) =>
      import s.implicits._
      val orders = Tables.load(s, dir, "orders").filter($"o_orderdate" < to_timestamp(lit("1998-01-01 00:00:00")))
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" > to_timestamp(lit("1998-01-01 00:00:00")))
        .join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(sum(d2($"l_extendedprice") * (d2(lit(1)) - d2($"l_discount"))).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    },

    // --- q4: window functions — rank + running sum per partition ---
    "q4_window" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.load(s, dir, "customer")
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("running_bal", sum(d2($"c_acctbal")).over(w).cast("double"))
        .filter($"rnk" <= 3)
        .select($"c_nationkey", $"c_custkey", $"rnk", $"running_bal")
    },

    // --- q5: EXISTS → left-semi join ---
    "q5_semijoin" -> { (s, dir) =>
      import s.implicits._
      val fOrders = Tables.load(s, dir, "orders").filter($"o_orderstatus" === "F")
      Tables.load(s, dir, "customer")
        .join(fOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
    },

    // --- q6: selective filter + scalar aggregate (TPC-H Q6 analog;
    //     predicate pushes to the parquet scan) ---
    "q6_filter" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          $"l_shipdate" < to_timestamp(lit("1997-01-01 00:00:00")) &&
          $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .agg(sum(d2($"l_extendedprice") * d2($"l_discount")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // --- q7: set operation (INTERSECT distinct-semantics) ---
    "q7_setop" -> { (s, dir) =>
      import s.implicits._
      val building = Tables.load(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k"))
      val openOrders = Tables.load(s, dir, "orders")
        .filter($"o_orderstatus" === "O").select($"o_custkey".as("k"))
      building.intersect(openOrders)
    },

    // --- q8: multi-column distinct aggregation ---
    "q8_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_suppkey").as("n_suppliers"),
          countDistinct($"l_partkey").as("n_parts"),
          count(lit(1)).as("n_rows"))
    },

    // --- q9: HAVING + exact-decimal average ---
    "q9_having" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "customer")
        .groupBy($"c_nationkey")
        .agg((sum(d2($"c_acctbal")).cast("double") / count(lit(1))).as("avg_bal"),
          count(lit(1)).as("n_cust"))
        .filter($"n_cust" > 20)
    },

    // --- q10: conditional (CASE) aggregation ---
    "q10_case" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          sum(when($"o_totalprice" > 200000, 1).otherwise(0)).as("n_big"),
          sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("n_finished"),
          count(lit(1)).as("n"))
    },

    // --- q11: scalar subquery (uncorrelated) — parts above mean price ---
    "q11_subquery" -> { (s, dir) =>
      import s.implicits._
      val part = Tables.load(s, dir, "part")
      // SUM over an empty table is NULL (getDouble would abort); the
      // placeholder can be anything — no row exists to pass the filter
      val avgRow = part.agg((sum(d2($"p_retailprice")).cast("double") / count(lit(1))).as("a"))
        .head()
      val avgPrice = if (avgRow.isNullAt(0)) 0.0 else avgRow.getDouble(0)
      part.filter($"p_retailprice" > avgPrice)
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_above"),
          max($"p_retailprice").as("max_price"))
    },

    // --- q12: NOT EXISTS → left-anti join ---
    "q12_antijoin" -> { (s, dir) =>
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      Tables.load(s, dir, "customer")
        .join(orders, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_nationkey")
    },

    // --- q13: join + grouped sort with multiple aggregates (supplier side) ---
    "q13_suppagg" -> { (s, dir) =>
      import s.implicits._
      val supplier = Tables.load(s, dir, "supplier")
      val nation = Tables.load(s, dir, "nation")
      Tables.load(s, dir, "lineitem")
        .join(supplier, $"l_suppkey" === $"s_suppkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sum(d2($"l_quantity")).cast("double").as("total_qty"),
          countDistinct($"l_suppkey").as("n_suppliers"))
    },

    // --- q14: grouped join between two fact aggregates (orders-per-customer
    //     distribution; TPC-H Q13 analog exercising outer join + re-agg) ---
    "q14_custdist" -> { (s, dir) =>
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      Tables.load(s, dir, "customer")
        .join(orders, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
    },

    // --- q15: hierarchical ROLLUP aggregation (subtotals + grand total) ---
    "q15_rollup" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(d2($"l_quantity")).cast("double").as("sum_qty"))
    },

    // --- q17: correlated-aggregate filter (TPC-H Q17 analog): lineitems
    //     below 20% of their part's mean quantity. The correlation is
    //     decorrelated by hand into a per-part aggregate + broadcast-able
    //     join, which is exactly what Catalyst's decorrelator would emit. ---
    "q17_avgqty" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val perPart = li.groupBy($"l_partkey".as("pk"))
        .agg((sum(d2($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"))
      li.join(perPart, $"l_partkey" === $"pk")
        .filter($"l_quantity" < $"avg_qty" * 0.2)
        .agg(sum(d2($"l_extendedprice")).cast("double").as("total_price"),
          count(lit(1)).as("n"))
    },

    // --- q18: large-volume orders (TPC-H Q18 analog): HAVING over a fact
    //     aggregate, joined back to dimensions ---
    "q18_bigorders" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val big = li.groupBy($"l_orderkey")
        .agg(sum(d2($"l_quantity")).cast("double").as("total_qty"))
        .filter($"total_qty" > 150)
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
      big.join(orders, $"l_orderkey" === $"o_orderkey")
        .join(customer, $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"total_qty")
    },

    // --- q19: disjunctive multi-clause predicate join (TPC-H Q19 analog:
    //     OR-of-ANDs that must not block the join pushdown) ---
    "q19_disjunct" -> { (s, dir) =>
      import s.implicits._
      val part = Tables.load(s, dir, "part")
      val li = Tables.load(s, dir, "lineitem")
      li.join(part, $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#1" && $"p_size" <= 15 && $"l_quantity" >= 1 && $"l_quantity" <= 20) ||
          ($"p_brand" === "Brand#3" && $"p_size" <= 30 && $"l_quantity" >= 10 && $"l_quantity" <= 40))
        .agg(sum(d2($"l_extendedprice") * (d2(lit(1)) - d2($"l_discount"))).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // --- q20: nested semi-join chain (TPC-H Q20 analog: suppliers of
    //     parts that appear in large lineitems) ---
    "q20_nestsemi" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem").filter($"l_quantity" > 45)
      val parts = Tables.load(s, dir, "part").filter($"p_size" > 40)
        .join(li, $"p_partkey" === $"l_partkey", "left_semi")
      val suppliers = Tables.load(s, dir, "supplier")
        .join(
          Tables.load(s, dir, "lineitem").join(parts, $"l_partkey" === $"p_partkey", "left_semi"),
          $"s_suppkey" === $"l_suppkey", "left_semi")
      suppliers.select($"s_suppkey", $"s_name")
    },

    // --- q21: sole-late-supplier (TPC-H Q21 analog). The synthetic schema
    //     has no receipt/commit dates, so "late" := shipped more than 90
    //     days after the order date. The correlated EXISTS / NOT EXISTS
    //     pair is hand-decorrelated into one per-order aggregate
    //     (n_supp > 1 ∧ exactly one late supplier) — a single extra
    //     shuffle on l_orderkey instead of two correlated self-joins. ---
    "q21_waiting" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val orders = Tables.load(s, dir, "orders").filter($"o_orderstatus" === "F")
      val li = Tables.load(s, dir, "lineitem")
        .join(orders, $"l_orderkey" === $"o_orderkey")
        .withColumn("late", $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      // per-order supplier counts as WINDOWS over the same frame instead
      // of an aggregate joined back (r17 optimization — the dedup_best_keep
      // doctrine): the agg-then-join-back spelling re-executed the
      // lineitem⋈orders join once per side, and both window specs ride
      // the one l_orderkey exchange. size(collect_set(...)) ≡
      // countDistinct per group; the when(late, ...) NULLs drop from the
      // set exactly as they did from countDistinct.
      val w = Window.partitionBy($"l_orderkey")
      li.withColumn("n_supp", size(collect_set($"l_suppkey").over(w)).cast("long"))
        .withColumn("n_late_supp",
          size(collect_set(when($"late", $"l_suppkey")).over(w)).cast("long"))
        .filter($"late" && $"n_supp" > 1 && $"n_late_supp" === 1)
        .join(Tables.load(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(100)
    },

    // --- q22: inactive rich customers by "country" (TPC-H Q22 analog; the
    //     synthetic customer has no phone, so nationkey plays the country
    //     code). Scalar subquery (positive-balance mean) + anti-join. ---
    "q22_custsale" -> { (s, dir) =>
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      // no positive balances ⇒ SUM is NULL ⇒ SQL's `x > NULL` keeps
      // nothing; the 0.0 placeholder keeps nothing too (no balance > 0
      // exists in that case), so the engines agree without the abort
      val avgRow = cust.filter($"c_acctbal" > 0)
        .agg((sum(d2($"c_acctbal")).cast("double") / count(lit(1))).as("a"))
        .head()
      val avgBal = if (avgRow.isNullAt(0)) 0.0 else avgRow.getDouble(0)
      cust.filter($"c_acctbal" > avgBal)
        .join(Tables.load(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(d2($"c_acctbal")).cast("double").as("totacctbal"))
    },

    // --- q23: CUBE grouping sets (all 4 combinations of the two keys;
    //     rollup's lattice sibling — one pass, partial-agg expanded) ---
    "q23_cube" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(d2($"l_quantity")).cast("double").as("sum_qty"))
    },

    // --- q24: distribution window functions (ntile quartiles,
    //     percent_rank, cume_dist) over a unique ordering. The ratios are
    //     emitted RAW: both engines compute the same single integer
    //     division in IEEE double (bit-identical), whereas round(x, 6)
    //     diverges on exact decimal half-ties (e.g. 41/640 = 0.0640625 —
    //     Spark rounds the shortest decimal string HALF_UP, DuckDB rounds
    //     the binary double, which sits just below the tie). ---
    "q24_distribution" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
      Tables.load(s, dir, "customer")
        .select($"c_nationkey", $"c_custkey",
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
    },

    // --- q25: EXCEPT (distinct set difference; INTERSECT's sibling q7) ---
    "q25_except" -> { (s, dir) =>
      import s.implicits._
      val withOrders = Tables.load(s, dir, "orders").select($"o_custkey".as("k"))
      val withFinished = Tables.load(s, dir, "orders")
        .filter($"o_orderstatus" === "F").select($"o_custkey".as("k"))
      withOrders.except(withFinished)
    },

    // --- q16: FULL OUTER join of two independent aggregates ---
    "q16_fullouter" -> { (s, dir) =>
      import s.implicits._
      val custByNation = Tables.load(s, dir, "customer")
        .groupBy($"c_nationkey".as("nationkey")).agg(count(lit(1)).as("n_cust"))
      val suppByNation = Tables.load(s, dir, "supplier")
        .groupBy($"s_nationkey".as("nationkey")).agg(count(lit(1)).as("n_supp"))
      custByNation.as("c").join(suppByNation.as("s"),
          $"c.nationkey" === $"s.nationkey", "full_outer")
        .select(coalesce($"c.nationkey", $"s.nationkey").as("nationkey"),
          coalesce($"n_cust", lit(0L)).as("n_cust"),
          coalesce($"n_supp", lit(0L)).as("n_supp"))
    }
  )

  private val disc = s"${od2("l_extendedprice")} * (${od2("1")} - ${od2("l_discount")})"

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(${od2("l_quantity")}) AS DOUBLE) AS sum_qty,
         |  CAST(sum(${od2("l_extendedprice")}) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($disc) AS DOUBLE) AS sum_disc_price,
         |  count(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_join5" ->
      s"""SELECT n_name, CAST(sum($disc) AS DOUBLE) AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name""".stripMargin,

    "q3_topn" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(sum($disc) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q4_window" ->
      s"""SELECT c_nationkey, c_custkey, rnk, running_bal FROM (
         |  SELECT c_nationkey, c_custkey,
         |    rank() OVER w AS rnk,
         |    CAST(sum(${od2("c_acctbal")}) OVER w AS DOUBLE) AS running_bal
         |  FROM customer
         |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
         |) WHERE rnk <= 3""".stripMargin,

    "q5_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,

    "q6_filter" ->
      s"""SELECT CAST(sum(${od2("l_extendedprice")} * ${od2("l_discount")}) AS DOUBLE) AS revenue,
         |  count(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q7_setop" ->
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'""".stripMargin,

    "q8_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_suppliers,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q9_having" ->
      s"""SELECT c_nationkey,
         |  CAST(sum(${od2("c_acctbal")}) AS DOUBLE) / count(*) AS avg_bal,
         |  count(*) AS n_cust
         |FROM customer GROUP BY c_nationkey HAVING count(*) > 20""".stripMargin,

    "q10_case" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q11_subquery" ->
      s"""SELECT p_brand, count(*) AS n_above, max(p_retailprice) AS max_price
         |FROM part
         |WHERE p_retailprice > (SELECT CAST(sum(${od2("p_retailprice")}) AS DOUBLE) / count(*) FROM part)
         |GROUP BY p_brand""".stripMargin,

    "q12_antijoin" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q13_suppagg" ->
      s"""SELECT n_name,
         |  CAST(sum(${od2("l_quantity")}) AS DOUBLE) AS total_qty,
         |  count(DISTINCT l_suppkey) AS n_suppliers
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name""".stripMargin,

    "q14_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |) GROUP BY c_count""".stripMargin,

    "q15_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  CAST(sum(${od2("l_quantity")}) AS DOUBLE) AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q17_avgqty" ->
      s"""SELECT CAST(sum(${od2("l_extendedprice")}) AS DOUBLE) AS total_price, count(*) AS n
         |FROM lineitem JOIN (
         |  SELECT l_partkey AS pk,
         |    CAST(sum(${od2("l_quantity")}) AS DOUBLE) / count(*) AS avg_qty
         |  FROM lineitem GROUP BY l_partkey
         |) ON l_partkey = pk
         |WHERE l_quantity < avg_qty * 0.2""".stripMargin,

    "q18_bigorders" ->
      s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
         |FROM (
         |  SELECT l_orderkey, CAST(sum(${od2("l_quantity")}) AS DOUBLE) AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING CAST(sum(${od2("l_quantity")}) AS DOUBLE) > 150
         |) JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q19_disjunct" ->
      s"""SELECT CAST(sum($disc) AS DOUBLE) AS revenue, count(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity >= 1 AND l_quantity <= 20)
         |   OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity >= 10 AND l_quantity <= 40)""".stripMargin,

    "q20_nestsemi" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (
        |    SELECT p_partkey FROM part
        |    WHERE p_size > 40 AND p_partkey IN (
        |      SELECT l_partkey FROM lineitem WHERE l_quantity > 45)))""".stripMargin,

    "q21_waiting" ->
      """WITH li AS (
        |  SELECT l.*, o.o_orderdate,
        |    l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
        |  FROM lineitem l JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F')
        |SELECT s_name, count(*) AS numwait
        |FROM li l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.late
        |  AND EXISTS (SELECT 1 FROM li l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM li l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q22_custsale" ->
      s"""SELECT c_nationkey, count(*) AS numcust,
         |  CAST(sum(${od2("c_acctbal")}) AS DOUBLE) AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (
         |    SELECT CAST(sum(${od2("c_acctbal")}) AS DOUBLE) / count(*)
         |    FROM customer WHERE c_acctbal > 0)
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY c_nationkey""".stripMargin,

    "q23_cube" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
         |  CAST(sum(${od2("l_quantity")}) AS DOUBLE) AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    "q24_distribution" ->
      """SELECT c_nationkey, c_custkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""".stripMargin,

    "q25_except" ->
      """SELECT o_custkey AS k FROM orders
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    "q16_fullouter" ->
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c.nationkey = s.nationkey""".stripMargin
  )
}
