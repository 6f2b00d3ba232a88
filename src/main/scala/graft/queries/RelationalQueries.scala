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
  * Cross-engine determinism note: all money/quantity aggregations run in
  * DECIMAL (exact, order-independent) and cast to double only at output;
  * summing doubles directly would make the result depend on partition
  * ordering and never hash-match the DuckDB oracle.
  */
object RelationalQueries extends QueryModule {
  private val dec2 = DecimalType(18, 2)

  private def d2(c: Column): Column = c.cast(dec2)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    }
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
