package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator suite over the driver testdata (SURVEY.md §2.7),
  * each with a DuckDB oracle. Float-valued aggregations are integerised
  * per row (`FLOOR(x·scale + 0.5)` → BIGINT) *before* summing, so sums
  * are exact integers and engine-order-independent.
  */
object QueriesRelational {

  /** Shared cents/int-scaling fragment — identical in Spark SQL + DuckDB. */
  def centsSql(e: String): String = s"CAST(FLOOR(($e) * 100 + 0.5) AS BIGINT)"

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1-analog pushdown aggregation: scan + filter + hash agg
    "q01_agg_pushdown" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 5.0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(expr(centsSql("l_quantity"))).as("sum_qty_c"),
          sum(expr(centsSql("l_extendedprice"))).as("sum_price_c"),
          count(lit(1)).as("n"))),

    // fact ⋈ dim ⋈ dim with small-dim broadcast (C5-analog join+agg)
    "q02_join_agg" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(expr(centsSql("o_totalprice"))).as("sum_cents"))),

    // S3-analog left-semi join
    "q03_semi_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(
          t(s, d, "orders").filter(col("o_totalprice") > 200000.0)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select("c_custkey")),

    // D7-analog anti join
    "q04_anti_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(
          t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey")),

    // C11/S9-analog window rank (top-3 orders per customer)
    "q05_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("cents").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          expr(centsSql("o_totalprice")).as("cents"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
    }),

    // C7/D11-analog running cumulative sum
    "q06_window_cumsum" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          expr(centsSql("value")).as("cents"))
        .withColumn("run_cents", sum(col("cents")).over(w))
        .select("user_id", "event_id", "run_cents")
    }),

    // C12-analog global top-k with deterministic tie-break
    "q07_topk" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), expr(centsSql("o_totalprice")).as("cents"))
        .orderBy(col("cents").desc, col("o_orderkey").asc)
        .limit(50)),

    // S5-analog sorted-distinct semicolon concat per key
    "q08_concat_sorted" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(concat_ws(";", array_sort(collect_set(col("c_mktsegment"))))
          .as("segments"))),

    // latest-timestamp aggregation (way `ts` max, SURVEY §1.1)
    "q09_latest_ts" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(unix_micros(max(col("o_orderdate")).cast("timestamp")).as("last_ts_us"))),

    // S4-analog largest-relation-wins tag overwrite
    "q10_rel_overwrite" -> ((s, d) => {
      val counts = t(s, d, "lineitem")
        .groupBy("l_partkey", "l_suppkey").agg(count(lit(1)).as("n_members"))
      val w = Window.partitionBy("l_partkey")
        .orderBy(col("n_members").desc, col("l_suppkey").desc)
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_partkey"), col("l_suppkey").as("winner_suppkey"),
          col("n_members"))
    }))

  val oracles: Map[String, String] = Map(
    // NOTE: every SUM is wrapped in CAST(... AS BIGINT) — DuckDB returns
    // HUGEINT/int128 for BIGINT sums, which the driver's pandas-based hash
    // canonicalises differently from Spark's int64 (round-1 hash-fail root cause).
    "q01_agg_pushdown" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_c,
         |  CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_price_c,
         |  COUNT(*) AS n
         |FROM lineitem WHERE l_quantity > 5.0
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_join_agg" ->
      s"""SELECT n_name, COUNT(*) AS n_orders,
         |  CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS sum_cents
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name""".stripMargin,

    "q03_semi_join" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)""".stripMargin,

    "q04_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,

    "q05_window_rank" ->
      s"""SELECT o_custkey, o_orderkey, cents, rn FROM (
         |  SELECT o_custkey, o_orderkey, cents,
         |    ROW_NUMBER() OVER (PARTITION BY o_custkey
         |      ORDER BY cents DESC, o_orderkey ASC) AS rn
         |  FROM (SELECT o_custkey, o_orderkey,
         |          ${centsSql("o_totalprice")} AS cents FROM orders)
         |) WHERE rn <= 3""".stripMargin,

    "q06_window_cumsum" ->
      s"""SELECT user_id, event_id,
         |  CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
         |FROM (SELECT user_id, event_id, ts, ${centsSql("value")} AS cents
         |      FROM events)""".stripMargin,

    "q07_topk" ->
      s"""SELECT o_orderkey, ${centsSql("o_totalprice")} AS cents
         |FROM orders
         |ORDER BY cents DESC, o_orderkey ASC LIMIT 50""".stripMargin,

    "q08_concat_sorted" ->
      """SELECT n_name,
        |  string_agg(DISTINCT c_mktsegment, ';' ORDER BY c_mktsegment) AS segments
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q09_latest_ts" ->
      """SELECT o_custkey, epoch_us(MAX(o_orderdate)) AS last_ts_us
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "q10_rel_overwrite" ->
      """SELECT l_partkey, l_suppkey AS winner_suppkey, n_members FROM (
        |  SELECT l_partkey, l_suppkey, n_members,
        |    ROW_NUMBER() OVER (PARTITION BY l_partkey
        |      ORDER BY n_members DESC, l_suppkey DESC) AS rn
        |  FROM (SELECT l_partkey, l_suppkey, COUNT(*) AS n_members
        |        FROM lineitem GROUP BY l_partkey, l_suppkey)
        |) WHERE rn = 1""".stripMargin)
}
