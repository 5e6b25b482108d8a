package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

/** Temporal join suite: as-of join and bucketed range join over the
  * driver's orders × events tables, each against an ANSI-SQL DuckDB
  * oracle. The oracle spells both as inequality joins (fine at SF 0.01,
  * nested-loop-shaped at scale); the Spark side runs the merge / bucketed
  * shapes from [[graft.operators.TemporalJoins]] — same rows, scalable
  * plan.
  */
object QueriesTemporal {

  import QueriesRelational.centsSql

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private val WeekUs = 7L * 86400L * 1000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // as-of join: each order matched to the latest same-user event at or
    // before the order date (ties by event_id desc); merge shape — one
    // union + one window, no inequality join
    "q77_asof_join" -> ((s, d) => {
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val events = t(s, d, "events")
        .select("user_id", "ts", "event_id", "value")
      TemporalJoins.asofBackward(
          orders, events,
          leftKey = "o_custkey", rightKey = "user_id",
          leftTs = "o_orderdate", rightTs = "ts",
          payload = Seq("event_id", "ts", "value"), tiebreak = "event_id")
        .select(col("o_orderkey"), col("o_custkey"),
          col("event_id").as("match_event_id"),
          unix_micros(col("ts").cast("timestamp")).as("match_ts_us"),
          expr(centsSql("value")).as("match_value_c"))
    }),

    // bucketed range join: per order, count + sum of same-user events in
    // [o_orderdate, o_orderdate + 7 days); the range predicate lives in
    // the equi-join condition (cell = week bucket), not a post-filter
    "q78_range_join" -> ((s, d) => {
      val orders = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("start_us"))
      val events = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          expr(centsSql("value")).as("value_c"))
      TemporalJoins.rangeJoinAgg(
        orders, events,
        leftKey = "o_custkey", rightKey = "user_id",
        leftStartUs = "start_us", rightTsUs = "ts_us",
        lenUs = WeekUs, bucketUs = WeekUs,
        leftId = Seq("o_orderkey"),
        aggs = Seq(
          count(col("event_id")).as("n_events"),
          coalesce(sum(col("value_c")), lit(0L)).as("sum_value_c")))
    }))

  val oracles: Map[String, String] = Map(
    "q77_asof_join" ->
      """WITH m AS (
        |  SELECT o.o_orderkey, e.event_id, e.ts, e.value,
        |         ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
        |           ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM orders o JOIN events e
        |    ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        |)
        |SELECT o.o_orderkey, o.o_custkey,
        |       m.event_id AS match_event_id,
        |       epoch_us(m.ts) AS match_ts_us,
        |       CAST(FLOOR(m.value * 100 + 0.5) AS BIGINT) AS match_value_c
        |FROM orders o
        |LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        |  ON m.o_orderkey = o.o_orderkey""".stripMargin,

    "q78_range_join" ->
      """SELECT o.o_orderkey,
        |       COUNT(e.event_id) AS n_events,
        |       CAST(COALESCE(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)), 0)
        |            AS BIGINT) AS sum_value_c
        |FROM orders o LEFT JOIN events e
        |  ON e.user_id = o.o_custkey
        | AND e.ts >= o.o_orderdate
        | AND e.ts < o.o_orderdate + INTERVAL 7 DAY
        |GROUP BY o.o_orderkey""".stripMargin)
}
