package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks as built-ins, expressed in the
  * shapes that survive 100 TB.
  *
  * == As-of join ==
  *
  * `asofBackward` matches each left row to the single right row with the
  * greatest `rightTs <= leftTs` for the same key (ties on `rightTs`
  * broken by the caller-named tiebreak column, larger wins — so the
  * result is a pure function of the data, never of partitioning).
  *
  * Scale shape: the classic *merge* formulation, NOT an inequality join.
  * Both sides are tagged and unioned, then a single
  * `Window.partitionBy(key).orderBy(ts, side, tiebreak)` running
  * `last(payload, ignoreNulls)` carries the most recent right payload
  * forward onto each left row. Cost = one shuffle of |L|+|R| rows and a
  * per-key sort — no row explosion, no O(|L|·|R|/keys) nested-loop
  * probes, and Catalyst plans it as Exchange + Sort + Window inside
  * whole-stage codegen. An inequality-join formulation
  * (`l.key = r.key AND r.ts <= l.ts` + row_number) materialises every
  * (left, earlier-right) pair before ranking: quadratic per hot key,
  * which is exactly the key distribution web-crawl timelines have.
  * A per-key timeline that is itself too large for one task would
  * need range re-bucketing with boundary carry-over; at 10^12 rows the
  * key (url / user) cardinality grows with the data, so per-key
  * timelines stay small — documented, not implemented.
  *
  * == Range join ==
  *
  * `rangeJoinAgg` aggregates, per left interval `[start, start+len)`,
  * the right rows of the same key whose ts falls inside the interval.
  *
  * Scale shape: *bucketed* equi-join. Timestamps are floored to
  * `bucketUs`-wide cells; each left interval explodes to the <= 2 cells
  * it can overlap (`len <= bucketUs`), the join runs as a plain
  * equi-join on (key, cell) — hash-partitionable, AQE-skew-splittable —
  * and the exact `[start, start+len)` predicate filters the cell-mates
  * afterwards. The inequality-join spelling DuckDB runs as the oracle
  * is a nested-loop per key pair; fine at SF 0.01, fatal at 10^12 rows.
  */
object TemporalJoins {

  /** For each left row: the latest right payload with
    * `right(rightTs) <= left(leftTs)` on `leftKey = rightKey`, or null
    * payload fields if no right row precedes it (left-outer semantics).
    *
    * @param payload    right columns to carry onto the match
    * @param tiebreak   right column breaking equal-ts ties (larger wins)
    * @return left columns + payload columns (null when unmatched)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: String): DataFrame = {
    val leftStruct = left.schema
    val payloadStruct = right.selectExpr(payload: _*).schema
    val tbType = right.schema(tiebreak).dataType

    val rU = right.select(
      col(rightKey).as("__k"),
      col(rightTs).as("__t"),
      lit(0).as("__side"),
      col(tiebreak).cast(tbType).as("__tb"),
      lit(null).cast(leftStruct).as("__l"),
      struct(payload.map(col): _*).as("__p"))
    val lU = left.select(
      col(leftKey).as("__k"),
      col(leftTs).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(tbType).as("__tb"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(payloadStruct).as("__p"))

    // Right rows sort BEFORE a left row at the same ts (side 0 < 1), so
    // `<=` semantics fall out of the frame bound; among right rows at an
    // equal ts the largest tiebreak sorts last and wins `last()`.
    val w = Window
      .partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rU.unionByName(lU)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Per left interval `[leftStart, leftStart + lenUs)`: aggregate the
    * same-key right rows inside the interval. The exact range predicate
    * is part of the JOIN CONDITION (not a post-filter), so a left row
    * whose cell-mates all fall outside its interval still emits one
    * null-right row — left-outer semantics like the SQL
    * `LEFT JOIN ... ON range GROUP BY`. A left interval straddling two
    * cells can emit up to two null-right rows when unmatched, so `aggs`
    * must be null-safe over right columns (`count(rightCol)`, never
    * `count(*)`).
    *
    * @param leftStartUs  left column, interval start in epoch micros
    * @param rightTsUs    right column, event time in epoch micros
    * @param lenUs        interval length (micros); must be <= bucketUs
    * @param bucketUs     bucket width (micros)
    * @param leftId       left grouping columns (carried to the output)
    * @param aggs         null-safe aggregate columns over the right payload
    */
  def rangeJoinAgg(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftStartUs: String,
      rightTsUs: String,
      lenUs: Long,
      bucketUs: Long,
      leftId: Seq[String],
      aggs: Seq[Column]): DataFrame = {
    require(lenUs <= bucketUs,
      s"interval length $lenUs exceeds bucket width $bucketUs: a left " +
        "interval must overlap at most 2 buckets (widen bucketUs)")
    // integer DIV, not floor(double /): epoch micros sit near 2^53 where
    // double division would round the cell id
    val lB = left.withColumn(
      "__cell",
      explode(sequence(
        expr(s"$leftStartUs DIV ${bucketUs}L"),
        expr(s"($leftStartUs + ${lenUs - 1}L) DIV ${bucketUs}L"))))
    val rB = right.withColumn("__cell", expr(s"$rightTsUs DIV ${bucketUs}L"))
    lB.join(rB,
        lB(leftKey) === rB(rightKey) && lB("__cell") === rB("__cell") &&
          rB(rightTsUs) >= lB(leftStartUs) &&
          rB(rightTsUs) < lB(leftStartUs) + lenUs,
        "left_outer")
      .groupBy(leftId.map(c => lB(c)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
