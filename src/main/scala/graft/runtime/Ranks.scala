package graft.runtime

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Two-phase global ranking/cumsum — the scale-safe replacement for
  * un-partitioned `Window.orderBy` (which moves ALL rows to a single
  * partition: fine at test SF, an OOM at 100 TB; the round-1 bench log
  * was full of `WindowExec: No Partition Defined` warnings).
  *
  * Phase 1: `repartitionByRange` on the sort key (range exchange — each
  * partition holds a contiguous key range, partitions ordered by id),
  * `sortWithinPartitions`, then ONE `mapPartitions` scan appends the
  * partition id and the partition-local running state (row number /
  * running sum / group-start rank). A `Window.partitionBy(pid)` would
  * compute the same values but costs an extra full-frame hash exchange
  * (RangePartitioning does not satisfy the window's clustered
  * distribution — measured, not guessed); the scan keeps the frame where
  * the range exchange put it.
  * Phase 2: per-partition totals (≤ shuffle-partitions rows) are
  * collected, turned into cumulative offsets, and added back as a
  * map-literal projection — no second shuffle, no single-partition
  * stage.
  *
  * Callers must make the sort key a TOTAL order (append a unique
  * tie-break column) — ties split across a range boundary would
  * otherwise get arbitrary relative ranks.
  *
  * The intermediate (pid, local-state) frame is localCheckpoint'd so the
  * range partitioner's sampled boundaries cannot differ between the
  * offset-collect job and the final job.
  */
object Ranks {

  /** Range-exchange + in-partition sort + ONE sequential scan appending
    * `append` fields. `make` is invoked once per partition (capture the
    * running state there) and returns the per-row appended values, in
    * `append` order.
    */
  private def sortedScan(
      df: DataFrame, order: Seq[Column], append: Seq[StructField])(
      make: StructType => Row => Seq[Any]): DataFrame = {
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val inSchema = sorted.schema
    val outSchema = StructType(inSchema.fields ++ append)
    sorted.mapPartitions { it =>
      val f = make(inSchema)
      it.map(r => Row.fromSeq(r.toSeq ++ f(r)))
    }(Encoders.row(outSchema))
  }

  private val pidField = StructField("__pid", IntegerType, nullable = false)

  /** Append a global row number (`startAt`, `startAt`+1, …) in `order`. */
  def withGlobalRowNumber(
      df: DataFrame, order: Seq[Column], out: String,
      startAt: Long = 1L): DataFrame = {
    val local = sortedScan(df, order,
      Seq(pidField, StructField("__lrn", LongType, nullable = false))) { _ =>
      val pid = TaskContext.getPartitionId()
      var n = 0L
      _ => { n += 1L; Seq[Any](pid, n) }
    }.localCheckpoint(true)
    val counts = local.groupBy("__pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    val offsets: Map[Int, Long] = counts.map { case (p, n) =>
      val o = p -> cum; cum += n; o
    }.toMap
    if (offsets.isEmpty) df.withColumn(out, lit(startAt)).limit(0)
    else local
      .withColumn(out,
        col("__lrn") + element_at(typedLit(offsets), col("__pid")) +
          lit(startAt - 1L))
      .drop("__pid", "__lrn")
  }

  /** Append a running cumulative sum of `value` in `order` (inclusive of
    * the current row), as double.
    */
  def withGlobalCumsum(
      df: DataFrame, order: Seq[Column], value: Column, out: String): DataFrame = {
    val local = sortedScan(df.withColumn("__v", value.cast("double")), order,
      Seq(pidField, StructField("__lcs", DoubleType, nullable = true))) { s =>
      val vi = s.fieldIndex("__v")
      val pid = TaskContext.getPartitionId()
      var any = false
      var run = 0.0
      r => {
        if (!r.isNullAt(vi)) { run += r.getDouble(vi); any = true }
        Seq[Any](pid, if (any) run else null)
      }
    }.localCheckpoint(true)
    val sums = local.groupBy("__pid").agg(sum("__v").as("s"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
      .sortBy(_._1)
    var cum = 0.0
    val offsets: Map[Int, Double] = sums.map { case (p, s) =>
      val o = p -> cum; cum += s; o
    }.toMap
    if (offsets.isEmpty) df.withColumn(out, lit(0.0)).limit(0)
    else local
      .withColumn(out, col("__lcs") + element_at(typedLit(offsets), col("__pid")))
      .drop("__pid", "__lcs", "__v")
  }

  /** Exact-integer sibling of [[withGlobalCumsum]]: running sum of a
    * LONG `value` in `order`, inclusive of the current row. Same
    * two-phase shape (range exchange + one in-partition scan + collected
    * per-partition offsets); exact at any magnitude a long holds, so
    * downstream integer arithmetic (token packing bins) is
    * order-independent.
    */
  def withGlobalCumsumLong(
      df: DataFrame, order: Seq[Column], value: Column, out: String): DataFrame = {
    val local = sortedScan(df.withColumn("__v", value.cast("long")), order,
      Seq(pidField, StructField("__lcs", LongType, nullable = true))) { s =>
      val vi = s.fieldIndex("__v")
      val pid = TaskContext.getPartitionId()
      var any = false
      var run = 0L
      r => {
        if (!r.isNullAt(vi)) { run += r.getLong(vi); any = true }
        Seq[Any](pid, if (any) run else null)
      }
    }.localCheckpoint(true)
    val sums = local.groupBy("__pid").agg(sum("__v").as("s"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    var cum = 0L
    val offsets: Map[Int, Long] = sums.map { case (p, s) =>
      val o = p -> cum; cum += s; o
    }.toMap
    if (offsets.isEmpty) df.withColumn(out, lit(0L)).limit(0)
    else local
      .withColumn(out, col("__lcs") + element_at(typedLit(offsets), col("__pid")))
      .drop("__pid", "__lcs", "__v")
  }

  /** Keep the top `keepPpm`-millionths of each group's rows under
    * `order` (the caller appends a unique tie-break column): the
    * per-group rank is the GLOBAL two-phase row number over
    * (group, order…) minus each group's min row number — computed from
    * the frame itself, so no assumption about driver-side vs engine
    * collation — which lets a mega-group span many range partitions
    * instead of serialising into one `Window.partitionBy(group)` task.
    * Emits every row with its per-group `rank` and a `kept` flag
    * (rank ≤ ceil(n_g · keepPpm / 10⁶), exact integer ceiling). Driver
    * state = O(#groups) longs, the same contract as a broadcast join.
    */
  def topFractionPerGroup(
      df: DataFrame, grpCol: String, order: Seq[Column], keepPpm: Long,
      rankOut: String = "rank", keptOut: String = "kept"): DataFrame = {
    val rn = withGlobalRowNumber(df, col(grpCol).asc +: order, "__grn")
      .localCheckpoint(true) // feeds the per-group stats AND the output
    val stats = rn.groupBy(grpCol)
      .agg((min("__grn") - 1L).as("base"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val baseMap: Map[String, Long] = stats.map(s => s._1 -> s._2).toMap
    val keepMap: Map[String, Long] = stats.map { case (g, _, n) =>
      g -> ((n * keepPpm + 999999L) / 1000000L)
    }.toMap
    if (baseMap.isEmpty)
      rn.withColumn(rankOut, lit(1L)).withColumn(keptOut, lit(0L))
        .drop("__grn").limit(0)
    else rn
      .withColumn(rankOut,
        col("__grn") - element_at(typedLit(baseMap), col(grpCol)))
      .withColumn(keptOut,
        when(col(rankOut) <= element_at(typedLit(keepMap), col(grpCol)),
          1L).otherwise(0L))
      .drop("__grn")
  }

  /** Group-min global row number over a TWO-LONG-COLUMN key in ONE range
    * exchange — the rank-densify step of the prefix-doubling suffix sort
    * (`text.SuffixArray`), where the naive form (global row_number +
    * groupBy(k1,k2).min + join back) costs two extra shuffles of the
    * full frame per round.
    *
    * Shape: range exchange on (k1, k2, tie…) + ONE in-partition scan
    * (row number, group-start flag, running group-start rank — the same
    * sortedScan that backs every helper here, so no window and no
    * second full-frame exchange), then per-partition boundary stats
    * (count, first/last key, last group start, start count — O(#parts)
    * rows) are collected and chained on the driver so groups SPANNING
    * partition boundaries (equal (k1,k2) split by the tie columns) get
    * the true group-min rank via a carry map. Returns (df + out column,
    * allDistinct = every group is a singleton) — the doubling loop's
    * convergence signal, free from the same stats.
    *
    * `tie` must make (k1, k2, tie…) a total order.
    */
  def withPairGroupMinRank(
      df: DataFrame, k1: String, k2: String, tie: Seq[Column],
      out: String, gen: Option[CheckpointGen] = None): (DataFrame, Boolean) =
    withGroupMinRank(df, Seq(k1, k2), tie, out, gen)

  /** [[withPairGroupMinRank]] generalized to 2..4 long key columns —
    * one range exchange ranks a 32-byte packed prefix (4 words) exactly
    * like the 16-byte pair, so the suffix sort's init covers two more
    * doubling widths for free. `rnOut`, when set, additionally emits the
    * GLOBAL row number of the scan order (off(pid) + local rn) — free
    * from the same pass, and equal to row_number() OVER (ORDER BY keys…,
    * tie…); the suffix sort's final rank is exactly that number of its
    * last densify, so emitting it here removes the closing full-frame
    * row-number exchange.
    */
  def withGroupMinRank(
      df: DataFrame, keys: Seq[String], tie: Seq[Column],
      out: String, gen: Option[CheckpointGen] = None,
      rnOut: Option[String] = None): (DataFrame, Boolean) = {
    require(keys.nonEmpty && keys.length <= 4, s"1..4 keys, got ${keys.length}")
    val order = keys.map(col(_).asc) ++ tie
    val local0 = sortedScan(df, order, Seq(pidField,
      StructField("__lrn", LongType, nullable = false),
      StructField("__new", BooleanType, nullable = false),
      StructField("__gs", LongType, nullable = false))) { s =>
      val idx = keys.map(s.fieldIndex).toArray
      val k = idx.length
      val pid = TaskContext.getPartitionId()
      var n = 0L
      var gs = 0L
      val pk = new Array[Long](k)
      r => {
        n += 1L
        var isNew = n == 1L
        var i = 0
        while (i < k) {
          val v = r.getLong(idx(i))
          if (v != pk(i)) isNew = true
          pk(i) = v
          i += 1
        }
        if (isNew) gs = n
        Seq[Any](pid, n, isNew, gs)
      }
    }
    // loop callers rotate this checkpoint so superseded generations are
    // released (CheckpointGen contract); one-shot callers keep the plain
    // eager checkpoint
    val local = gen.map(_.rotate(local0)).getOrElse(local0.localCheckpoint(true))
    val keyStruct = struct(keys.map(col): _*)
    val stats = local.groupBy("__pid").agg(
      count(lit(1)).as("n"),
      min_by(keyStruct, col("__lrn")).as("fk"),
      max_by(keyStruct, col("__lrn")).as("lk"),
      max(when(col("__new"), col("__lrn"))).as("lastStart"),
      sum(when(col("__new"), 1L).otherwise(0L)).as("nStarts"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        keys.indices.map(r.getStruct(2).getLong).toSeq,
        keys.indices.map(r.getStruct(3).getLong).toSeq,
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    if (stats.isEmpty)
      return (df.withColumn(out, lit(1L)).limit(0), true)
    var cum = 0L
    var prevLast: Option[Seq[Long]] = None
    var trueLastStart = 0L
    var totalStarts = 0L
    val offB = Map.newBuilder[Int, Long]
    val carryB = Map.newBuilder[Int, Long]
    for ((pid, n, fk, lk, lastStart, nStarts) <- stats) {
      offB += pid -> cum
      val continues = prevLast.contains(fk)
      if (continues) carryB += pid -> trueLastStart
      totalStarts += nStarts - (if (continues) 1L else 0L)
      trueLastStart =
        if (lastStart > 1L || !continues) cum + lastStart else trueLastStart
      prevLast = Some(lk)
      cum += n
    }
    val offsets = offB.result()
    val carries = carryB.result()
    val carry =
      if (carries.isEmpty) lit(null).cast("long")
      else element_at(typedLit(carries), col("__pid"))
    val withMin = local
      .withColumn(out,
        when(carry.isNotNull && col("__gs") === 1L, carry)
          .otherwise(col("__gs") +
            element_at(typedLit(offsets), col("__pid"))))
    val ranked = rnOut.fold(withMin) { rc =>
      withMin.withColumn(rc,
        col("__lrn") + element_at(typedLit(offsets), col("__pid")))
    }.drop("__pid", "__lrn", "__new", "__gs")
    (ranked, totalStarts == cum)
  }

  /** Dense ids (0, 1, …) for a TINY distinct set (group keys, tag ids):
    * an explicit repartition(1) + in-partition sort + monotonic id —
    * intentionally single-partition (the input is a handful of rows) and
    * window-free, so no "No Partition Defined" stage appears in any plan
    * (a constant partitionBy key would be folded away by Catalyst).
    *
    * CONTRACT: the caller guarantees the distinct set is tiny (group
    * keys, comp lists at fixture-forced thresholds — not data-scale
    * sets). A caller whose id set grows with the data needs a
    * distributed dense rank (two-phase row number) instead; the q120
    * gate's threshold-1 comp list is fixture-sized by construction.
    */
  def tinyDenseId(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    df.repartition(1)
      .sortWithinPartitions(order: _*)
      .withColumn(out, monotonically_increasing_id().cast("long"))
}
