package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming suite: the events table replayed through
  * `readStream` → tumbling-window aggregation → memory sink, compared to
  * a batch oracle (the stream is bounded, so complete-mode output equals
  * the batch group-by; SURVEY.md §2.7 notes the reference itself is
  * batch-only — this is the graft's streaming-ingest path).
  */
object QueriesStream {

  @volatile private var counter = 0

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_stream_window" -> ((s, d) => {
      val path = s"$d/events.parquet"
      val schema = s.read.parquet(path).schema
      counter += 1
      val sinkName = s"q34_sink_$counter"
      // FileStreamSource wants a directory: stage a symlink to the file
      val dir = java.nio.file.Files.createTempDirectory("q34_events")
      java.nio.file.Files.createSymbolicLink(
        dir.resolve("events.parquet"), java.nio.file.Paths.get(path))
      val q = s.readStream
        .schema(schema)
        .parquet(dir.toString)
        .groupBy(window(col("ts"), "300 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr(QueriesRelational.centsSql("value"))).as("sum_cents"))
        .select(unix_micros(col("window.start").cast("timestamp")).as("bucket_us"),
          col("event_type"), col("n"), col("sum_cents"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(sinkName)
        .start()
      q.processAllAvailable()
      q.stop()
      // materialise before the stream's temp view goes away
      val out = s.table(sinkName).localCheckpoint(true)
      out
    }))

  val oracles: Map[String, String] = Map(
    "q34_stream_window" ->
      s"""SELECT (epoch_us(ts) - epoch_us(ts) % 300000000) AS bucket_us,
         |  event_type, COUNT(*) AS n,
         |  CAST(SUM(${QueriesRelational.centsSql("value")}) AS BIGINT) AS sum_cents
         |FROM events GROUP BY 1, 2""".stripMargin)
}
