package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's flagship smoke: default-config session (no
  * ANSI override — whatever the driver uses), call SparkEntry.entry,
  * check rows > 0.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.count()
    df.show(5, truncate = false)
    println(s"[entry-smoke] rows=$rows ansi=${spark.conf.get("spark.sql.ansi.enabled")}")
    assert(rows > 0, "entry must return rows")
    spark.stop()
  }
}
