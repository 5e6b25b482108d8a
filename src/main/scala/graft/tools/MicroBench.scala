package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: isolate raw shuffle/agg/join throughput at two
  * parallelism levels to locate the local-mode scaling wall.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("MB_ROWS", "20000000").toLong
    val cpuList = sys.env.getOrElse("MB_CPUS", "8,32").split(",").toSeq.map(_.trim.toInt)
    for (cpus <- cpuList) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS_OVERRIDE", "/tmp"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def time(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[micro] cpus=$cpus $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (result $r)")
      }
      val base = spark.range(n).selectExpr("id", "(id * 2654435761) % 100000000 AS k")
        .localCheckpoint(true)
      time("md5-map")(
        base.select(sum(length(md5(concat_ws("_", col("id"), col("k"))))).as("s"))
          .head().getLong(0))
      time("groupBy-highcard")(
        base.groupBy("k").agg(count(lit(1))).count())
      time("sort-merge-join")(
        base.join(base.selectExpr("k", "id AS id2").limit(2000000), Seq("k")).count())
      time("explode+agg") {
        spark.range(n / 20)
          .selectExpr("id", "sequence(id*20, id*20 + 19) AS arr")
          .select(explode(col("arr")).as("x"))
          .groupBy(col("x") % 1000000).agg(count(lit(1))).count()
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
