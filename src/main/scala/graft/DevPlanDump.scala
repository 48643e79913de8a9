package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` for a list of SparkEntry
  * queries (or all of them) to one file per query in an output
  * directory — the plans/rNN before/after deliverable in one JVM.
  *
  * Usage: DevPlanDump <outDir> <suffix> [sfDir] [q1,q2,... | all]
  *
  * e.g. DevPlanDump plans/r17 before /root/testdata/sf0.1 q88,q91
  * writes plans/r17/q88_before.txt etc. Plans are captured WITHOUT
  * executing (initial AQE plan — the shape lint surface: Exchange
  * count, join strategy, PushedFilters/ReadSchema).
  */
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val sel = if (args.length > 3) args(3) else "all"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted: Option[Set[String]] =
      if (sel == "all") None
      else Some(sel.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def shortKey(name: String): String = name.takeWhile(_ != '_')
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val k = shortKey(name)
      if (wanted.forall(w => w.contains(k) || w.contains(name))) {
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${k}_$suffix.txt"),
            plan.getBytes("UTF-8"))
          println(s"wrote $outDir/${k}_$suffix.txt")
        } catch {
          case e: Throwable => println(s"FAILED $name: ${e.getMessage}")
        }
        TransientCache.drain()
      }
    }
    spark.stop()
  }
}
