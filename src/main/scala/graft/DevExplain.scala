package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted physical plan of a named frame (cache
  * tiers or SparkEntry queries) without executing it.
  *
  * Usage: DevExplain <cache:tier|queryName> [sfDir]
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC") // Tables.load NTZ seam
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = name match {
      case "cache:winnow" => operators.Dedup.winnowFingerprintsOf(Tables.documents(spark, sfDir))
      case "cache:shingle" => operators.Dedup.shingleRowsOf(Tables.documents(spark, sfDir))
      case q => SparkEntry.queries(q)(spark, sfDir)
    }
    df.explain("formatted")
    // the plan AQE actually ran (materialize first)
    df.count()
    println("== FINAL ADAPTIVE PLAN ==")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
