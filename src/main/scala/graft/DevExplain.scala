package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the optimized + physical plan of one named SparkEntry
  * query (the `.explain("formatted")` loop the scale review runs on every
  * operator). Usage: DevExplain <queryName> [sfDir] [mode]
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain(mode)
    spark.stop()
  }
}
