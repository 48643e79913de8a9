package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns._

/** Dev-only micro-bench: time expression-pipeline variants over the
  * documents table to isolate per-expression cost (noop-sink timing,
  * guide §1.4). Usage: DevMicro [sfDir] [cpus]
  */
object DevMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      val d = df
      noop(d) // warm
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(d)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-28s $best%.3f s (min of 3)")
    }
    val base = Tables.spread(docs.filter(col("text").isNotNull))
    time("scan+spread") { base.select(col("doc_id")) }
    time("toks") { base.select(col("doc_id"), toks(col("text")).as("t")) }
    time("toks+size") { base.select(col("doc_id"), size(toks(col("text"))).as("n")) }
    time("grams") { base.select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), shingles3All(col("t")).as("gs")) }
    time("grams+hash") { base.select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), shingles3All(col("t")).as("gs"))
      .select(col("doc_id"), transform(col("gs"), g => hash60(g)).as("hs")) }
    time("grams+hash+winmin") { base.select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), shingles3All(col("t")).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("m"),
        transform(col("gs"), g => hash60(g)).as("hs"))
      .select(col("doc_id"),
        transform(sequence(lit(0), greatest(col("m") - operators.Dedup.WinnowW, lit(0))),
          p => least((0 until operators.Dedup.WinnowW).map(j => get(col("hs"), p + j)): _*)).as("fps")) }
    def fpsFrame = base.select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), shingles3All(col("t")).as("gs"))
      .select(col("doc_id"), size(col("gs")).as("m"),
        transform(col("gs"), g => hash60(g)).as("hs"))
      .select(col("doc_id"),
        transform(sequence(lit(0), greatest(col("m") - operators.Dedup.WinnowW, lit(0))),
          p => least((0 until operators.Dedup.WinnowW).map(j => get(col("hs"), p + j)): _*)).as("fps"))
    time("fps+explode") { fpsFrame.select(col("doc_id"), explode_outer(col("fps")).as("fp_h")) }
    time("fps+array_distinct+explode") {
      fpsFrame.select(col("doc_id"), explode_outer(array_distinct(col("fps"))).as("fp_h")) }
    time("fps+explode+distinct") {
      fpsFrame.select(col("doc_id"), explode_outer(col("fps")).as("fp_h")).distinct() }
    time("full winnowFingerprintsOf") { operators.Dedup.winnowFingerprintsOf(docs) }
    // the pre-r17 window-based formulation, for back-to-back comparison
    def oldWinnow: DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
          operators.Dedup.WinnowW - 1)
      base
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), shingles3All(col("t")).as("gs"))
        .select(col("doc_id"), size(col("gs")).as("m"),
          transform(col("gs"), g => hash60(g)).as("hs"))
        .select(col("doc_id"), col("m"),
          posexplode_outer(col("hs")).as(Seq("pos0", "h")))
        .select(col("doc_id"), col("m"), (col("pos0") + 1).as("pos"), col("h"))
        .withColumn("fp_h", min(col("h")).over(w))
        .filter(col("pos") <= greatest(col("m") - operators.Dedup.WinnowW + 1, lit(1)))
        .select(col("doc_id"), col("fp_h"))
        .distinct()
    }
    time("OLD window winnow") { oldWinnow }
    time("NEW array winnow (again)") { operators.Dedup.winnowFingerprintsOf(docs) }
    time("OLD window winnow (again)") { oldWinnow }
    if (sys.props.get("graft.micro.explain").contains("true")) {
      val d = fpsFrame.select(col("doc_id"), explode_outer(col("fps")).as("fp_h")).distinct()
      noop(d)
      println(d.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
