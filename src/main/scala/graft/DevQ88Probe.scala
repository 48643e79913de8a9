package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe (r10, VERDICT task 7): is q88's four-broadcast-round
  * shape actually latency-bound, or would fusing the dfB/dfC
  * aggregations into ONE union-restricted aggregation (one broadcast of
  * batch-fp ∪ candidate-fp hashes) buy the ~1 s the round count
  * suggests? The fused variant pays for its third-round saving by
  * running the collision join UN-guarded (candidates before any df
  * guard) — the mega-bucket exposure the shipped shape exists to
  * prevent — so this is a measurement tool, not a candidate
  * implementation unless the win is large AND the guard loss priced.
  *
  * Usage: DevQ88Probe [sfDir] [reps]
  */
object DevQ88Probe {

  /** The fused 3-round q88: unguarded collisions → one df aggregation
    * over batch ∪ candidate hashes → guarded report. Output must equal
    * the shipped screen exactly (checked per rep).
    */
  private def fusedScreen(spark: SparkSession, dir: String): DataFrame = {
    val idx = Dedup.winnowIndexAtRest(spark, dir)
    val batchDocs = Tables.documents(spark, dir).filter(col("doc_id") % 10 >= 8)
    val batchFp = graft.TransientCache.register(
      Dedup.winnowFingerprintsOf(batchDocs).cache())
    // ROUND 1 — UN-guarded collision join: every (batch doc, corpus doc,
    // fp) coincidence, fp-level rows retained so the guard can apply late
    val coll = graft.TransientCache.register(
      idx.fingerprints.select(col("doc_id").as("dc"), col("fp_h"))
        .join(broadcast(batchFp.select(col("doc_id").as("di"), col("fp_h"))),
          Seq("fp_h"))
        .cache())
    val candDocs = coll.select(col("dc").as("doc_id")).distinct()
    val candFp = graft.TransientCache.register(
      idx.fingerprints.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .cache())
    // ROUND 2 — the FUSED df aggregation: one broadcast of batch ∪
    // candidate hashes, one restricted pass over the union universe
    val relFp = batchFp.select(col("fp_h"))
      .unionByName(candFp.select(col("fp_h"))).distinct()
    val unionFp = idx.fingerprints.select(col("fp_h"))
      .unionByName(batchFp.select(col("fp_h")))
    val dfAll = graft.TransientCache.register(
      unionFp.join(broadcast(relFp), Seq("fp_h"), "left_semi")
        .groupBy(col("fp_h")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= Dedup.WinnowMaxDf)
        .select(col("fp_h"))
        .cache())
    // ROUND 3 — guard late, then the q86 report
    val shared = coll.join(dfAll, Seq("fp_h"))
      .groupBy(col("di"), col("dc")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= Dedup.WinnowMinShared)
    val nfi = batchFp.join(dfAll, Seq("fp_h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
    val nfc = candFp.join(dfAll, Seq("fp_h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
    shared
      .join(nfi.select(col("doc_id").as("di"), col("nf").as("nfi")), Seq("di"))
      .join(nfc.select(col("doc_id").as("dc"), col("nf").as("nfc")), Seq("dc"))
      .withColumn("sim", col("shared").cast("double") / least(col("nfi"), col("nfc")))
      .select(col("di"), col("dc"), col("shared"), col("sim"))
      .orderBy(col("di"), col("dc"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the at-rest index once — both variants screen against it
    Dedup.winnowIndexAtRest(spark, dir).fingerprints.count()
    def time(tag: String, f: () => DataFrame): Seq[String] = {
      var out: Seq[String] = Nil
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        out = f().collect().map(_.toString).toSeq
        val s = (System.nanoTime() - t0) / 1e9
        println(f"$tag rep$i: $s%.2f s (${out.size} rows)")
        graft.TransientCache.drain()
      }
      out
    }
    val a = time("shipped-4round", () => Dedup.deltaWinnow(spark, dir))
    val b = time("fused-3round", () => fusedScreen(spark, dir))
    println(s"outputs equal: ${a == b}")
    spark.stop()
  }
}
