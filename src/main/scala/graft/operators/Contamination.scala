package graft.operators

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination + dataset splitting — the two remaining
  * standard stages of a training-data pipeline (no reference
  * counterpart).
  *
  * Decontamination: training documents are flagged when they share word
  * 3-gram shingles with a held-out benchmark set (role-played by the
  * `source = 'src0'` slice of the corpus) — the GPT-3/PaLM-style n-gram
  * overlap check. Plan shape: the benchmark's (small) distinct shingle
  * hashes are broadcast and inner-joined against the training side's
  * inverted index; overlap counts per doc → contamination ratio. Cost
  * scales with collisions, never |train| × |benchmark|.
  *
  * Splitting: a deterministic content-hash split (train/val/test by
  * md5-derived bucket) — stable under re-runs, re-orderings and
  * re-partitioning, so the split is reproducible corpus-wide without
  * coordination. Exact duplicates land in the same split by construction
  * (same content → same bucket), so dedup leakage across splits is
  * structurally impossible.
  */
object Contamination {

  val TrainPct = 80
  val ValPct = 10 // test = remainder

  /** q33: per-training-doc contamination against the benchmark slice. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("source"), explode(shingles3All(col("t"))).as("s"))
      .select(col("doc_id"), col("source"), hash60(col("s")).as("sh_h"))
      .distinct()
    val bench = docs.filter(col("source") === "src0")
      .select(col("sh_h")).distinct()
    val train = docs.filter(col("source") =!= "src0")
    val n = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = train.join(broadcast(bench), Seq("sh_h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    n.join(hits, Seq("doc_id"), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("ratio",
        col("n_contaminated").cast("double") / col("n_shingles"))
      .withColumn("flagged", col("ratio") >= 0.5)
      .orderBy(col("doc_id"))
  }

  val contaminationSql: String =
    s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
      |sh AS (SELECT doc_id, source, unnest($shingles3AllSql) AS s FROM toks),
      |shx AS (SELECT DISTINCT doc_id, source, ${hash60Sql("s")} AS sh_h FROM sh),
      |bench AS (SELECT DISTINCT sh_h FROM shx WHERE source = 'src0'),
      |train AS (SELECT doc_id, sh_h FROM shx WHERE source <> 'src0'),
      |n AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY 1),
      |hits AS (
      |  SELECT t.doc_id, count(*) AS n_contaminated
      |  FROM train t JOIN bench b ON t.sh_h = b.sh_h GROUP BY 1)
      |SELECT n.doc_id, n.n_shingles,
      |  COALESCE(h.n_contaminated, 0) AS n_contaminated,
      |  CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / n.n_shingles AS ratio,
      |  (CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / n.n_shingles >= 0.5) AS flagged
      |FROM n LEFT JOIN hits h ON n.doc_id = h.doc_id
      |ORDER BY n.doc_id""".stripMargin

  /** q34: deterministic content-hash train/val/test assignment. */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (hash60(col("text")) % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < TrainPct, "train")
          .when(col("bucket") < TrainPct + ValPct, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("lang"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))

  val splitAssignSql: String =
    s"""SELECT doc_id, lang,
      |  ${hash60Sql("text")} % 100 AS bucket,
      |  CASE WHEN ${hash60Sql("text")} % 100 < $TrainPct THEN 'train'
      |       WHEN ${hash60Sql("text")} % 100 < ${TrainPct + ValPct} THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin
}
