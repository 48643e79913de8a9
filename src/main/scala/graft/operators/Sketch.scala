package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distinct-count sketching. HLL (Spark's approx_count_distinct) is the
  * production default but is engine-specific, so the oracle-checkable
  * demonstrator is KMV (k-minimum-values, Bar-Yossef et al. 2002): keep
  * the k smallest values of a uniform hash; the k-th smallest h_k
  * estimates density, giving n̂ = (k−1) · H / h_k over hash space H.
  * Deterministic — same hash, same estimate, any engine.
  *
  * Scale: the k-minimum pass is a per-partition top-k (TakeOrderedAndProject
  * — no full sort, no full shuffle; only k rows per partition move), which
  * is exactly how a distributed KMV union works: sketches merge by keeping
  * the k smallest of the union. The exact count alongside is for the
  * fixture-scale accuracy check; at 100 TB you'd keep only the sketch.
  */
object Sketch {

  val K = 64
  private val HashSpace = 1152921504606846976.0 // 2^60, exact in double

  /** The (non-distinct) shingle-hash stream — the input both KMV forms
    * consume: the relational q40 below and the typed
    * [[graft.functions.KmvSketch]] Aggregator (their estimates must
    * agree bit-for-bit, see KmvSketchSpec).
    */
  def shingleHashes(spark: SparkSession, dir: String): DataFrame =
    Dedup.shingleIndex(spark, dir).select(col("sh_h"))

  /** q40 — KMV distinct-count estimate of the corpus' distinct 3-gram
    * shingles (via the shared cached shingle index) vs the exact count.
    * One summary row: exact, k, estimate, relative error.
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    // cached: consumed by both the exact count and the top-k below —
    // without it the distinct exchange over the shingle index runs twice;
    // registered for post-materialization eviction (TransientCache)
    val h = graft.TransientCache.register(
      Dedup.shingleIndex(spark, dir).select(col("sh_h")).distinct().cache())
    val hk = h.orderBy(col("sh_h")).limit(K)
      .agg(max(col("sh_h")).as("hk"))
    h.agg(count(lit(1)).as("n_exact"))
      .crossJoin(hk)
      .withColumn("k", lit(K.toLong))
      .withColumn("kmv_estimate",
        lit((K - 1).toDouble) * lit(HashSpace) / col("hk").cast("double"))
      .withColumn("rel_err",
        abs(col("kmv_estimate") - col("n_exact").cast("double"))
          / col("n_exact").cast("double"))
      .select(col("n_exact"), col("k"), col("kmv_estimate"), col("rel_err"))
  }

  val kmvDistinctSql: String = {
    import graft.functions.TextFns._
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |sh AS (SELECT doc_id, unnest($shingles3AllSql) AS s FROM toks),
      |h AS (SELECT DISTINCT ${hash60Sql("s")} AS sh_h FROM sh),
      |kth AS (SELECT max(sh_h) AS hk FROM
      |         (SELECT sh_h FROM h ORDER BY sh_h LIMIT $K)),
      |est AS (
      |  SELECT (SELECT count(*) FROM h) AS n_exact,
      |    CAST($K AS BIGINT) AS k,
      |    CAST(${K - 1} AS DOUBLE) * 1152921504606846976.0
      |      / CAST(hk AS DOUBLE) AS kmv_estimate
      |  FROM kth)
      |SELECT n_exact, k, kmv_estimate,
      |  abs(kmv_estimate - CAST(n_exact AS DOUBLE))
      |    / CAST(n_exact AS DOUBLE) AS rel_err
      |FROM est""".stripMargin
  }
}
