package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic EXACT-QUOTA sampling for training-data pipelines —
  * the third member of the repo's sampling family, with a contract
  * neither sibling can give:
  *
  *   - q39 `TextOps.stratifiedSample` keeps a hash BUCKET per stratum:
  *     a scan-speed filter whose kept count is whatever falls in the
  *     bucket (binomial around p·n_s, not equal to it).
  *   - q63 `TextOps.sourceCaps` keeps a FIXED small k per stratum via a
  *     per-group top-k window — right for domain caps, but k is a
  *     constant and the window puts each whole stratum in one task.
  *   - q112 keeps EXACTLY ceil(r·n_s) per stratum at ANY stratum size:
  *     the "eval set is exactly 30% of every source" carve-out
  *     contract, where a binomial miss is a broken dataset card and a
  *     fixed k is the wrong shape entirely.
  *
  * [[quotaSample]] does this with the three properties a 100 TB
  * sampler needs: reproducibility (salted hash rank, never `rand()`),
  * exactness (integer quota + unique rank key), and no global or
  * per-stratum sort: rank by a salted 60-bit hash
  * (deterministic, engine-portable in md5 mode — the [[graft.functions.TextFns.hashMode]]
  * discipline), per-stratum quota k_s = ceil(r·n_s) in pure-integer
  * arithmetic (the q111 rule), and the k_s-th smallest (h, doc_id)
  * found by the q111 two-tier rank engine in HASH space — where it is
  * at its very best, because the rank key is uniform with a KNOWN
  * range: the bucket index is `h >> 50` (1024 buckets, no min/max
  * stats pass at all) and bucket sizes are uniform by construction
  * (no skew case exists; q111's tie-collapse is unnecessary because
  * (h, doc_id) is unique). Membership is then a VALUE comparison
  * against the broadcast per-stratum threshold pair — exactly k_s
  * rows per stratum, ties impossible.
  *
  * Hash-mode contract: the SAMPLE MEMBERSHIP depends on the hash tier
  * (md5 for oracle parity, xxhash64 in production); everything
  * STRUCTURAL — per-stratum counts equal to the quota, subset-of-
  * input, determinism under partitioning — is mode-invariant
  * (spec'd). The salt ("samp|") decorrelates the sampler from every
  * other doc_id-keyed hash in the repo (split assignment q34, shard
  * packing q68), so sampling is independent of those assignments.
  */
object Sampling {

  /** Bucket fan-out for the hash-space rank (the carry ledger's
    * per-stratum row bound). 2^60 hash range / 2^50 = 1024 buckets.
    */
  val SampleBuckets = 1024
  private val BucketShift = 50

  /** Sampling rate in tenths: 3 → keep ceil(0.3·n_s) per stratum. */
  val SampleTenths = 3

  /** q112 — per-source 30% deterministic sample of `documents`, exact
    * quota per stratum.
    */
  def quotaSample(spark: SparkSession, dir: String): DataFrame =
    quotaSampleOf(Tables.documents(spark, dir), col("source"),
      SampleTenths).orderBy(col("source"), col("doc_id"))

  /** The sampled (doc_id, stratum) rows: exactly ceil(tenths/10 · n_s)
    * per stratum, smallest salted-hash first, deterministic.
    */
  private[graft] def quotaSampleOf(docs: DataFrame, stratum: Column,
                                        tenths: Int): DataFrame = {
    require(tenths >= 1 && tenths <= 10, s"tenths must be 1..10: $tenths")
    val h = graft.functions.TextFns.hash60(
      concat(lit("samp|"), col("doc_id").cast("string")))
    // one 2-column scan + the hash, consumed by the quota agg, the
    // bucket histogram, the threshold ranking and the membership filter
    // (all but the last are broadcast builds racing inside the final
    // job) — sibling consumers, eager fill
    val base = graft.TransientCache.register(docs
      .select(stratum.as("source"), col("doc_id"))
      .withColumn("h", h)
      .withColumn("idx", shiftrightunsigned(col("h"), BucketShift))
      .cache())
    base.count()
    val quota = base.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      .select(col("source"), expr(s"($tenths * ns + 9) DIV 10").as("ks"))
    val wB = Window.partitionBy(col("source")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the ONE bucket per stratum containing the quota boundary
    val cand = base.groupBy(col("source"), col("idx"))
      .agg(count(lit(1)).as("nb"))
      .withColumn("carry", sum(col("nb")).over(wB) - col("nb"))
      .join(broadcast(quota), Seq("source"))
      .where(col("ks") > col("carry") && col("ks") <= col("carry") + col("nb"))
      .select(col("source"), col("idx"), col("carry"), col("ks"))
    // rank ONLY the candidate bucket's rows (≈ n_s/1024, uniform by
    // hash) and extract the k_s-th smallest (h, doc_id) as the
    // per-stratum threshold pair
    val wIn = Window.partitionBy(col("source"), col("idx"))
      .orderBy(col("h"), col("doc_id"))
    val cut = base.join(broadcast(cand), Seq("source", "idx"))
      .withColumn("rk", row_number().over(wIn) + col("carry"))
      .where(col("rk") === col("ks"))
      .select(col("source"), col("h").as("cut_h"), col("doc_id").as("cut_id"))
    // membership = lexicographic (h, doc_id) ≤ threshold — exactly k_s
    // rows per stratum because the pair is unique
    base.join(broadcast(cut), Seq("source"))
      .where(col("h") < col("cut_h") ||
        (col("h") === col("cut_h") && col("doc_id") <= col("cut_id")))
      .select(col("doc_id"), col("source"))
  }

  /** Oracle: the single-node per-stratum global sort (row_number over
    * the salted md5 hash), same integer quota arithmetic.
    */
  val quotaSampleSql: String = {
    import graft.functions.TextFns.hash60Sql
    val h = hash60Sql("('samp|' || CAST(doc_id AS VARCHAR))")
    s"""WITH b AS (
      |  SELECT doc_id, source, $h AS h FROM documents),
      |k AS (SELECT source, ($SampleTenths * count(*) + 9) // 10 AS ks
      |      FROM b GROUP BY source),
      |r AS (SELECT b.*,
      |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
      |      FROM b)
      |SELECT r.doc_id, r.source
      |FROM r JOIN k USING (source) WHERE r.rn <= k.ks
      |ORDER BY r.source, r.doc_id""".stripMargin
  }
}
