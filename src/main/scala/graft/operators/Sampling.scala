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
    val base = saltedBase(docs, stratum, "samp|")
    val quota = base.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      .select(col("source"), expr(s"($tenths * ns + 9) DIV 10").as("ks"))
    sampleByQuota(base, quota)
  }

  /** The salted-hash rank frame the draw engine runs over: one
    * 2-column scan + the hash + the known-range bucket index, consumed
    * by the quota derivation, the bucket histogram, the threshold
    * ranking and the membership filter (all but the last are broadcast
    * builds racing inside the final job) — sibling consumers, eager
    * fill. The salt decorrelates each sampler from every other
    * doc_id-keyed hash (q34 split, q68 shards, each other).
    */
  private def saltedBase(docs: DataFrame, stratum: Column,
                         salt: String): DataFrame = {
    val base = graft.TransientCache.register(docs
      .select(stratum.as("source"), col("doc_id"))
      .withColumn("h", graft.functions.TextFns.hash60(
        concat(lit(salt), col("doc_id").cast("string"))))
      .withColumn("idx", shiftrightunsigned(col("h"), BucketShift))
      .cache())
    base.count()
    base
  }

  /** The shared draw engine: exactly `ks` rows per stratum (smallest
    * (h, doc_id) first) for ANY per-stratum quota frame — q112 passes
    * ceil(r·n_s), q114 passes the apportioned mix. A stratum with
    * ks = 0 (or absent from `quotas`) yields no candidate bucket and
    * drops out entirely; ks is assumed ≤ n_s (callers cap).
    */
  private[graft] def sampleByQuota(base: DataFrame,
                                   quotas: DataFrame): DataFrame = {
    val wB = Window.partitionBy(col("source")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the ONE bucket per stratum containing the quota boundary
    val cand = base.groupBy(col("source"), col("idx"))
      .agg(count(lit(1)).as("nb"))
      .withColumn("carry", sum(col("nb")).over(wB) - col("nb"))
      .join(broadcast(quotas), Seq("source"))
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

  /** Mix budget as a fraction of the corpus: N = total DIV [[MixDiv]]. */
  val MixDiv = 5

  /** q114 — the TRAINING-MIX sampler: draw a fixed budget
    * N = total/[[MixDiv]] apportioned across sources by q78's
    * temperature-scaled weights, exactly. This is the op the q78 model
    * exists FOR — turning "source s deserves weight w_s" into an
    * actual drawn document set — and it composes the repo's own
    * pieces: q78's weights (bit-identical across engines, oracle-
    * checked there), LARGEST-REMAINDER apportionment (the house-seats
    * algorithm: floor(N·w_s) each, the L = N − Σfloor leftovers go to
    * the largest fractional parts, (frac DESC, source) total order —
    * so Σ quotas = N exactly, in integer arithmetic over bit-portable
    * doubles), and the [[sampleByQuota]] draw engine with its own
    * salt ("mix|"), so the mix draw is independent of the q112
    * carve-out. Quotas cap at n_s (an up-weighted tiny source can be
    * apportioned more docs than it has — a REAL mix oversamples by
    * replication, q69; a without-replacement draw takes all of the
    * source): one-round apportionment, the capped shortfall is
    * reported by construction (Σ output < N) rather than silently
    * redistributed — production reruns apportionment on the uncapped
    * remainder (documented contract; the cap path is spec-forced).
    * The apportionment rank runs over the |sources|-row model frame
    * (the q68/q78 bounded-model discipline).
    */
  def mixQuotaSample(spark: SparkSession, dir: String): DataFrame =
    mixQuotaSampleOf(Tables.documents(spark, dir))
      .orderBy(col("source"), col("doc_id"))

  private[graft] def mixQuotaSampleOf(docs: DataFrame): DataFrame = {
    // the whole apportionment rides the |sources|-row model frame in
    // TWO window stages (budget total, then rank + leftover in ONE
    // ordered window) — no scalar-agg crossJoins, so the q78 weight
    // chain executes exactly once (the model is 4 rows at the fixture
    // and thousands at worst — the q68/q78 bounded-model discipline)
    val full = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wR = Window.orderBy(col("frac").desc, col("source"))
    val quotas = TextOps.mixtureWeightsOf(docs)
      .select(col("source"), col("n_docs"), col("weight"))
      .withColumn("tot", sum(col("n_docs")).over(full))
      .withColumn("bn", expr(s"tot DIV $MixDiv"))
      .withColumn("raw", col("weight") * col("bn"))
      .withColumn("fl", floor(col("raw")))
      .withColumn("frac", col("raw") - col("fl"))
      .withColumn("rk", row_number().over(wR))
      .withColumn("lv", col("bn") - sum(col("fl")).over(
        wR.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("source"),
        least(col("fl") +
          when(col("rk") <= col("lv"), 1L).otherwise(0L),
          col("n_docs")).as("ks"))
    sampleByQuota(saltedBase(docs, col("source"), "mix|"), quotas)
  }

  /** Oracle: q78's weight CTEs verbatim, the same integer largest-
    * remainder apportionment, and the single-node per-stratum sort.
    */
  val mixQuotaSampleSql: String = {
    import graft.functions.TextFns.hash60Sql
    val h = hash60Sql("('mix|' || CAST(doc_id AS VARCHAR))")
    s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      |tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
      |w AS (SELECT source, n_docs, total,
      |    sqrt(CAST(n_docs AS DOUBLE) / total) AS w
      |  FROM c CROSS JOIN tt),
      |nm AS (SELECT list_reduce(list_prepend(0.0, list(w ORDER BY source)),
      |    (a, b) -> a + b) AS norm FROM w),
      |ap AS (SELECT source, n_docs,
      |    (w / norm) * (total // $MixDiv) AS raw,
      |    CAST(FLOOR((w / norm) * (total // $MixDiv)) AS BIGINT) AS fl,
      |    total // $MixDiv AS bn
      |  FROM w CROSS JOIN nm),
      |lv AS (SELECT max(bn) - sum(fl) AS lv FROM ap),
      |k AS (SELECT source,
      |    CASE WHEN row_number() OVER (ORDER BY raw - fl DESC, source)
      |           <= (SELECT lv FROM lv)
      |         THEN fl + 1 ELSE fl END AS ks0, n_docs
      |  FROM ap),
      |kk AS (SELECT source,
      |    CASE WHEN ks0 < n_docs THEN ks0 ELSE n_docs END AS ks FROM k),
      |b AS (SELECT doc_id, source, $h AS h FROM documents),
      |r AS (SELECT b.*,
      |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
      |      FROM b)
      |SELECT r.doc_id, r.source
      |FROM r JOIN kk USING (source) WHERE r.rn <= kk.ks
      |ORDER BY r.source, r.doc_id""".stripMargin
  }
}
