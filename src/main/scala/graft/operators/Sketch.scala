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

  // --------------------------------------------------- CMS heavy hitters

  /** q82's sketch geometry and the absolute hot-token cut (the fixture
    * vocabulary is ~31 near-uniform tokens around 900–980 occurrences,
    * so 950 separates a handful; production uses a relative εN cut).
    */
  val CmsD = 4
  val CmsW = 256
  val CmsHotT = 950L

  /** q82 — sketch-candidate heavy hitters: the Count-Min matrix is built
    * by the TYPED [[graft.functions.CmsSketch]] Aggregator (partial
    * aggregation, element-wise-sum merge — the production path), the
    * d×w counters come back as BOUNDED driver state (d·w longs, like the
    * k-means centroids), and candidate hot tokens are read off a scan-
    * stage projection: est(tok) = min over d rows of the literal
    * matrix at cell_j(h) — never a full-universe groupBy when only the
    * hot tail matters. Candidates are then exact-counted (the standard
    * sketch-then-verify discipline; CMS never underestimates, so no hot
    * token can be missed — machine-checked in CmsSketchSpec and by the
    * est >= exact column pair here). The oracle rebuilds the SAME
    * counters relationally (per-(row, cell) GROUP BY over the identical
    * hash family), so the query is a cross-paradigm differential:
    * typed-Aggregator matrix == relational matrix, integer-exact.
    *
    * At 100 TB this is the [[Skew]] feeder: one sketch pass finds the
    * hot join keys that need salting, at d·w memory instead of a
    * distinct-key aggregation.
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns._
    val th = graft.TransientCache.register(
      graft.Tables.spread(graft.Tables.documents(spark, dir))
        .select(explode(toks(col("text"))).as("token"))
        .select(col("token"), hash60(col("token")).as("h"))
        .cache()) // consumed by the sketch fit AND the exact counts
    import spark.implicits._
    val matrix: Array[Long] = th.select(col("h")).as[Long]
      .select(graft.functions.CmsSketch.sketch(CmsD, CmsW)).head()
    val P = Dedup.P
    val est = (0 until CmsD).map { j =>
      val cell = ((lit(Dedup.A(j)) * (col("h") % P) + lit(Dedup.B(j))) % P) % CmsW
      element_at(typedLit(matrix.toSeq), (lit(j * CmsW + 1) + cell).cast("int"))
    }.reduce(least(_, _))
    th.groupBy(col("token"), col("h"))
      .agg(count(lit(1)).as("exact"))
      .withColumn("est", est)
      .filter(col("est") >= CmsHotT)
      .select(col("token"), col("est"), col("exact"))
      .orderBy(col("token"))
  }

  val cmsHeavyHittersSql: String = {
    import graft.functions.TextFns._
    val P = Dedup.P
    def cellSql(j: Int) = s"((${Dedup.A(j)} * (h % $P) + ${Dedup.B(j)}) % $P) % $CmsW"
    val ctrSelects = (0 until CmsD).map { j =>
      s"SELECT $j AS j, ${cellSql(j)} AS cell, count(*) AS c FROM th GROUP BY 2"
    }.mkString("\n      |  UNION ALL ")
    val tcSelects = (0 until CmsD).map { j =>
      s"SELECT token, exact, $j AS j, ${cellSql(j)} AS cell FROM cnt"
    }.mkString("\n      |  UNION ALL ")
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |tok AS (SELECT unnest(t) AS token FROM toks),
      |th AS (SELECT token, ${hash60Sql("token")} AS h FROM tok),
      |cnt AS (SELECT token, h, count(*) AS exact FROM th GROUP BY 1, 2),
      |ctr AS (
      |  $ctrSelects),
      |tc AS (
      |  $tcSelects),
      |e AS (
      |  SELECT token, exact, min(ctr.c) AS est
      |  FROM tc JOIN ctr ON ctr.j = tc.j AND ctr.cell = tc.cell
      |  GROUP BY 1, 2)
      |SELECT token, CAST(est AS BIGINT) AS est, CAST(exact AS BIGINT) AS exact
      |FROM e WHERE est >= $CmsHotT ORDER BY token""".stripMargin
  }

  // ------------------------------------- sampled quantile estimate (q90)

  /** Sample size for [[sampleQuantiles]] and the quantile probe points.
    * K = 256 gives a DKW empirical-CDF sup-norm error ≤ ~0.1 rank units
    * with probability ≥ 1 − 2e^{−2K·0.01} ≈ 0.994 — the classic
    * distribution-free bound, checked at a looser 0.15 in the spec so a
    * fixture regeneration cannot read as a code regression.
    */
  val QuantK = 256
  val QuantPs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)

  /** q90 — corpus quantile estimate from a deterministic uniform sample:
    * the engine-portable "beyond-memory" quantile path that
    * `approx_percentile`/t-digest fill engine-specifically (the gap the
    * exact-rank q41/q55 tiers documented). The sample is the bottom-
    * [[QuantK]] documents by a salted 60-bit content hash — a
    * value-carrying KMV: like q40's k-minimum pass it plans as
    * `TakeOrderedAndProject` (per-partition top-k, k rows per partition
    * move, one driver-side merge — no full sort, no full shuffle), and
    * two node-local sketches merge by keeping the k smallest of the
    * union, so the sample is identical across re-runs, partitionings and
    * cluster sizes (the q34/q39 hash-order discipline; ties broken by
    * doc_id for a total order). Quantiles then read off the sorted
    * sample with q41's exact rank formula `floor((k−1)·q)+1` — the
    * whole reduction is one bounded array, never a corpus-wide sort.
    *
    * Reference anchor: the reference's only distribution summary is
    * pandas `describe()` over the full frame
    * (`etl_inventory/seed_stock_points.py` debugging dumps) — an
    * all-in-memory quantile; this is its 100 TB-shaped replacement.
    */
  def sampleQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns._
    val sample = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("h", hash60(concat(lit("squant:"), col("doc_id").cast("string"))))
      .orderBy(col("h"), col("doc_id"))
      .limit(QuantK)
    // one row: the sorted sample + its true size (k < QuantK on a tiny
    // corpus keeps the rank formula well-defined)
    val sorted = sample.agg(
      sort_array(collect_list(col("n_chars"))).as("vals"),
      count(lit(1)).as("k"))
    sorted
      .select(explode(array(QuantPs.map(lit): _*)).as("p"), col("vals"), col("k"))
      .select(col("p"),
        element_at(col("vals"),
          (floor(col("p") * (col("k") - 1)) + 1).cast("int")).as("est_n_chars"),
        col("k"))
      .orderBy(col("p"))
  }

  val sampleQuantilesSql: String = {
    import graft.functions.TextFns._
    val ps = QuantPs.map(p => s"CAST($p AS DOUBLE)").mkString("[", ", ", "]")
    s"""WITH s AS (
      |  SELECT n_chars FROM documents
      |  ORDER BY ${hash60Sql("'squant:' || CAST(doc_id AS VARCHAR)")}, doc_id
      |  LIMIT $QuantK),
      |v AS (SELECT list_sort(list(n_chars)) AS vals, count(*) AS k FROM s),
      |p AS (SELECT unnest($ps) AS p)
      |SELECT p, vals[CAST(floor(p * (k - 1)) + 1 AS INT)] AS est_n_chars, k
      |FROM p, v ORDER BY p""".stripMargin
  }
}
