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

  /** THE content-hash split rule — the single Scala definition behind
    * q34, the q87 audit, and the pipeline's split stage (one copy, so
    * labels and audits can never desynchronize).
    */
  def splitLabel(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hash60(text) % 100 < TrainPct, "train")
      .when(hash60(text) % 100 < TrainPct + ValPct, "val")
      .otherwise("test")

  /** q33: per-training-doc contamination against the benchmark slice. */
  def contamination(spark: SparkSession, dir: String): DataFrame =
    contaminationOf(Tables.spread(Tables.documents(spark, dir)))

  /** The q33 ratio over an explicit frame (`doc_id`, `source`, `text`)
    * holding BOTH slices — the benchmark rows are `source ==
    * benchSource`, everything else is scored against them.
    * [[graft.pipelines.CorpusPipeline]] feeds it its refined train
    * table unioned with the PRISTINE raw benchmark slice (the bench
    * side must not itself be quality-cut or span-rewritten) and passes
    * ITS bench-source constant — one definition, no drift between the
    * pipeline's union and this partition (a silently-empty bench set
    * would make decontamination a no-op).
    */
  private[graft] def contaminationOf(docsIn: DataFrame,
                                     benchSource: String = "src0"): DataFrame = {
    val docs = docsIn
      // r18: hash INSIDE the per-doc array via the native fused walk
      // (one codegen'd pass; parity contract in TextExprs), then explode
      // fixed-width longs — the old chain exploded gram STRINGS and
      // hashed per occurrence. explode_outer + a projection below the
      // generator per the shingleRowsOf discipline; shingleFps is null
      // only for null text, where the old chain emitted one null sh_h
      // row too (explode of [null] ≡ explode_outer of null).
      .select(col("doc_id"), col("source"),
        graft.functions.TextFns.shingleFps(col("text"), 0).as("hs"))
      .select(col("doc_id"), col("source"), explode_outer(col("hs")).as("sh_h"))
      .distinct()
    val bench = docs.filter(col("source") === benchSource)
      .select(col("sh_h")).distinct()
    val train = docs.filter(col("source") =!= benchSource)
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
        (hash60(col("text")) % 100).as("bucket"),
        splitLabel(col("text")).as("split"))
      .orderBy(col("doc_id"))

  val splitAssignSql: String =
    s"""SELECT doc_id, lang,
      |  ${hash60Sql("text")} % 100 AS bucket,
      |  CASE WHEN ${hash60Sql("text")} % 100 < $TrainPct THEN 'train'
      |       WHEN ${hash60Sql("text")} % 100 < ${TrainPct + ValPct} THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q72 — FUZZY benchmark contamination: q33 catches exact shingle
    * overlap; paraphrased/lightly-edited benchmark leakage needs
    * near-match detection. Same MinHash family and banding as q22 run
    * CROSS-corpus: every doc gets a 16-hash signature from the shared
    * shingle index, the benchmark side's band signatures (bounded by the
    * benchmark, not the corpus — broadcastable by assumption, like q33's
    * shingle set) are broadcast against the training side's bands, and
    * only banding collisions are verified with exact Jaccard. Emits each
    * contaminated training doc's BEST benchmark match (max Jaccard, ties
    * to the smaller benchmark id). Cost at 100 TB: one signature pass
    * over the corpus + collision-bounded verification — never
    * |train| × |benchmark|.
    */
  def fuzzyContamination(spark: SparkSession, dir: String): DataFrame = {
    import Dedup.{A, B, Bands, P, Rows}
    val benchIds = Tables.documents(spark, dir)
      .filter(col("source") === "src0").select(col("doc_id"))
    val shx = Dedup.shingleIndex(spark, dir).withColumn("x", col("sh_h") % P)
    val mins = A.indices.map(j =>
      min((lit(A(j)) * col("x") + lit(B(j))) % P).as(s"v$j"))
    val mh = shx.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bandSigs = array((0 until Bands).map(bd =>
      concat_ws("-", (0 until Rows).map(r => col(s"v${bd * Rows + r}")): _*)): _*)
    val bands = mh.select(col("doc_id"), posexplode(bandSigs).as(Seq("band", "sig")))
    val benchBands = bands.join(broadcast(benchIds), Seq("doc_id"))
      .select(col("doc_id").as("bench_id"), col("band"), col("sig"))
    val trainBands = bands.join(broadcast(benchIds), Seq("doc_id"), "left_anti")
    // consumed by the doc-restriction AND the verify join; registered
    // for post-materialization eviction (TransientCache) so a long-lived
    // session's repeated contamination runs don't pin blocks forever
    val cand = graft.TransientCache.register(
      trainBands.join(broadcast(benchBands), Seq("band", "sig"))
        .select(col("doc_id"), col("bench_id")).distinct()
        .cache())
    val candDocs = cand
      .select(explode(array(col("doc_id"), col("bench_id"))).as("doc_id"))
      .distinct()
    val docSets = graft.TransientCache.register(
      Dedup.shingleIndex(spark, dir)
        .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .groupBy(col("doc_id")).agg(collect_list(col("sh_h")).as("sh"))
        .cache()) // consumed from two join branches
    // the verify joins SHUFFLE on doc_id/bench_id rather than broadcast
    // docSets: unlike benchBands (benchmark-bounded), docSets carries
    // full shingle sets for every band-collision candidate INCLUDING
    // training docs — a boilerplate-heavy corpus at target scale makes
    // that collision-bounded, not benchmark-bounded, and a broadcast of
    // it would be the one driver/executor-memory cliff in this query.
    // cand is small relative to the corpus, so the shuffle is cheap.
    cand
      .join(docSets.select(col("doc_id"), col("sh").as("sha")),
        Seq("doc_id"))
      .join(docSets.select(col("doc_id").as("bench_id"),
        col("sh").as("shb")), Seq("bench_id"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jaccard") >= Dedup.JaccardThreshold)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("jaccard").desc, col("bench_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("bench_id"), col("jaccard"))
      .orderBy(col("doc_id"))
  }

  val fuzzyContaminationSql: String = {
    import Dedup.{A, B, Bands, P, Rows}
    val minCols = A.indices
      .map(j => s"min((${A(j)} * x + ${B(j)}) % $P) AS v$j")
      .mkString(",\n      |    ")
    val bandSelects = (0 until Bands).map { bd =>
      val vs = (0 until Rows).map(r => s"v${bd * Rows + r}").mkString(", ")
      s"SELECT doc_id, $bd AS band, concat_ws('-', $vs) AS sig FROM mh"
    }.mkString("\n      |  UNION ALL ")
    s"""WITH ${Dedup.shCte},
      |xh AS (SELECT doc_id, sh_h % $P AS x FROM shx),
      |mh AS (
      |  SELECT doc_id,
      |    $minCols
      |  FROM xh GROUP BY doc_id),
      |bands AS (
      |  $bandSelects),
      |bench AS (SELECT doc_id FROM documents WHERE source = 'src0'),
      |bb AS (
      |  SELECT b.doc_id AS bench_id, b.band, b.sig
      |  FROM bands b JOIN bench ON bench.doc_id = b.doc_id),
      |tb AS (
      |  SELECT b.* FROM bands b
      |  WHERE b.doc_id NOT IN (SELECT doc_id FROM bench)),
      |cand AS (
      |  SELECT DISTINCT t.doc_id, bb.bench_id
      |  FROM tb t JOIN bb ON t.band = bb.band AND t.sig = bb.sig),
      |ds AS (SELECT doc_id, $shingles3Sql AS sh FROM toks),
      |v AS (
      |  SELECT c.doc_id, c.bench_id,
      |    len(list_intersect(sa.sh, sb.sh)) AS inter,
      |    len(sa.sh) AS na, len(sb.sh) AS nb
      |  FROM cand c
      |  JOIN ds sa ON sa.doc_id = c.doc_id
      |  JOIN ds sb ON sb.doc_id = c.bench_id),
      |j AS (
      |  SELECT doc_id, bench_id,
      |    CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
      |  FROM v
      |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= ${Dedup.JaccardThreshold}),
      |r AS (
      |  SELECT doc_id, bench_id, jaccard,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY jaccard DESC, bench_id) AS rn
      |  FROM j)
      |SELECT doc_id, bench_id, jaccard FROM r WHERE rn = 1
      |ORDER BY doc_id""".stripMargin
  }

  /** q87 — split-leakage audit: near-duplicate pairs that STRADDLE the
    * q34 train/val/test boundary. Content-hash splitting (X17) already
    * guarantees exact duplicates land in one split; this catches the
    * NEAR-duplicates it cannot — an eval doc that is a light edit of a
    * training doc silently inflates every benchmark run on the split.
    * Composition of X17 (split assignment) + X7 (MinHash banding) + the
    * q22 verify: band signatures from the shared shingle index, split
    * labels joined on doc_id, eval-side bands equi-joined against
    * train-side bands on (band, sig), collisions verified with exact
    * Jaccard, best train match per leaked eval doc (max jaccard, ties to
    * the smaller train id).
    *
    * Scale: unlike q72's benchmark-bounded broadcast, BOTH sides here
    * are corpus-scale (train ≈ 80%, eval ≈ 20% of the corpus), so the
    * candidate join SHUFFLES on (band, sig) — broadcasting either side
    * would be the executor-memory cliff. Verify joins shuffle on doc id
    * for the same reason (the q72 note). Everything downstream is
    * collision-bounded.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame =
    splitLeakageOf(Tables.documents(spark, dir), Dedup.shingleIndex(spark, dir))

  /** The q87 audit over an explicit docs frame (`doc_id`, `text`) and its
    * shingle rows — the form [[graft.pipelines.CorpusPipeline]] runs over
    * a refined stage table (shingles from [[Dedup.shingleRowsOf]] on the
    * stage docs; the standalone q87 passes the shared [[Dedup.shingleIndex]]
    * cache, so its plan is unchanged). Split labels derive from the same
    * content-hash rule as [[splitAssign]], so the audit and the
    * assignment can never disagree.
    */
  private[graft] def splitLeakageOf(docsIn: DataFrame,
                                    shingles: DataFrame): DataFrame = {
    import Dedup.{A, B, Bands, P, Rows}
    val splits = docsIn
      .select(col("doc_id"), splitLabel(col("text")).as("split"))
    val shx = shingles.withColumn("x", col("sh_h") % P)
    val mins = A.indices.map(j =>
      min((lit(A(j)) * col("x") + lit(B(j))) % P).as(s"v$j"))
    val mh = shx.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bandSigs = array((0 until Bands).map(bd =>
      concat_ws("-", (0 until Rows).map(r => col(s"v${bd * Rows + r}")): _*)): _*)
    // consumed by BOTH the eval and train side of the candidate join —
    // an uncached self-join would run the 16-minhash aggregation twice
    // (the q22 lesson); one transient materialization of the small
    // (doc, band, sig, split) frame serves both
    val bands = graft.TransientCache.register(
      mh.select(col("doc_id"), posexplode(bandSigs).as(Seq("band", "sig")))
        .join(splits, Seq("doc_id"))
        .cache())
    val evalBands = bands.filter(col("split") =!= "train")
      .select(col("doc_id").as("eval_id"), col("split"), col("band"), col("sig"))
    val trainBands = bands.filter(col("split") === "train")
      .select(col("doc_id").as("train_id"), col("band"), col("sig"))
    // consumed by the doc restriction AND the verify join (TransientCache
    // eviction discipline, as q72)
    val cand = graft.TransientCache.register(
      evalBands.join(trainBands, Seq("band", "sig"))
        .select(col("eval_id"), col("split"), col("train_id")).distinct()
        .cache())
    val candDocs = cand
      .select(explode(array(col("eval_id"), col("train_id"))).as("doc_id"))
      .distinct()
    val docSets = graft.TransientCache.register(
      shingles
        .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .groupBy(col("doc_id")).agg(collect_list(col("sh_h")).as("sh"))
        .cache()) // consumed from two join branches
    cand
      .join(docSets.select(col("doc_id").as("eval_id"), col("sh").as("sha")),
        Seq("eval_id"))
      .join(docSets.select(col("doc_id").as("train_id"), col("sh").as("shb")),
        Seq("train_id"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jaccard") >= Dedup.JaccardThreshold)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("eval_id"))
          .orderBy(col("jaccard").desc, col("train_id"))))
      .filter(col("rn") === 1)
      .select(col("eval_id"), col("split"), col("train_id"), col("jaccard"))
      .orderBy(col("eval_id"))
  }

  val splitLeakageSql: String = {
    import Dedup.{A, B, Bands, P, Rows}
    val minCols = A.indices
      .map(j => s"min((${A(j)} * x + ${B(j)}) % $P) AS v$j")
      .mkString(",\n      |    ")
    val bandSelects = (0 until Bands).map { bd =>
      val vs = (0 until Rows).map(r => s"v${bd * Rows + r}").mkString(", ")
      s"SELECT doc_id, $bd AS band, concat_ws('-', $vs) AS sig FROM mh"
    }.mkString("\n      |  UNION ALL ")
    s"""WITH ${Dedup.shCte},
      |split AS (SELECT doc_id,
      |  CASE WHEN ${hash60Sql("text")} % 100 < $TrainPct THEN 'train'
      |       WHEN ${hash60Sql("text")} % 100 < ${TrainPct + ValPct} THEN 'val'
      |       ELSE 'test' END AS split
      |  FROM documents),
      |xh AS (SELECT doc_id, sh_h % $P AS x FROM shx),
      |mh AS (
      |  SELECT doc_id,
      |    $minCols
      |  FROM xh GROUP BY doc_id),
      |bands AS (
      |  $bandSelects),
      |eb AS (
      |  SELECT b.doc_id AS eval_id, s.split, b.band, b.sig
      |  FROM bands b JOIN split s ON s.doc_id = b.doc_id
      |  WHERE s.split <> 'train'),
      |tb AS (
      |  SELECT b.doc_id AS train_id, b.band, b.sig
      |  FROM bands b JOIN split s ON s.doc_id = b.doc_id
      |  WHERE s.split = 'train'),
      |cand AS (
      |  SELECT DISTINCT e.eval_id, e.split, t.train_id
      |  FROM eb e JOIN tb t ON e.band = t.band AND e.sig = t.sig),
      |ds AS (SELECT doc_id, $shingles3Sql AS sh FROM toks),
      |v AS (
      |  SELECT c.eval_id, c.split, c.train_id,
      |    len(list_intersect(sa.sh, sb.sh)) AS inter,
      |    len(sa.sh) AS na, len(sb.sh) AS nb
      |  FROM cand c
      |  JOIN ds sa ON sa.doc_id = c.eval_id
      |  JOIN ds sb ON sb.doc_id = c.train_id),
      |j AS (
      |  SELECT eval_id, split, train_id,
      |    CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
      |  FROM v
      |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= ${Dedup.JaccardThreshold}),
      |r AS (
      |  SELECT eval_id, split, train_id, jaccard,
      |    row_number() OVER (PARTITION BY eval_id
      |      ORDER BY jaccard DESC, train_id) AS rn
      |  FROM j)
      |SELECT eval_id, split, train_id, jaccard FROM r WHERE rn = 1
      |ORDER BY eval_id""".stripMargin
  }
}
