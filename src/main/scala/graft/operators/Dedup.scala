package graft.operators

import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus deduplication over `documents` — exact, n-gram-Jaccard,
  * MinHash+LSH, and SimHash near-dup detection. Training-data pipeline
  * extensions (no reference counterpart); the algorithms follow the
  * standard Broder'97 minhash / Charikar'02 simhash recipes as used in
  * LLM-corpus dedup.
  *
  * Scale design:
  *  - Pairwise similarity is NEVER computed by cross join. Exact Jaccard
  *    uses an inverted shingle index (self-equi-join on shingle hash —
  *    shuffle keyed by shingle, pair count bounded by shingle df²);
  *    MinHash/SimHash generate candidates by banding (equi-join on band
  *    signature) and only verify the candidates. That is the 100 TB path:
  *    cost scales with collisions, not corpus².
  *  - Shingles are joined on their 60-bit hash, not the string — shuffle
  *    rows are fixed-width.
  *  - Everything is built-in expressions + hash aggregations; partial aggs
  *    run map-side, and AQE handles the (power-law) shingle-frequency skew.
  */
object Dedup {

  // MinHash family h_j(x) = (a_j*x + b_j) mod P over 60-bit shingle hashes
  // reduced mod P. 16 hashes = 4 bands × 4 rows → LSH threshold s ≈
  // (1/4)^(1/4) ≈ 0.71 steepest, catches >=0.2 pairs with the verify pass.
  val P = 1000000007L
  val A: Seq[Long] = Seq(7, 13, 31, 43, 59, 73, 97, 113, 131, 151, 173, 193, 211, 233, 251, 271)
  val B: Seq[Long] = Seq(3, 17, 29, 41, 53, 71, 89, 107, 127, 149, 167, 191, 209, 229, 241, 263)
  val Bands = 4
  val Rows = 4
  val JaccardThreshold = 0.2

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), shingles3(toks(col("text"))).as("sh"))

  /** `(doc_id, sh_h)` — exploded inverted-index rows, shingle as 60-bit hash. */
  private def shingleIndex(spark: SparkSession, dir: String): DataFrame =
    docShingles(spark, dir)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), hash60(col("s")).as("sh_h"))

  private val shCte =
    s"""toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |sh AS (SELECT doc_id, unnest($shingles3Sql) AS s FROM toks),
      |shx AS (SELECT doc_id, ${hash60Sql("s")} AS sh_h FROM sh)""".stripMargin

  /** Exact dedup: whitespace-normalized md5 group, canonical = min doc_id.
    * The groupBy key is the hash, so the shuffle carries 32-byte keys
    * regardless of document size.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(array_join(toks(col("text")), " ")).as("k"))
      .groupBy(col("k"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_docs"))
      .select(col("canonical_id"), col("n_docs"), col("k"))
      .orderBy(col("canonical_id"))

  val exactDedupSql: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |k AS (SELECT doc_id, md5(array_to_string(t, ' ')) AS k FROM toks)
      |SELECT min(doc_id) AS canonical_id, count(*) AS n_docs, k
      |FROM k GROUP BY k ORDER BY canonical_id""".stripMargin

  /** Exact pairwise n-gram Jaccard ≥ 0.2 via inverted shingle index:
    * shared counts from a self-equi-join on shingle hash, per-doc sizes
    * joined back, |A∩B| / (|A|+|B|−|A∩B|). No cross join anywhere.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleIndex(spark, dir).cache()
    val n = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("da"), col("sh_h"))
    val b = sh.select(col("doc_id").as("db"), col("sh_h"))
    val shared = a.join(b, Seq("sh_h")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("shared"))
    shared
      .join(n.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), Seq("da"))
      .join(n.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), Seq("db"))
      .withColumn("jaccard",
        round(col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 6))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("da"), col("db"), col("jaccard"))
      .orderBy(col("da"), col("db"))
  }

  val ngramJaccardSql: String =
    s"""WITH $shCte,
      |n AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY doc_id),
      |shared AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
      |  FROM shx a JOIN shx b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT da, db,
      |  round(CAST(shared AS DOUBLE) / (na.n + nb.n - shared), 6) AS jaccard
      |FROM shared JOIN n na ON na.doc_id = da JOIN n nb ON nb.doc_id = db
      |WHERE round(CAST(shared AS DOUBLE) / (na.n + nb.n - shared), 6) >= $JaccardThreshold
      |ORDER BY da, db""".stripMargin

  /** MinHash signatures + LSH banding + candidate verification.
    * Pipeline: shingle-hash → 16 minhashes (explode of the hash-function
    * index, hash-agg min) → band signatures (4×4) → equi-join on
    * (band, signature) for candidates → verify with exact Jaccard via
    * array_intersect on the (small) candidate set only.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val aLit = typedLit(A)
    val bLit = typedLit(B)
    val shx = shingleIndex(spark, dir)
      .withColumn("x", col("sh_h") % P)
    // 16 rows per shingle instance; min per (doc, j) — partial agg map-side.
    val mh = shx
      .select(col("doc_id"), col("x"), explode(sequence(lit(0), lit(A.size - 1))).as("j"))
      .withColumn("hv",
        (element_at(aLit, col("j") + 1) * col("x") + element_at(bLit, col("j") + 1)) % P)
      .groupBy(col("doc_id"), col("j")).agg(min(col("hv")).as("v"))
    // 4-row band signature via manual pivot (portable ordered concat).
    def rowv(k: Int): Column = min(when(col("j") % Rows === k, col("v")))
    val bands = mh.withColumn("band", (col("j") / Rows).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(concat_ws("-", rowv(0), rowv(1), rowv(2), rowv(3)).as("sig"))
    val cand = bands.as("ba")
      .join(bands.as("bb"),
        col("ba.band") === col("bb.band") && col("ba.sig") === col("bb.sig") &&
          col("ba.doc_id") < col("bb.doc_id"))
      .select(col("ba.doc_id").as("da"), col("bb.doc_id").as("db"))
      .distinct()
    val ds = docShingles(spark, dir)
    cand
      .join(ds.select(col("doc_id").as("da"), col("sh").as("sa")), Seq("da"))
      .join(ds.select(col("doc_id").as("db"), col("sh").as("sb")), Seq("db"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")), 6))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("da"), col("db"), col("jaccard"))
      .orderBy(col("da"), col("db"))
  }

  val minhashLshSql: String = {
    val aSqlList = A.mkString("[", ",", "]")
    val bSqlList = B.mkString("[", ",", "]")
    s"""WITH $shCte,
      |xh AS (SELECT doc_id, sh_h % $P AS x FROM shx),
      |mh AS (
      |  SELECT doc_id, j, min(($aSqlList[CAST(j AS INT)+1] * x + $bSqlList[CAST(j AS INT)+1]) % $P) AS v
      |  FROM xh CROSS JOIN (SELECT unnest(range(0, ${A.size})) AS j) js
      |  GROUP BY doc_id, j),
      |bands AS (
      |  SELECT doc_id, CAST(j // $Rows AS INT) AS band,
      |    concat_ws('-', min(CASE WHEN j % $Rows = 0 THEN v END),
      |                   min(CASE WHEN j % $Rows = 1 THEN v END),
      |                   min(CASE WHEN j % $Rows = 2 THEN v END),
      |                   min(CASE WHEN j % $Rows = 3 THEN v END)) AS sig
      |  FROM mh GROUP BY doc_id, band),
      |cand AS (
      |  SELECT DISTINCT ba.doc_id AS da, bb.doc_id AS db
      |  FROM bands ba JOIN bands bb
      |    ON ba.band = bb.band AND ba.sig = bb.sig AND ba.doc_id < bb.doc_id),
      |ds AS (SELECT doc_id, $shingles3Sql AS sh FROM toks),
      |v AS (
      |  SELECT da, db, len(list_intersect(sa.sh, sb.sh)) AS inter,
      |    len(sa.sh) AS na, len(sb.sh) AS nb
      |  FROM cand JOIN ds sa ON sa.doc_id = da JOIN ds sb ON sb.doc_id = db)
      |SELECT da, db, round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
      |FROM v WHERE round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) >= $JaccardThreshold
      |ORDER BY da, db""".stripMargin
  }

  /** 32-bit SimHash signature per document: frequency-weighted bit votes
    * over token hashes. Explode is (tokens × 32) rows, but the two-level
    * hash-agg runs partials map-side so the shuffle carries only
    * (doc, bit) partial sums.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashSig(spark, dir).orderBy(col("doc_id"))

  private def simhashSig(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", hash60(col("token")))
    tok
      .select(col("doc_id"), col("cnt"), col("h"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("vote",
        col("cnt") * (expr("(shiftright(h, b) & 1)") * 2 - 1))
      .groupBy(col("doc_id"), col("b")).agg(sum(col("vote")).as("vote"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("vote") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)"))
        .otherwise(0L)).as("simhash"))
  }

  private val simhashCte: String =
    s"""toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
      |tc AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
      |th AS (SELECT doc_id, cnt, ${hash60Sql("token")} AS h FROM tc),
      |votes AS (
      |  SELECT doc_id, b, sum(cnt * (((h >> CAST(b AS INT)) & 1) * 2 - 1)) AS vote
      |  FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS b) bs
      |  GROUP BY doc_id, b),
      |sig AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS simhash
      |  FROM votes GROUP BY doc_id)""".stripMargin

  val simhashSql: String =
    s"""WITH $simhashCte
      |SELECT doc_id, CAST(simhash AS BIGINT) AS simhash FROM sig ORDER BY doc_id""".stripMargin

  /** SimHash near-dup pairs: candidates from 8-bit band collisions (any of
    * the 4 bytes equal — by pigeonhole, hamming ≤ 3 over 4 bytes leaves at
    * least one byte untouched, so banding has perfect recall at this
    * threshold), verified by exact Hamming distance ≤ 3.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashSig(spark, dir)
    val banded = sig.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("byte", expr("shiftright(simhash, k * 8) & 255"))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.k") === col("y.k") && col("x.byte") === col("y.byte") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("x.simhash").as("ha"),
        col("y.doc_id").as("db"), col("y.simhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= 3)
      .select(col("da"), col("db"), col("hamming"))
      .orderBy(col("da"), col("db"))
  }

  val simhashPairsSql: String =
    s"""WITH $simhashCte,
      |banded AS (
      |  SELECT doc_id, CAST(simhash AS BIGINT) AS simhash, k,
      |    (CAST(simhash AS BIGINT) >> (CAST(k AS INT) * 8)) & 255 AS byte
      |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS k) ks),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS da, x.simhash AS ha, y.doc_id AS db, y.simhash AS hb
      |  FROM banded x JOIN banded y
      |    ON x.k = y.k AND x.byte = y.byte AND x.doc_id < y.doc_id)
      |SELECT da, db, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
      |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
      |ORDER BY da, db""".stripMargin
}
