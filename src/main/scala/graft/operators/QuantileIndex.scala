package graft.operators

import graft.Tables
import graft.functions.TextFns.toks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q119 — the INCREMENTAL grouped-quantile index: exact per-language
  * token-count quantiles (q116's output, bit for bit) maintained
  * nightly WITHOUT ever rescanning — or re-tokenizing — the corpus.
  * The seventh member of the incremental-index family, and the one
  * that closes the loop between the delta taxonomy and the rank
  * engine: what lives at rest is exactly the collapsed (g, v, nv)
  * histogram [[Analytics.rankCutsHist]] consumes, so the read path
  * feeds the ledger straight into the two-tier engine with no
  * raw-value pass at all.
  *
  * Why a histogram is the RIGHT at-rest state for quantiles: exact
  * order statistics are not decomposable (no per-night mergeable
  * scalar exists, unlike q109's max-algebra HLL registers), but the
  * tie-collapsed histogram IS additive — a night's counts simply add —
  * and it is bounded by the value support (|langs| · |distinct token
  * counts|), not the corpus. Tokenization, the expensive projection,
  * runs exactly once per document ever: on the night it arrives.
  *
  * At-rest tables:
  *   - `tq_hist` (batch_key, g, v, nv): per-night collapsed counts,
  *     append-only, row-level guarded by a (batch_key, g, v)
  *     anti-join; reads aggregate Σnv by (g, v) — the q115 additive
  *     ledger discipline, compacted on cadence.
  *   - `tq_docs` (doc_id): the counted-document manifest, REWRITTEN
  *     via tmp-swap each night — the night's atomic commit point.
  *
  * Crash contract (the taxonomy's two guards composed — manifest
  * anti-join for CROSS-night redelivery, batch-key rows for IN-night
  * partial appends — with the swap ordering carrying the proof):
  *
  *   1. `batch_key` is a pure function of the NOVEL doc-id set, and
  *      the novel set is a pure function of (offered batch, committed
  *      manifest). The manifest only advances in step 4, so every
  *      replay of an uncommitted night re-derives the identical key
  *      and identical delta rows.
  *   2. Crash mid-append of `tq_hist` → the replay's (batch_key, g, v)
  *      anti-join appends exactly the missing rows.
  *   3. Crash after the append, before the manifest swap → the replay
  *      appends nothing (every row anti-joins away) and completes the
  *      swap.
  *   4. Crash after the swap → the replay's novel set is EMPTY and the
  *      advance no-ops: the swapped manifest is the marker, committed
  *      atomically (`Fs.replaceWith`), so it cannot lie about which
  *      documents are in the histogram.
  *
  * The manifest swap is a full rewrite (O(|corpus| doc-ids/night) —
  * 8-byte rows, the same nightly state-rewrite bill q113's `ret_user`
  * and q115's `tr_last` already pay), and it is what buys the
  * aggregated histogram: an APPENDED manifest could commit partially,
  * and a half-committed doc set changes the replay's novel set — and
  * with it `batch_key` — double-counting the already-appended rows
  * under a fresh key. Swap-last makes the manifest all-or-nothing.
  *
  * In-batch redelivery (a doc offered twice in ONE night) is dropped
  * at the entry (`dropDuplicates("doc_id")`, the InBatchRedelivery
  * discipline); a doc REVISED in a later night is out of scope, as in
  * every sibling family (ingest is append-only by the §2.9 contract).
  */
object QuantileIndex {

  /** q116's null-group sentinel, genuinely shared now: the ONE
    * [[Analytics.NullGroup]] constant (NUL, written as the escape), so
    * a reader borrowing q116's mapping reads this ledger's at-rest
    * rows correctly — the r14 split (q116 on NUL, this ledger on a
    * space, a plausible dirty lang value) is closed. Migration rule
    * for a production ledger written under the old sentinel lives on
    * the constant's scaladoc; the in-harness fixture index is
    * memoized per session, so nothing persisted migrates here.
    */
  private val Sentinel = Analytics.NullGroup

  /** The per-document (doc_id, g, source, v) projection — the ONLY
    * place the corpus text is ever tokenized, and it only ever sees a
    * night's novel documents. Both group keys ride: the at-rest
    * histogram stores the FINEST grouping any reader needs
    * ((lang, source, v) — still value-support-bounded) and each reader
    * marginalizes the keys it doesn't group by — the cube-at-rest
    * discipline that lets ONE index serve the q119 quantile reader
    * (by lang) and the q120 winsorized reader (by source).
    */
  private[graft] def valsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      coalesce(col("lang"), lit(Sentinel)).as("g"),
      col("source"),
      size(toks(col("text"))).cast("long").as("v"))

  /** Deterministic key of the night's NOVEL doc set (the Corpus
    * `docSetKey` discipline — order-free xor fold + cardinality).
    * Internal guard key only: never compared against the oracle, so it
    * stays native xxhash64 in every hash mode.
    */
  private[graft] def docSetKey(vals: DataFrame): DataFrame =
    vals.agg(
      coalesce(bit_xor(xxhash64(col("doc_id"))), lit(0L)).as("h"),
      count(lit(1)).as("nd"))
      .select(xxhash64(col("h"), col("nd")).as("batch_key"))

  /** Nightly advance: fold the batch's novel documents into the
    * at-rest histogram. Replay-convergent per the crash contract above;
    * a fully committed night is a cheap no-op (one anti-join probe).
    */
  def advance(spark: SparkSession, root: String, rawBatch: DataFrame): Unit = {
    val wh = new graft.pipelines.Warehouse(spark, root)
    val batch = rawBatch.dropDuplicates("doc_id")
    val cold = !wh.exists("tq_docs")
    val novel =
      if (cold) batch
      else batch.join(wh.read("tq_docs"), Seq("doc_id"), "left_anti")
    // 3 narrow columns, consumed by the emptiness probe, the set key,
    // the delta agg and the manifest union — cache before fan-out
    val vals = graft.TransientCache.register(valsOf(novel).cache())
    if (!cold && vals.isEmpty) return // night already committed
    val key = docSetKey(vals)
    val delta = vals.groupBy(col("g"), col("source"), col("v"))
      .agg(count(lit(1)).as("nv"))
      .crossJoin(broadcast(key))
      .select(col("batch_key"), col("g"), col("source"), col("v"), col("nv"))
    val guarded =
      if (!wh.exists("tq_hist")) delta
      else delta.join(
        wh.read("tq_hist")
          .select(col("batch_key"), col("g"), col("source"), col("v")),
        Seq("batch_key", "g", "source", "v"), "left_anti")
    if (!wh.exists("tq_hist")) wh.write("tq_hist", guarded)
    else wh.append("tq_hist", guarded)
    wh.compactIfFragmented("tq_hist")
    // manifest tmp-swap LAST — the atomic commit point of the night
    val man = vals.select(col("doc_id"))
    wh.write("tq_docs",
      if (cold) man else wh.read("tq_docs").unionByName(man))
  }

  // ---------- fixture index (memoized per context+dir, the q113/q115
  // time-split discipline transposed to the doc tier's % 10 split)

  private val memo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.SparkContext, String), String]
  private val createdRoots = scala.collection.mutable.Set.empty[String]

  /** The fixture's at-rest index: corpus = `doc_id % 10 < 8` (q61/q74's
    * seen-corpus convention), seeded through the SAME advance path — a
    * cold warehouse's first night IS the seed.
    */
  private[graft] def indexAtRest(spark: SparkSession, dir: String): String = {
    val key = (spark.sparkContext, dir)
    memo.get(key).getOrElse {
      val fresh =
        java.nio.file.Files.createTempDirectory("graft_tqidx_").toString
      advance(spark, fresh,
        Tables.documents(spark, dir).filter(col("doc_id") % 10 < 8))
      memo.putIfAbsent(key, fresh) match {
        case Some(winner) =>
          graft.pipelines.Fs.delete(spark, fresh); winner
        case None =>
          createdRoots.synchronized { createdRoots += fresh }
          fresh
      }
    }
  }

  /** Test seam — inject an index root. */
  private[graft] def installIndex(spark: SparkSession, dir: String,
                                  root: String): Unit =
    memo.put((spark.sparkContext, dir), root)

  /** Drop this context's memoized indexes; owned roots deleted. */
  def clearIndex(spark: SparkSession): Unit =
    memo.keys.filter(_._1 eq spark.sparkContext).foreach { k =>
      memo.remove(k).foreach { root =>
        val owned = createdRoots.synchronized { createdRoots.remove(root) }
        if (owned) graft.pipelines.Fs.delete(spark, root)
      }
    }

  /** q119 — q116's exact grouped quantiles over corpus + tonight's
    * batch WITHOUT rescanning the corpus: the corpus side is the
    * at-rest histogram ledger (Σnv by (g, v) — value-support-bounded
    * rows, no text, no tokenizer), the batch side is one night's
    * uncommitted delta merged at query time (the q115 shape), and the
    * merged histogram enters [[Analytics.rankCutsHist]] directly.
    * Oracle = q116's full-scan SQL VERBATIM — the hash compare proves
    * incremental ≡ rebuild bit-for-bit (the q109/q113/q115 discipline,
    * now for exact order statistics).
    */
  def deltaQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val root = indexAtRest(spark, dir)
    val wh = new graft.pipelines.Warehouse(spark, root)
    val batch = Tables.documents(spark, dir).filter(col("doc_id") % 10 >= 8)
    val night = valsOf(batch)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("nv"))
    val merged = graft.TransientCache.register(
      wh.read("tq_hist").select(col("g"), col("v"), col("nv"))
        .unionByName(night)
        .groupBy(col("g"), col("v")).agg(sum(col("nv")).as("nv"))
        .cache())
    merged.count()
    val cuts = Analytics.rankCutsHist(merged, "g",
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).map { case (nm, q) =>
        nm -> ((n: org.apache.spark.sql.Column) =>
          floor((n - 1) * lit(q)).cast("long") + lit(1L))
      })
    cuts.select(
        when(col("g") === lit(Sentinel), lit(null).cast("string"))
          .otherwise(col("g")).as("lang"),
        col("p50"), col("p90"), col("p99"), col("n").as("n_docs"))
      .orderBy(col("lang").asc_nulls_first)
  }

  /** Oracle: q116's (= q41's) full-scan formulation, verbatim — the
    * scan the incremental path must never need.
    */
  val deltaQuantilesSql: String = Analytics.groupedQuantilesSql

  /** q120 — q118's winsorized per-source statistics over corpus +
    * tonight's batch off the SAME at-rest index as q119: the ledger
    * stores the finest (lang, source, v) grouping, and this reader
    * marginalizes LANG where q119 marginalizes SOURCE — two readers,
    * one nightly advance, one tokenizer pass per document ever (the
    * cube-at-rest payoff; a lang-only histogram would force a second
    * index for the source profile). Read = Σnv by (source, v) over
    * ledger ∪ night, then [[Analytics.winsorizedOfHist]] verbatim —
    * so the output is q118's bit for bit, and the oracle is q118's
    * full-scan SQL VERBATIM (the incremental ≡ rebuild hash proof).
    */
  def deltaWinsorized(spark: SparkSession, dir: String): DataFrame = {
    val root = indexAtRest(spark, dir)
    val wh = new graft.pipelines.Warehouse(spark, root)
    val batch = Tables.documents(spark, dir).filter(col("doc_id") % 10 >= 8)
    val night = valsOf(batch)
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("nv"))
    val merged = graft.TransientCache.register(
      wh.read("tq_hist").select(col("source"), col("v"), col("nv"))
        .unionByName(night)
        .groupBy(col("source"), col("v")).agg(sum(col("nv")).as("nv"))
        .withColumnRenamed("source", "g")
        .cache())
    merged.count()
    Analytics.winsorizedOfHist(merged)
  }

  /** Oracle: q118's full-scan formulation, verbatim. */
  val deltaWinsorizedSql: String = Analytics.winsorizedStatsSql
}
