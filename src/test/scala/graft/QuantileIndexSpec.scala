package graft

import graft.operators.{Analytics, QuantileIndex}
import graft.pipelines.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q119 incremental-quantile index: incremental ≡ rebuild equality and
  * the four crash windows of the advance contract, each reconstructed
  * (the InBatchRedelivery / crash-seam discipline).
  */
class QuantileIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def freshRoot =
    java.nio.file.Files.createTempDirectory("tqidx_spec_").toString
  private def docs = Tables.documents(spark, dir)
  private def corpus = docs.filter(col("doc_id") % 10 < 8)
  private def batch = docs.filter(col("doc_id") % 10 >= 8)

  private def advance(root: String, b: DataFrame): Unit = {
    QuantileIndex.advance(spark, root, b)
    TransientCache.drain()
  }

  /** The effective histogram (Σnv at the ledger's finest
    * (g, source, v) grain) at rest under `root`.
    */
  private def histOf(root: String): Set[(String, String, Long, Long)] =
    new Warehouse(spark, root).read("tq_hist")
      .groupBy(col("g"), col("source"), col("v"))
      .agg(sum(col("nv")).as("nv"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  /** A clean two-night reference root: corpus, then batch. */
  private def cleanTwoNights(): String = {
    val r = freshRoot
    advance(r, corpus)
    advance(r, batch)
    r
  }

  test("incremental == rebuild: q119 equals q116 row for row") {
    val want = Analytics.groupedQuantiles(spark, dir).collect().toSeq
    TransientCache.drain()
    val got = QuantileIndex.deltaQuantiles(spark, dir).collect().toSeq
    TransientCache.drain()
    assert(got == want)
  }

  test("incremental == rebuild: q120 equals q118 row for row") {
    val want = Analytics.winsorizedStats(spark, dir).collect().toSeq
    TransientCache.drain()
    val got = QuantileIndex.deltaWinsorized(spark, dir).collect().toSeq
    TransientCache.drain()
    assert(got == want)
  }

  test("advance: committed night replays as a no-op; in-batch dups drop") {
    val root = freshRoot
    advance(root, corpus)
    val seeded = histOf(root)
    advance(root, corpus) // full redelivery of a committed night
    assert(histOf(root) == seeded)
    advance(root, batch.unionByName(batch)) // in-batch duplication
    assert(histOf(root) == histOf(cleanTwoNights()))
  }

  test("advance: crash after hist append, before manifest swap, converges") {
    val root = freshRoot
    advance(root, corpus)
    // reconstruct window 3: the night's delta fully appended, manifest
    // NOT swapped — byte-identical rows to what the advance derives
    val wh = new Warehouse(spark, root)
    val vals = QuantileIndex.valsOf(batch.dropDuplicates("doc_id"))
    val delta = vals.groupBy(col("g"), col("source"), col("v"))
      .agg(count(lit(1)).as("nv"))
      .crossJoin(broadcast(QuantileIndex.docSetKey(vals)))
      .select(col("batch_key"), col("g"), col("source"), col("v"), col("nv"))
    wh.append("tq_hist", delta)
    advance(root, batch) // the replay
    assert(histOf(root) == histOf(cleanTwoNights()),
      "replay after the un-swapped crash must not double-count")
    val committed = histOf(root)
    advance(root, batch) // and the night is now committed
    assert(histOf(root) == committed)
  }

  test("advance: crash mid-append (half the delta rows) converges") {
    val root = freshRoot
    advance(root, corpus)
    val wh = new Warehouse(spark, root)
    val vals = QuantileIndex.valsOf(batch.dropDuplicates("doc_id"))
    val delta = vals.groupBy(col("g"), col("source"), col("v"))
      .agg(count(lit(1)).as("nv"))
      .crossJoin(broadcast(QuantileIndex.docSetKey(vals)))
      .select(col("batch_key"), col("g"), col("source"), col("v"), col("nv"))
    wh.append("tq_hist", delta.where(pmod(col("v"), lit(2)) === 0))
    advance(root, batch) // the replay appends exactly the missing rows
    assert(histOf(root) == histOf(cleanTwoNights()))
  }

  test("advance: cross-night redelivery anti-joins away") {
    val root = freshRoot
    advance(root, corpus)
    advance(root, docs.filter(col("doc_id") % 10 === 8))
    // night 3 redelivers night 2's docs alongside the novel ones
    advance(root, batch)
    assert(histOf(root) == histOf(cleanTwoNights()))
  }

  test("advance: empty nights — cold seed and warm no-op") {
    val root = freshRoot
    advance(root, docs.limit(0)) // cold warehouse, empty first night
    val wh = new Warehouse(spark, root)
    assert(wh.exists("tq_hist") && wh.exists("tq_docs"))
    assert(wh.read("tq_hist").isEmpty && wh.read("tq_docs").isEmpty)
    advance(root, corpus) // the real seed rides the normal advance
    val seeded = histOf(root)
    advance(root, corpus.limit(0)) // warm empty night: no-op
    assert(histOf(root) == seeded)
    val clean = freshRoot
    advance(clean, corpus)
    assert(seeded == histOf(clean))
  }

  test("reads come from the at-rest ledger: a poisoned index is visible") {
    // the q113/q115 discipline: if the read path rescanned the corpus,
    // corrupting the ledger would be invisible — so corrupt it and
    // require the output to move
    val root = freshRoot
    advance(root, corpus)
    val wh = new Warehouse(spark, root)
    val firstLang = wh.read("tq_hist").select(col("g")).head().getString(0)
    wh.write("tq_hist", wh.read("tq_hist").where(col("g") =!= firstLang))
    QuantileIndex.installIndex(spark, dir, root)
    try {
      val got = QuantileIndex.deltaQuantiles(spark, dir).collect().toSeq
      TransientCache.drain()
      val want = Analytics.groupedQuantiles(spark, dir).collect().toSeq
      TransientCache.drain()
      assert(got != want, "poisoned ledger must show in the read")
    } finally QuantileIndex.clearIndex(spark)
  }

  test("streaming twin: micro-batched nights land the batch state") {
    val root = freshRoot
    val wh = new Warehouse(spark, root)
    graft.streaming.StreamingQuantileIndex.processBatch(wh, corpus, 0L)
    TransientCache.drain()
    graft.streaming.StreamingQuantileIndex.processBatch(wh, batch, 1L)
    TransientCache.drain()
    // a redelivered micro-batch (at-least-once delivery) is a no-op
    graft.streaming.StreamingQuantileIndex.processBatch(wh, batch, 2L)
    TransientCache.drain()
    assert(histOf(root) == histOf(cleanTwoNights()))
  }
}
