package graft

import java.nio.file.Files

import graft.operators.{Analytics, Dedup, QuantileIndex, Sessions, Similarity, Sketch}
import graft.pipelines.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Soak for the seven incremental-index streaming twins: ~20
  * micro-batches per family with at-least-once redeliveries injected
  * (every 5th batch is delivered twice, the serial-nights contract's
  * replay unit), asserting
  *
  *   (a) at-rest state stays calendar/value/entity-bounded, MEASURED
  *       after every batch — never a function of batch count or
  *       redelivery count;
  *   (b) a redelivered batch moves NO at-rest table (exactly-once
  *       effect, measured as row-count identity);
  *   (c) the final at-rest state ≡ one batch rebuild over the same
  *       data.
  *
  * Six families drive `processBatch` directly — the foreachBatch body
  * IS the batch advance (streamed ≡ batch is an identity of code,
  * proven per-family by the StreamingSpec sink+checkpoint tests); the
  * quantile family additionally soaks through a REAL checkpointed
  * stream: 20 separate AvailableNow runs against one checkpoint, i.e.
  * 20 restarts.
  */
class StreamingSoakSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val dir01 = "/root/testdata/sf0.01"
  private val Batches = 20

  private def tmpRoot(tag: String): String =
    Files.createTempDirectory(s"graft_soak_${tag}_").toString

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  /** Redelivery cadence: batch i is processed twice when i % 5 == 4 —
    * always the LATEST batch (the serial-nights contract: a crashed
    * night replays before the next is offered).
    */
  private def withReplay(i: Int)(run: () => Unit): Unit = {
    run()
    if (i % 5 == 4) run()
  }

  test("soak: quantile index — 20 checkpointed micro-batch nights + replays stay value-bounded; final == rebuild") {
    val sql = spark.sqlContext
    import sql.implicits._
    import graft.streaming.StreamingQuantileIndex
    import graft.streaming.StreamingQuantileIndex.QDoc
    val tmp = tmpRoot("tq")
    val wh = new Warehouse(spark, s"$tmp/wh")
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val support = QuantileIndex.valsOf(docs)
      .select(col("g"), col("source"), col("v")).distinct().count()
    def slice(i: Int): Seq[QDoc] = docs.filter(col("doc_id") % Batches === i)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .as[QDoc].collect().toSeq

    val stream = MemoryStream[QDoc](spark)
    for (i <- 0 until Batches) {
      // a REAL micro-batch: one AvailableNow run per night against the
      // same checkpoint — every iteration is also a restart
      stream.addData(slice(i): _*)
      StreamingQuantileIndex.sink(stream.toDF(), wh, s"$tmp/ckpt")
        .start().awaitTermination()
      TransientCache.drain()
      if (i % 5 == 4) { // redelivery of the latest night, outside the stream
        StreamingQuantileIndex.processBatch(wh, slice(i).toDF(), i.toLong)
        TransientCache.drain()
      }
      // value/entity/calendar bounds, measured per batch
      assert(wh.read("tq_hist")
        .select(col("g"), col("source"), col("v")).distinct().count() <= support,
        s"night $i: tq_hist support outgrew the corpus value support")
      assert(wh.read("tq_docs").count() <= nDocs,
        s"night $i: manifest outgrew the offered doc set")
      assert(wh.read("tq_marker").count() <= i + 1,
        s"night $i: marker outgrew the night count")
    }
    // final at-rest state == one batch rebuild over all docs
    def hist(root: String): Map[(String, String, Long), Long] =
      new Warehouse(spark, root).read("tq_hist")
        .groupBy(col("g"), col("source"), col("v"))
        .agg(sum(col("nv")).as("nv")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
        .toMap
    val rb = tmpRoot("tqrb")
    QuantileIndex.advance(spark, rb, docs)
    TransientCache.drain()
    assert(hist(s"$tmp/wh") == hist(rb), "soaked ledger != one-shot rebuild")
    assert(wh.read("tq_docs").count() == nDocs)
  }

  test("soak: cardinality registers — 20 micro-batches + replays stay register-bounded; final == rebuild") {
    import graft.streaming.StreamingCardinality
    val wh = new Warehouse(spark, tmpRoot("hll"))
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    def slice(i: Int): DataFrame = docs.filter(col("doc_id") % Batches === i)
    for (i <- 0 until Batches) {
      withReplay(i)(() => StreamingCardinality.processBatch(wh, slice(i), i.toLong))
      assert(wh.read("hll_regs").count() <= Sketch.HllM,
        s"batch $i: register table outgrew m=${Sketch.HllM}")
      assert(wh.read("hll_log").count() == i + 1,
        s"batch $i: replays must not re-log readings")
    }
    val want = Sketch.registersOf(StreamingCardinality.batchHashes(docs))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val got = wh.read("hll_regs").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(got == want, "soaked registers != batch rebuild")
  }

  test("soak: retention index — 20 day-sliced nights + replays stay user/week-bounded; final == rebuild") {
    import graft.streaming.StreamingRetentionIndex
    val wh = new Warehouse(spark, tmpRoot("ret"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"),
        expr("unix_timestamp(ts) DIV 86400").as("day"))
    val b = ev.agg(min(col("day")), max(col("day"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val step = math.max(1L, (hi - lo + Batches) / Batches)
    val users = ev.select(col("user_id")).distinct().count()
    val userWeeks = ev.select(col("user_id"),
      expr("day DIV 7").as("w")).distinct().count()
    def slice(i: Int): DataFrame = ev
      .filter(col("day") >= lo + i * step && col("day") < lo + (i + 1) * step)
      .select(col("user_id"), col("ts"))
    for (i <- 0 until Batches) {
      // TIME-ordered slices (the in-order-per-user contract); trailing
      // slices may be empty — an empty night must no-op
      withReplay(i)(() => StreamingRetentionIndex.processBatch(wh, slice(i), i.toLong))
      assert(wh.read("ret_user").count() <= users,
        s"night $i: ret_user outgrew the user set")
      assert(wh.read("ret_weeks").count() <= userWeeks,
        s"night $i: ret_weeks outgrew the user-week support")
    }
    val rb = tmpRoot("retrb")
    Sessions.retentionIndexAt(spark, rb, Tables.events(spark, dir))
    val w2 = new Warehouse(spark, rb)
    assert(rowsOf(wh.read("ret_user")) == rowsOf(w2.read("ret_user")),
      "soaked ret_user != batch rebuild")
    assert(rowsOf(wh.read("ret_weeks")) == rowsOf(w2.read("ret_weeks")),
      "soaked ret_weeks != batch rebuild")
  }

  test("soak: transitions ledger — 20 day-sliced nights + replays stay nights x types^2-bounded; cells == batch matrix") {
    import graft.streaming.StreamingTransitionsIndex
    val wh = new Warehouse(spark, tmpRoot("tr"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("unix_timestamp(ts) DIV 86400").as("day"))
    val b = ev.agg(min(col("day")), max(col("day"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val step = math.max(1L, (hi - lo + Batches) / Batches)
    val types = ev.select(col("event_type")).distinct().count()
    val users = ev.select(col("user_id")).distinct().count()
    def slice(i: Int): DataFrame = ev
      .filter(col("day") >= lo + i * step && col("day") < lo + (i + 1) * step)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    for (i <- 0 until Batches) {
      withReplay(i)(() => StreamingTransitionsIndex.processBatch(wh, slice(i), i.toLong))
      assert(wh.read("tr_deltas").count() <= (i + 1) * types * types,
        s"night $i: ledger outgrew nights x |types|^2")
      assert(wh.read("tr_last").count() <= users,
        s"night $i: carry outgrew the user set")
    }
    val cells = wh.read("tr_deltas").groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n")).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = Sessions.sessionTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cells == want, "soaked ledger != batch q105 matrix")
  }

  test("soak: minhash index — 20 micro-batch nights + replays stay doc-bounded; final == one-shot append") {
    import graft.streaming.StreamingDedup
    Dedup.clearCorpusIndex(spark)
    val rootA = tmpRoot("mhA")
    Dedup.openCorpusIndex(spark, dir01, rootA)
    val wh = new Warehouse(spark, tmpRoot("mhwh"))
    val docs = Tables.documents(spark, dir01)
    val held = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))
    val total = docs.count()
    def slice(i: Int): DataFrame =
      held.filter(expr(s"doc_id DIV 10") % Batches === i)
    val whA = new Warehouse(spark, rootA)
    for (i <- 0 until Batches) {
      withReplay(i)(() =>
        StreamingDedup.processBatch(dir01, wh, slice(i), Some(rootA)))
      // entity bounds: the manifest never outgrows the docs ever
      // offered, and the data tables never hold docs off the manifest
      assert(whA.read("corpus_docs").count() <= total,
        s"night $i: manifest outgrew the corpus")
      assert(whA.read("corpus_band_index").select(col("doc_id")).distinct()
        .count() <= whA.read("corpus_docs").count(),
        s"night $i: band rows for unmanifested docs")
    }
    // final index state == one-shot append of the same docs
    Dedup.clearCorpusIndex(spark)
    val rootB = tmpRoot("mhB")
    Dedup.openCorpusIndex(spark, dir01, rootB)
    Dedup.appendToCorpusIndex(spark, dir01, held)
    val whB = new Warehouse(spark, rootB)
    for (t <- Seq("corpus_shingles", "corpus_band_index", "corpus_docs"))
      assert(rowsOf(whA.read(t)) == rowsOf(whB.read(t)),
        s"soaked $t != one-shot append")
    Dedup.clearCorpusIndex(spark)
  }

  test("soak: winnow index — 20 micro-batch nights + replays stay doc-bounded; final == one-shot append") {
    import graft.streaming.StreamingWinnow
    Dedup.clearWinnowIndexAtRest(spark)
    val rootA = tmpRoot("wnA")
    Dedup.openWinnowIndex(spark, dir01, rootA)
    val wh = new Warehouse(spark, tmpRoot("wnwh"))
    val docs = Tables.documents(spark, dir01)
    val held = docs.filter(col("doc_id") % 10 >= 8)
      .select(col("doc_id"), col("text"))
    val total = docs.count()
    def slice(i: Int): DataFrame =
      held.filter(expr(s"doc_id DIV 10") % Batches === i)
    val whA = new Warehouse(spark, rootA)
    for (i <- 0 until Batches) {
      withReplay(i)(() =>
        StreamingWinnow.processBatch(dir01, wh, slice(i), Some(rootA)))
      assert(whA.read("corpus_winnow_docs").count() <= total,
        s"night $i: manifest outgrew the corpus")
      assert(whA.read("corpus_winnow").select(col("doc_id")).distinct()
        .count() <= whA.read("corpus_winnow_docs").count(),
        s"night $i: fingerprint rows for unmanifested docs")
    }
    Dedup.clearWinnowIndexAtRest(spark)
    val rootB = tmpRoot("wnB")
    Dedup.openWinnowIndex(spark, dir01, rootB)
    Dedup.appendToWinnowIndex(spark, dir01, held)
    val whB = new Warehouse(spark, rootB)
    for (t <- Seq("corpus_winnow", "corpus_winnow_docs"))
      assert(rowsOf(whA.read(t)) == rowsOf(whB.read(t)),
        s"soaked $t != one-shot append")
    Dedup.clearWinnowIndexAtRest(spark)
  }

  test("soak: ann index — 20 micro-batch nights + replays stay vec-bounded; final == one-shot append") {
    import graft.streaming.StreamingAnn
    Similarity.clearAnnIndex(spark)
    Similarity.clearKmeansMemo(spark)
    val rootA = tmpRoot("annA")
    Similarity.openAnnIndex(spark, dir01, rootA)
    val wh = new Warehouse(spark, tmpRoot("annwh"))
    val emb = Tables.embeddings(spark, dir01)
    val held = emb.filter(col("vec_id") % 10 >= 8)
      .select(col("vec_id"), col("embedding"))
    val total = emb.count()
    def slice(i: Int): DataFrame =
      held.filter(expr(s"vec_id DIV 10") % Batches === i)
    val whA = new Warehouse(spark, rootA)
    for (i <- 0 until Batches) {
      withReplay(i)(() =>
        StreamingAnn.processBatch(dir01, wh, slice(i), Some(rootA)))
      assert(whA.read("corpus_codes").count() <= total,
        s"night $i: code table outgrew the vector set")
    }
    // the fit is frozen (memoized off the same corpus), so a one-shot
    // append must code every vector identically
    Similarity.clearAnnIndex(spark)
    val rootB = tmpRoot("annB")
    Similarity.openAnnIndex(spark, dir01, rootB)
    Similarity.appendToAnnIndex(spark, dir01, held)
    val whB = new Warehouse(spark, rootB)
    assert(rowsOf(whA.read("corpus_codes")) == rowsOf(whB.read("corpus_codes")),
      "soaked corpus_codes != one-shot append")
    Similarity.clearAnnIndex(spark)
  }
}
