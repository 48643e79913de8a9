package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class LedgerEvent(fecha: Timestamp, tienda_id: Int, art_id: Long,
                       delta_cantidad: Option[Long])

/** Structured-Streaming incremental layer: micro-batch ingest with
  * event-time watermark + idempotent last-wins parquet sink.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming daily net upserts idempotently across micro-batches") {
    val sql = spark.sqlContext
    import sql.implicits._
    val tmp = Files.createTempDirectory("graft-stream").toString
    val sink = s"$tmp/sink"
    val ckpt = s"$tmp/ckpt"

    val stream = MemoryStream[LedgerEvent](spark)
    val daily = StreamingIngest.dailyNetStream(stream.toDF())

    stream.addData(
      LedgerEvent(ts("2025-01-01 10:00:00"), 1, 7L, Some(5L)),
      LedgerEvent(ts("2025-01-01 11:00:00"), 1, 7L, Some(3L)),
      LedgerEvent(ts("2025-01-02 09:00:00"), 1, 7L, Some(-2L)))
    StreamingIngest.upsertSink(daily, sink, ckpt).start().awaitTermination()

    val r1 = spark.read.parquet(sink)
      .select("dia", "daily_delta").orderBy("dia")
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
    assert(r1 == Seq(("2025-01-01", 8L), ("2025-01-02", -2L)))

    // second micro-batch: a late event for day 1 (inside lateness) and a
    // new day — day-1 row must be UPDATED (last-wins), not duplicated
    stream.addData(
      LedgerEvent(ts("2025-01-01 23:00:00"), 1, 7L, Some(10L)),
      LedgerEvent(ts("2025-01-03 08:00:00"), 1, 7L, Some(1L)))
    StreamingIngest.upsertSink(daily, sink, ckpt).start().awaitTermination()

    val r2 = spark.read.parquet(sink)
      .select("dia", "daily_delta").orderBy("dia")
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
    assert(r2 == Seq(("2025-01-01", 18L), ("2025-01-02", -2L), ("2025-01-03", 1L)))

    // key uniqueness: exactly one row per (store, sku, day)
    val dups = spark.read.parquet(sink)
      .groupBy("tienda_id", "art_id", "dia").count().filter(col("count") > 1)
    assert(dups.isEmpty)
  }

  test("the streaming aggregation plan also runs in plain batch mode") {
    val sql = spark.sqlContext
    import sql.implicits._
    val batch = Seq(
      LedgerEvent(ts("2025-02-01 10:00:00"), 2, 1L, Some(4L)),
      LedgerEvent(ts("2025-02-01 12:00:00"), 2, 1L, None),
      LedgerEvent(ts("2025-02-02 10:00:00"), 2, 1L, Some(6L))).toDF()
    val out = StreamingIngest.dailyNetStream(batch)
      .select("dia", "daily_delta", "n_events").orderBy("dia")
      .collect().map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("2025-02-01", 4L, 2L), ("2025-02-02", 6L, 1L)))
  }
}
