package graft

import java.nio.file.Files

import graft.operators.{Sales, Stock}
import graft.pipelines.{InventoryPipeline, SalesPipeline, Warehouse}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end nightly-cycle semantics: incremental seed+update must equal
  * a one-shot full rebuild, and re-running any update must be a no-op
  * (idempotence) — the reference's §2.9 guarantees.
  */
class PipelinesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("graft-wh").toString)

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("sales: seed + incremental update == full rebuild; re-run is a no-op") {
    val wh = freshWh()
    val full = Sales.waterfallClean(spark, dir)
    val midId = full.agg(expr("percentile_approx(ven_id, 0.5)")).first().getLong(0)

    val n1 = SalesPipeline.update(wh, dir, upToId = Some(midId)) // seed half
    val n2 = SalesPipeline.update(wh, dir) // catch up
    assert(n1 > 0 && n2 > 0)
    assert(rowsOf(wh.read("ventas_limpias")) == rowsOf(full))

    val n3 = SalesPipeline.update(wh, dir) // nothing new
    assert(n3 == 0)
    assert(rowsOf(wh.read("ventas_limpias")) == rowsOf(full))
  }

  test("ledger: watermark append is exactly-once-effective") {
    val wh = freshWh()
    val fullLedger = Tables.ledger(spark, dir)
    val midTs = new java.sql.Timestamp(
      fullLedger.agg(expr("percentile_approx(unix_micros(fecha), 0.5)"))
        .first().getLong(0) / 1000)

    val n1 = InventoryPipeline.updateLedger(wh, dir, upToTs = Some(midTs))
    val n2 = InventoryPipeline.updateLedger(wh, dir)
    val n3 = InventoryPipeline.updateLedger(wh, dir)
    assert(n1 > 0 && n2 > 0 && n3 == 0)
    assert(wh.read("raw_stock_movements").count() == fullLedger.count())
    assert(rowsOf(wh.read("raw_stock_movements")) == rowsOf(fullLedger))
  }

  test("stock points: as-of-seeded incremental replay == full rebuild") {
    val wh = freshWh()
    val fullLedger = Tables.ledger(spark, dir)
    val midTs = new java.sql.Timestamp(
      fullLedger.agg(expr("percentile_approx(unix_micros(fecha), 0.5)"))
        .first().getLong(0) / 1000)

    // night 1: half the ledger, cold-start points
    InventoryPipeline.updateLedger(wh, dir, upToTs = Some(midTs))
    val nSeed = InventoryPipeline.refreshStockPoints(wh)
    assert(nSeed > 0)

    // night 2: rest of the ledger, incremental seeded replay
    InventoryPipeline.updateLedger(wh, dir)
    val nIncr = InventoryPipeline.refreshStockPoints(wh)
    assert(nIncr > 0)

    val expected = Stock.stockPointsFrom(fullLedger)
    assert(rowsOf(wh.read("stock_points")) == rowsOf(expected),
      "incremental change-point series must equal the full rebuild")

    // night 3: no new events — refresh must not change the table
    val before = rowsOf(wh.read("stock_points"))
    InventoryPipeline.refreshStockPoints(wh)
    assert(rowsOf(wh.read("stock_points")) == before)
  }
}
