package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY.md §2 is exposed as a named query over
  * the driver testdata, with an equivalent DuckDB oracle in [[oracleSql]]
  * (omitted only for non-SQL-expressible ops, which get rows-only checks).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Sales.sicarRollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_sicar_rollup" -> ((s, d) => Sales.sicarRollup(s, d)),
    "q02_legacy_agg" -> ((s, d) => Sales.legacyAgg(s, d)),
    "q03_waterfall_clean" -> ((s, d) => Sales.waterfallClean(s, d)),
    "q04_payment_qa" -> ((s, d) => Sales.paymentQa(s, d)),
    "q05_upsert_lastwins" -> ((s, d) => Incremental.upsertLastWins(s, d)),
    "q06_checkpoint_max" -> ((s, d) => Incremental.checkpointMax(s, d)),
    "q07_watermark_incr" -> ((s, d) => Incremental.watermarkIncrement(s, d)),
    "q08_union_ledger" -> ((s, d) => Ledger.unionLedgerQuery(s, d)),
    "q09_refilter_ledger" -> ((s, d) => Ledger.refilterLedger(s, d)),
    "q10_earliest_per_day" -> ((s, d) => Ledger.earliestPerDay(s, d)),
    "q11_daily_net" -> ((s, d) => Stock.dailyNet(s, d)),
    "q12_running_balance" -> ((s, d) => Stock.runningBalance(s, d)),
    "q13_stock_points" -> ((s, d) => Stock.stockPoints(s, d)),
    "q14_asof_lookup" -> ((s, d) => Stock.asOfLookup(s, d)),
    "q15_reconcile" -> ((s, d) => Stock.reconcile(s, d))
  )

  /** DuckDB-runnable ANSI SQL oracle per query (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q01_sicar_rollup" -> Sales.sicarRollupSql,
    "q02_legacy_agg" -> Sales.legacyAggSql,
    "q03_waterfall_clean" -> Sales.waterfallCleanSql,
    "q04_payment_qa" -> Sales.paymentQaSql,
    "q05_upsert_lastwins" -> Incremental.upsertLastWinsSql,
    "q06_checkpoint_max" -> Incremental.checkpointMaxSql,
    "q07_watermark_incr" -> Incremental.watermarkIncrementSql,
    "q08_union_ledger" -> Ledger.unionLedgerSql,
    "q09_refilter_ledger" -> Ledger.refilterLedgerSql,
    "q10_earliest_per_day" -> Ledger.earliestPerDaySql,
    "q11_daily_net" -> Stock.dailyNetSql,
    "q12_running_balance" -> Stock.runningBalanceSql,
    "q13_stock_points" -> Stock.stockPointsSql,
    "q14_asof_lookup" -> Stock.asOfLookupSql,
    "q15_reconcile" -> Stock.reconcileSql
  )
}
