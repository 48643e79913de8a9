package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level sales semantics: the payment waterfall + QA classifier.
  *
  * Re-expresses reference `etl_sales/transform.py:17-66` as Catalyst column
  * expressions (whole-stage-codegen friendly; no UDFs). The reference's
  * compute ORDER is load-bearing and preserved exactly:
  *   1. flags/waterfall computed first (transform.py:19-40),
  *   2. QA flags evaluated against the WATERFALL `otros`,
  *   3. final `otros` then OVERWRITTEN to `otros_in + cobranza_aplicada`
  *      (transform.py:59-60) — i.e. QA sees a different value than the output.
  *
  * Inputs are DecimalType money columns: efectivo_in, tarjeta_in, otros_in,
  * cobranza_aplicada, egresos, total.
  */
object SalesFns {

  /** no payment-flow rows at all → assume all cash (transform.py:19,28-30) */
  def noFlujo: Column =
    (col("efectivo_in") + col("tarjeta_in") + col("otros_in")) === lit(0)

  /** Waterfall allocation F1/F2/F3 (transform.py:22-33):
    * cash capped at total, card capped at remainder, rest clipped at 0.
    */
  def withWaterfall(df: DataFrame): DataFrame =
    df.withColumn("no_flujo", noFlujo)
      .withColumn("efectivo_w", least(col("efectivo_in"), col("total")))
      .withColumn("tarjeta_w", least(col("tarjeta_in"), col("total") - col("efectivo_w")))
      .withColumn("otros_w",
        greatest(col("total") - col("efectivo_w") - col("tarjeta_w"), lit(0)))
      // F5 conditional override (transform.py:28-30): no recorded flow → all cash
      .withColumn("efectivo", when(col("no_flujo"), col("total")).otherwise(col("efectivo_w")))
      .withColumn("tarjeta", when(col("no_flujo"), lit(0)).otherwise(col("tarjeta_w")))
      .withColumn("otros_pre", when(col("no_flujo"), lit(0)).otherwise(col("otros_w")))

  /** QA flags F4 (transform.py:37-43) — evaluated on the PRE-override otros. */
  def withQaFlags(df: DataFrame): DataFrame =
    df.withColumn("pagado", col("efectivo") + col("tarjeta") + col("otros_pre"))
      .withColumn("pago_completo", round(col("pagado"), 2) === round(col("total"), 2))
      .withColumn("pago_excedente", col("pagado") > col("total"))
      .withColumn("pago_incompleto", col("pagado") < col("total"))
      .withColumn("mismatch",
        !col("pago_completo") || col("no_flujo") || col("pagado") === lit(0))

  /** First-match-wins issue classifier F6 (transform.py:3-15) as a when-chain
    * — order must match the reference's if/elif ladder.
    */
  def tagIssue: Column =
    when(col("no_flujo"), "no payment recorded")
      .when(col("efectivo_in") > col("total") &&
        col("tarjeta_in") === 0 && col("otros_in") === 0, "overpaid cash")
      .when(col("tarjeta_in") > col("total") &&
        col("efectivo_in") === 0 && col("otros_in") === 0, "overpaid card")
      .when(col("pagado") === 0, "no payment recorded")
      .when(col("egresos") > col("efectivo") + col("tarjeta") + col("otros_pre"),
        "refund too big")
      .otherwise("unknown mismatch")

  /** Final otros override F5-late (transform.py:59-60): output `otros` is
    * flow-other + applied collections, re-zeroed for no_flujo.
    */
  def finalOtros: Column =
    when(col("no_flujo"), lit(0))
      .otherwise(col("otros_in") + col("cobranza_aplicada"))
}
