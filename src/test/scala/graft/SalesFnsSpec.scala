package graft

import graft.functions.SalesFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Payment waterfall edge cases — reference etl_sales/transform.py:17-66.
  * The F5 override ORDER matters: QA flags see the waterfall `otros`, the
  * output `otros` is overwritten afterwards (transform.py:59-60).
  */
class SalesFnsSpec extends SparkSpec {
  import spark.implicits._

  private val m = DecimalType(18, 2)

  private def row(total: String, e: String, t: String, o: String,
                  cob: String = "0", egr: String = "0") = (total, e, t, o, cob, egr)

  private def run(rows: Seq[(String, String, String, String, String, String)]) = {
    val df = rows.toDF("total", "efectivo_in", "tarjeta_in", "otros_in",
        "cobranza_aplicada", "egresos")
      .select(Seq("total", "efectivo_in", "tarjeta_in", "otros_in",
        "cobranza_aplicada", "egresos").map(c => col(c).cast(m).as(c)): _*)
    SalesFns.withQaFlags(SalesFns.withWaterfall(df))
      .withColumn("otros_final", SalesFns.finalOtros)
      .withColumn("issue", SalesFns.tagIssue)
  }

  test("exact payment passes straight through") {
    val r = run(Seq(row("100", "60", "40", "0"))).head()
    assert(r.getAs[java.math.BigDecimal]("efectivo").doubleValue() == 60.0)
    assert(r.getAs[java.math.BigDecimal]("tarjeta").doubleValue() == 40.0)
    assert(r.getAs[Boolean]("pago_completo"))
  }

  test("no_flujo assumes all cash and zeroes card/other") {
    val r = run(Seq(row("100", "0", "0", "0", "55"))).head()
    assert(r.getAs[Boolean]("no_flujo"))
    assert(r.getAs[java.math.BigDecimal]("efectivo").doubleValue() == 100.0)
    assert(r.getAs[java.math.BigDecimal]("tarjeta").doubleValue() == 0.0)
    // F5-late: no_flujo forces final otros to 0 even with cobranza present
    assert(r.getAs[java.math.BigDecimal]("otros_final").doubleValue() == 0.0)
    assert(r.getAs[String]("issue") == "no payment recorded")
  }

  test("cash overpay is capped at total and tagged") {
    val r = run(Seq(row("100", "150", "0", "0"))).head()
    assert(r.getAs[java.math.BigDecimal]("efectivo").doubleValue() == 100.0)
    assert(!r.getAs[Boolean]("pago_completo") || r.getAs[Boolean]("pago_excedente") == false)
    assert(r.getAs[String]("issue") == "overpaid cash")
  }

  test("card overpay waterfall caps at remainder") {
    val r = run(Seq(row("100", "30", "150", "0"))).head()
    assert(r.getAs[java.math.BigDecimal]("efectivo").doubleValue() == 30.0)
    assert(r.getAs[java.math.BigDecimal]("tarjeta").doubleValue() == 70.0)
  }

  test("underpay: waterfall fills otros with the remainder (transform.py:25)") {
    val r = run(Seq(row("100", "20", "30", "0"))).head()
    assert(r.getAs[java.math.BigDecimal]("otros_pre").doubleValue() == 50.0)
    assert(r.getAs[Boolean]("pago_completo"))
  }

  test("QA flags computed on pre-override otros; output uses otros_in+cobranza") {
    // waterfall otros = 10 (reconciles); final otros = otros_in + cobranza = 25
    val r = run(Seq(row("100", "60", "30", "10", "15"))).head()
    assert(r.getAs[Boolean]("pago_completo"))
    assert(r.getAs[java.math.BigDecimal]("otros_final").doubleValue() == 25.0)
  }

  test("refund bigger than payments is tagged") {
    val r = run(Seq(row("100", "20", "0", "0", "0", "500"))).head()
    assert(r.getAs[String]("issue") == "refund too big")
  }
}
