package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** OLAP-surface operators: rank-quantile correctness against direct array
  * indexing, rollup level consistency, pivot row/column totals.
  */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rank-based quantiles equal direct sorted-array indexing per group") {
    val got = Analytics.tokenQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val counts = Tables.documents(spark, dir)
      .select(col("lang"),
        size(graft.functions.TextFns.toks(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    for ((lang, vals) <- counts) {
      def q(p: Double) = vals(math.floor((vals.size - 1) * p).toInt)
      assert(got(lang) == ((q(0.5), q(0.9), q(0.99))), s"lang=$lang")
    }
  }

  test("rollup levels are mutually consistent") {
    val rows = Analytics.langSourceRollup(spark, dir).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3)))
    val leaf = rows.filter(r => r._1.isDefined && r._2.isDefined)
    val langTot = rows.filter(r => r._1.isDefined && r._2.isEmpty)
    val grand = rows.filter(r => r._1.isEmpty && r._2.isEmpty)
    assert(grand.length == 1)
    assert(grand.head._3 == leaf.map(_._3).sum)
    assert(grand.head._4 == leaf.map(_._4).sum)
    for ((Some(lang), None, n, chars) <- langTot) {
      val l = leaf.filter(_._1.contains(lang))
      assert(n == l.map(_._3).sum && chars == l.map(_._4).sum, s"lang=$lang")
    }
  }

  test("cube contains the rollup and its slices are mutually consistent") {
    val cube = Analytics.langSourceCube(spark, dir).collect()
      .map(r => ((Option(r.get(0)), Option(r.get(1)), r.getLong(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    val detail = cube.filter(_._1._3 == 0L)
    // grand total (gid=3) == sum of all detail cells
    val grand = cube(((None, None, 3L)))
    assert(grand._1 == detail.values.map(_._1).sum)
    assert(grand._2 == detail.values.map(_._2).sum)
    // the source-marginal slice (gid=1) aggregates detail rows per lang
    val perLang = detail.groupBy(_._1._1)
      .map { case (l, m) => l -> ((m.values.map(_._1).sum, m.values.map(_._2).sum)) }
    perLang.foreach { case (l, want) =>
      assert(cube(((l, None, 1L))) == want, s"lang $l")
    }
  }

  test("pivot cells sum to the total event count") {
    val rows = Analytics.eventTypePivot(spark, dir).collect()
    val cells = rows.map(r => (1 to 5).map(r.getLong(_)).sum).sum
    val total = Tables.events(spark, dir).count()
    assert(cells == total)
  }

  test("rolling mean window is correct at series edges") {
    val rows = Analytics.rollingDailyNet(spark, dir)
      .filter(col("tienda_id") === 0).orderBy(col("dia"))
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    // day k (0-based) averages over min(k+1, 7) trailing days
    rows.zipWithIndex.foreach { case ((_, ma), k) =>
      val frame = rows.slice(math.max(0, k - 6), k + 1).map(_._1)
      assert(ma == frame.sum.toDouble / frame.length, s"day $k")
    }
  }
}
