package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation must be exactly equivalent to the direct
  * groupBy — on skewed data, with long sums (exact algebra, no float
  * order concerns).
  */
class SkewSpec extends SparkSpec {

  test("salted sum/count equals direct aggregation on heavily skewed keys") {
    val sql = spark.sqlContext
    import sql.implicits._
    // 90% of rows on one hot key
    val rows = (1 to 20000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (k, i.toLong)
    }
    val df = rows.toDF("k", "v").repartition(8)

    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", buckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted aggregation spreads a hot key over multiple partial groups") {
    val sql = spark.sqlContext
    import sql.implicits._
    val df = (1 to 5000).map(i => ("hot", i.toLong)).toDF("k", "v").repartition(8)
    // phase-1 group count for the hot key must exceed 1 (that's the point)
    val phase1Groups = df.withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
      .groupBy("k", "__salt").count().count()
    assert(phase1Groups > 1)
  }
}
