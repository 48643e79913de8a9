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

  test("salted join equals the plain join on skewed data") {
    val sql = spark.sqlContext
    import sql.implicits._
    val rnd = new scala.util.Random(5)
    // 90% of fact rows hit one hot key
    val fact = (1 to 3000).map { i =>
      val k = if (rnd.nextInt(10) < 9) 1L else (rnd.nextInt(50) + 2).toLong
      (k, i.toLong)
    }.toDF("k", "v").repartition(8)
    val dim = (1L to 51L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), buckets = 8)
      .select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain && plain.size == 3000)
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
