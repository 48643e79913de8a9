package graft

import graft.functions.KmvSketch
import graft.operators.Sketch
import org.apache.spark.sql.functions._

/** The typed KMV Aggregator: exactness below capacity, partitioning
  * invariance (mergeability), and agreement with the relational KMV
  * formulation behind q40.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact below capacity, stable estimate above it") {
    val small = (1L to 40L).toDS()
    val exact = small.select(KmvSketch.distinctEstimate(64)).head()
    assert(exact == 40.0)

    // 10k distinct pseudo-hashes evenly spread over the 2^60 space
    val big = (1L to 10000L).map(i => i * (1152921504606846976L / 10000L)).toDS()
    val est = big.select(KmvSketch.distinctEstimate(64)).head()
    assert(math.abs(est - 10000.0) / 10000.0 < 0.3)
  }

  test("estimate is invariant under repartitioning and duplication") {
    val vals = (1L to 5000L).map(i => i * (1152921504606846976L / 5000L))
    val base = vals.toDS().repartition(1)
      .select(KmvSketch.distinctEstimate(64)).head()
    val shuffled = new scala.util.Random(3).shuffle(vals)
    val dupes = (shuffled ++ shuffled.take(2000)).toDS().repartition(17)
      .select(KmvSketch.distinctEstimate(64)).head()
    assert(base == dupes) // merge-order independent AND distinct-correct
  }

  test("matches the relational q40 estimator on the shared fixture") {
    val dir = "/root/testdata/sf0.001"
    val rel = Sketch.kmvDistinct(spark, dir)
      .select(col("kmv_estimate")).head().getDouble(0)
    val agg = Sketch.shingleHashes(spark, dir)
      .as[Long].select(KmvSketch.distinctEstimate(Sketch.K)).head()
    assert(rel == agg)
  }
}
