package graft

import graft.functions.CmsSketch

/** Count-Min sketch: never-underestimate guarantee, bounded
  * overestimate on a known distribution, and merge/partitioning
  * invariance (the property that makes it a distributed aggregate).
  */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish: key k appears ~1000/k times for k in 1..50
  private val data: Seq[Long] =
    (1 to 50).flatMap(k => Seq.fill(1000 / k)(k.toLong))
  private val trueCounts: Map[Long, Int] =
    data.groupBy(identity).view.mapValues(_.size).toMap

  test("estimates never underestimate and heavy hitters are tight") {
    val agg = new CmsSketch(4, 256)
    val sk = data.toDS().select(CmsSketch.sketch(4, 256)).head()
    trueCounts.foreach { case (k, n) =>
      val est = agg.estimate(sk, k)
      assert(est >= n, s"underestimate for $k")
      // total stream is ~4500 items; with w=256 the expected collision
      // mass per cell is small — allow a loose additive slack
      assert(est <= n + data.length / 64, s"overestimate too large for $k")
    }
    // a key never seen estimates at most the collision noise
    assert(agg.estimate(sk, 999L) <= data.length / 64)
  }

  test("sketch is invariant under repartitioning (exact merge)") {
    val one = data.toDS().repartition(1).select(CmsSketch.sketch(4, 256)).head()
    val many = new scala.util.Random(9).shuffle(data).toDS()
      .repartition(13).select(CmsSketch.sketch(4, 256)).head()
    assert(one.sameElements(many))
  }
}
