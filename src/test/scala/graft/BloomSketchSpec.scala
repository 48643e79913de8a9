package graft

import graft.functions.BloomSketch

/** Bloom filter: zero false negatives (the dedup-safety property),
  * bounded false-positive rate at the designed load, and merge/
  * partitioning invariance with OR-idempotence (what makes the at-rest
  * corpus filter appendable across days).
  */
class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4096
  private val K = 4
  private val inserted: Seq[Long] = (1L to 300L).map(x => x * 2654435761L)
  private val absent: Seq[Long] = (1L to 2000L).map(x => x * 40503L + 7L)

  test("no false negatives; false positives near the fill^k design rate") {
    val bits = inserted.toDS().select(BloomSketch.filter(M, K)).head()
    inserted.foreach(x => assert(BloomSketch.contains(bits, x, K),
      s"false negative for $x"))
    val fill = BloomSketch.fillFraction(bits)
    assert(fill > 0 && fill < 0.5) // 300*4 bits over 4096 cells
    val trueAbsent = absent.filterNot(inserted.toSet)
    val fps = trueAbsent.count(x => BloomSketch.contains(bits, x, K))
    val expected = math.pow(fill, K) * trueAbsent.size
    // loose envelope: the pairwise-independent family is not ideal, but
    // an order-of-magnitude breach means broken hashing, not variance
    assert(fps <= expected * 8 + 8, s"fp=$fps vs expected≈$expected")
  }

  test("bitset is invariant under repartitioning and duplicate re-insertion") {
    val one = inserted.toDS().repartition(1).select(BloomSketch.filter(M, K)).head()
    val many = new scala.util.Random(5).shuffle(inserted ++ inserted).toDS()
      .repartition(13).select(BloomSketch.filter(M, K)).head()
    assert(one.sameElements(many)) // OR is idempotent: duplicates are free
  }

  test("merged daily filters equal the filter of the union") {
    val (day1, day2) = inserted.splitAt(150)
    val a = day1.toDS().select(BloomSketch.filter(M, K)).head()
    val b = day2.toDS().select(BloomSketch.filter(M, K)).head()
    val union = inserted.toDS().select(BloomSketch.filter(M, K)).head()
    val merged = a.zip(b).map { case (x, y) => x | y }
    assert(merged.sameElements(union))
  }
}
