package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Connected components: known-graph cases + a randomized differential
  * against a driver-side union-find.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components of chains, triangles and crossing edges") {
    // 1-2-3 chain, 4-5 pair, 10-11-12 triangle joined to the chain via 3-10
    val got = components(Seq(
      (1L, 2L), (2L, 3L), (4L, 5L), (10L, 11L), (11L, 12L), (12L, 10L),
      (3L, 10L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      10L -> 1L, 11L -> 1L, 12L -> 1L))
  }

  test("a long path converges to one component (diameter stress)") {
    val got = components((1L to 40L).sliding(2).map(p => (p(1), p(0))).toSeq)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 40L).toSet)
  }

  test("components match a naive union-find on random graphs") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 120).map(_ =>
      ((rnd.nextInt(60) + 1).toLong, (rnd.nextInt(60) + 1).toLong))
      .filter(e => e._1 != e._2)

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap

    assert(components(edges) == want)
  }
}
