package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** q51 mega-block guard: an adversarial fixture where one 2-char prefix
  * holds ~45% of all titles (the Zipf-skew scale hazard). The guard must
  * (a) leave every block at or under the ceiling byte-identical to the
  * exact path, (b) lose ONLY pairs inside oversized blocks that differ
  * within their first 6 characters (the documented recall trade-off),
  * and (c) actually shrink the quadratic pair budget.
  */
class FuzzyGuardSpec extends SparkSpec {

  // All titles are lowercase printable ASCII of length 16 (one length
  // bucket, blk_l = 2), so the block key reduces to the 2-char prefix.
  private def fixture() = {
    val sql = spark.sqlContext
    import sql.implicits._
    // Mega block: 402 docs under prefix "aa". 400 have DISTINCT 6-char
    // prefixes (aa0000..aa0399) yet tiny pairwise edit distances; 2 share
    // a 6-char prefix ("aazzzz") at distance 1 — the guard must keep
    // that pair and may drop the others.
    val mega = (0 until 400).map(i => (i.toLong, f"aa$i%04d-title-pad")) ++
      Seq((9001L, "aazzzz-title-pad"), (9002L, "aazzzz-title-qad"))
    // Normal blocks: 100 docs each under "bb".."ff" — under the ceiling,
    // full of genuine near-dup pairs that must survive unchanged.
    val normal = for {
      (p, base) <- Seq("bb" -> 10000L, "cc" -> 20000L, "dd" -> 30000L,
        "ee" -> 40000L, "ff" -> 50000L)
      i <- 0 until 100
    } yield (base + i, f"$p$i%04d-title-pad")
    (mega ++ normal).toDF("doc_id", "text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("guard is a no-op when every block is at or under the ceiling") {
    val docs = fixture()
    val exact = pairSet(Dedup.fuzzyTitlePairs(docs, maxBlock = Int.MaxValue))
    val lifted = pairSet(Dedup.fuzzyTitlePairs(docs, maxBlock = 402))
    assert(lifted == exact && exact.nonEmpty)
  }

  test("oversized block refines to 6-char prefixes; losses are exactly the documented ones") {
    val docs = fixture()
    val exact = pairSet(Dedup.fuzzyTitlePairs(docs, maxBlock = Int.MaxValue))
    val guarded = pairSet(Dedup.fuzzyTitlePairs(docs, maxBlock = 150))
    assert(guarded.subsetOf(exact))

    // Expected survivor set: drop pairs where BOTH sides sit in the
    // oversized "aa" block and their first-6-char prefixes differ.
    val title = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = exact.filterNot { case (da, db, _) =>
      val (ta, tb) = (title(da), title(db))
      ta.startsWith("aa") && tb.startsWith("aa") && ta.take(6) != tb.take(6)
    }
    assert(guarded == expected)
    // The shared-6-prefix mega pair survives; cross-6-prefix mega pairs
    // existed in exact (the trade-off is real, not vacuous).
    assert(guarded.contains((9001L, 9002L, 1L)))
    assert((exact -- guarded).nonEmpty)
    // Normal-block pairs are untouched.
    val normalPairs = exact.filter { case (da, db, _) => da >= 10000L && db >= 10000L }
    assert(normalPairs.subsetOf(guarded) && normalPairs.nonEmpty)
  }

  test("refinement collapses the quadratic pair budget of the mega block") {
    val docs = fixture()
    def pairBudget(maxBlock: Int): Long =
      Dedup.withEffectiveBlock(Dedup.titleBlocks(docs), maxBlock)
        .groupBy(col("blk_eff"), col("blk_l")).count()
        .agg(sum(col("count") * (col("count") - 1))).collect()(0).getLong(0) / 2
    val before = pairBudget(Int.MaxValue)
    val after = pairBudget(150)
    // 402²/2 ≈ 80k candidate pairs collapse to the five 100-doc normal
    // blocks (~5·4950) plus singleton/pair refined blocks.
    assert(after < before / 3)
    val maxRefined = Dedup.withEffectiveBlock(Dedup.titleBlocks(docs), 150)
      .groupBy(col("blk_eff"), col("blk_l")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxRefined <= 100)
  }
}
