package graft

import java.sql.Timestamp
import graft.operators.Upsert

/** S8 keyed last-wins upsert semantics (reference
  * etl_sales/db/db_helpers.py:25-40): newer version wins, re-applying is
  * idempotent, ties break deterministically.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)

  test("last version wins per key") {
    val existing = Seq((1L, "a", ts(1), 1), (2L, "b", ts(1), 1))
      .toDF("k", "v", "version", "src")
    val incoming = Seq((2L, "B", ts(2), 2)).toDF("k", "v", "version", "src")
    val out = Upsert.upsertByKey(existing, incoming, Seq("k"), "version", "src")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B"))
  }

  test("idempotent: re-applying the same batch changes nothing") {
    val existing = Seq((1L, "a", ts(1), 1)).toDF("k", "v", "version", "src")
    val incoming = Seq((1L, "A", ts(2), 2)).toDF("k", "v", "version", "src")
    val once = Upsert.upsertByKey(existing, incoming, Seq("k"), "version", "src")
    val twice = Upsert.upsertByKey(once, incoming, Seq("k"), "version", "src")
    assert(twice.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "A")))
  }

  test("equal versions break ties by the tiebreak column (incoming wins)") {
    val existing = Seq((1L, "old", ts(5), 1)).toDF("k", "v", "version", "src")
    val incoming = Seq((1L, "new", ts(5), 2)).toDF("k", "v", "version", "src")
    val out = Upsert.upsertByKey(existing, incoming, Seq("k"), "version", "src")
    assert(out.collect().head.getString(1) == "new")
  }
}
