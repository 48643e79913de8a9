package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("quota sample: exact quota per stratum, subset, deterministic") {
    val docs = Tables.documents(spark, dir)
    val got = Sampling.quotaSample(spark, dir).collect()
    TransientCache.drain()
    val ns = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = got.groupBy(_.getString(1)).view.mapValues(_.length.toLong)
    // exact ceil(0.3 * n_s) per stratum — every stratum present
    assert(bySource.keySet == ns.keySet)
    for ((s, n) <- ns)
      assert(bySource(s) == (3 * n + 9) / 10, s"stratum $s: ${bySource(s)}")
    // subset of the input universe, no duplicates
    val ids = got.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    val universe = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(universe))
    // deterministic: a second run is byte-identical
    val again = Sampling.quotaSample(spark, dir).collect()
    TransientCache.drain()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("quota sample: membership equals a driver-side per-stratum hash sort") {
    // the two-tier threshold vs the naive formulation, on the engine's
    // own hash values (mode-agnostic differential)
    val docs = Tables.documents(spark, dir)
    val base = docs.select(col("source"), col("doc_id"),
      graft.functions.TextFns.hash60(
        concat(lit("samp|"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = base.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val k = (3 * rows.length + 9) / 10
      rows.sortBy(r => (r._3, r._2)).take(k).toSeq
    }.map(r => (r._2, r._1)).toSet
    val got = Sampling.quotaSample(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    TransientCache.drain()
    assert(got == want)
  }

  test("quota sample: quota structure is hash-mode invariant") {
    // membership legitimately differs by hash tier; the structural
    // contract (exact quotas) must not
    val before = System.getProperty("graft.hashMode")
    try {
      System.setProperty("graft.hashMode", "md5")
      val docs = Tables.documents(spark, dir)
      val ns = docs.groupBy(col("source")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bySource = Sampling.quotaSample(spark, dir).collect()
        .groupBy(_.getString(1)).view.mapValues(_.length.toLong)
      TransientCache.drain()
      for ((s, n) <- ns)
        assert(bySource(s) == (3 * n + 9) / 10, s"stratum $s (md5)")
    } finally {
      if (before == null) System.clearProperty("graft.hashMode")
      else System.setProperty("graft.hashMode", before)
    }
  }

  test("quota sample: rejects a rate outside (0, 1]") {
    intercept[IllegalArgumentException] {
      Sampling.quotaSampleOf(Tables.documents(spark, dir),
        col("source"), 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.quotaSampleOf(Tables.documents(spark, dir),
        col("source"), 11)
    }
  }
}
