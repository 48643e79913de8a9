package graft

import graft.functions.TextFns
import graft.operators.{Contamination, Dedup, Graph, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential spec for the pluggable hash tier ([[TextFns.hashMode]]):
  * everything STRUCTURAL — dedup groups, shingle equality, decontamination
  * matches, candidate verification — must be identical under md5 (oracle
  * parity, pinned by Verify) and xxhash64 (production default, timed by
  * Bench). Only reported hash VALUES and the probabilistic recall of LSH
  * candidate generation may depend on the mode.
  */
class HashModeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def withMode[A](mode: String)(f: => A): A = {
    val old = sys.props.get("graft.hashMode")
    sys.props("graft.hashMode") = mode
    try f finally old match {
      case Some(v) => sys.props("graft.hashMode") = v
      case None    => sys.props -= "graft.hashMode"
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("hash60 dispatches live and both tiers are non-negative 60-bit") {
    import spark.implicits._
    val df = Seq("a", "b", "hello world", "x y z").toDF("s")
    val byMode = Seq("md5", "xxhash64").map { mode =>
      withMode(mode) {
        val h = df.select(TextFns.hash60(col("s")).as("h"))
          .collect().map(_.getLong(0)).toSeq
        assert(h.forall(v => v >= 0L && v < (1L << 60)), s"$mode out of range")
        assert(h.distinct.length == h.length, s"$mode collided on the probe set")
        h
      }
    }
    // the property is read at plan-build time, not baked in at class load
    assert(byMode(0) != byMode(1))
  }

  test("exact n-gram Jaccard output is hash-invariant") {
    val md5 = withMode("md5")(rows(Dedup.ngramJaccard(spark, dir)))
    val xx = withMode("xxhash64")(rows(Dedup.ngramJaccard(spark, dir)))
    assert(md5 == xx)
    assert(md5.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("fingerprint shingle structure (doc set + counts) is hash-invariant") {
    def structure = rows(TextOps.fingerprint(spark, dir)
      .select(col("doc_id"), col("md5_hex"), col("poly_h"), col("n_shingles")))
    val md5 = withMode("md5")(structure)
    val xx = withMode("xxhash64")(structure)
    assert(md5 == xx && md5.nonEmpty)
  }

  test("decontamination matches are hash-invariant") {
    val md5 = withMode("md5")(rows(Contamination.contamination(spark, dir)))
    val xx = withMode("xxhash64")(rows(Contamination.contamination(spark, dir)))
    assert(md5 == xx && md5.nonEmpty)
  }

  test("CC memo is keyed by hash tier: md5 then xxhash64 in one session") {
    Graph.clearMemo(spark) // start from a clean memo regardless of suite order
    val md5Frame = withMode("md5")(Graph.simhashComponents(spark, dir))
    val xxFrame = withMode("xxhash64")(Graph.simhashComponents(spark, dir))
    // a tier-blind memo would hand the md5 frame back to the xxhash64 call
    assert(!(md5Frame eq xxFrame), "second tier must not reuse the first tier's frame")
    // and each frame must reflect its OWN tier's pair graph: the CC node
    // set is exactly the distinct endpoints of that tier's simhash pairs
    Seq("md5" -> md5Frame, "xxhash64" -> xxFrame).foreach { case (mode, frame) =>
      val nodes = frame.select(col("node")).collect().map(_.getLong(0)).toSet
      val endpoints = withMode(mode) {
        Dedup.simhashPairs(spark, dir).select(col("da"), col("db"))
          .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
      }
      assert(nodes == endpoints, s"$mode components cover a different node set")
    }
    // same tier + same session → memo hit (the sharing q45/q62 rely on)
    val again = withMode("md5")(Graph.simhashComponents(spark, dir))
    assert(again eq md5Frame, "same-tier call must hit the memo")
    Graph.clearMemo(spark)
  }

  test("clearMemo releases the cached frame and the next call rebuilds") {
    withMode("md5") {
      Graph.clearMemo(spark)
      val f1 = Graph.simhashComponents(spark, dir)
      f1.count()
      assert(f1.storageLevel.useMemory, "memoized frame should be cached")
      Graph.clearMemo(spark)
      assert(f1.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "clear must unpersist the evicted frame so its blocks are released")
      val f2 = Graph.simhashComponents(spark, dir)
      assert(!(f1 eq f2), "post-clear call must rebuild, not resurrect")
      assert(rows(f2.orderBy(col("node"))) == rows(f1.orderBy(col("node"))),
        "rebuild must reproduce the same components")
      Graph.clearMemo(spark)
    }
  }

  test("xxhash64 LSH pairs all verify: subset of exact-Jaccard pairs") {
    withMode("xxhash64") {
      val lsh = rows(Dedup.minhashLsh(spark, dir))
      val exact = rows(Dedup.ngramJaccard(spark, dir)).toSet
      assert(lsh.forall(exact),
        "every banded candidate that survives verification must be a true pair")
      assert(lsh.nonEmpty, "LSH should recall at least one fixture near-dup")
    }
  }
}
