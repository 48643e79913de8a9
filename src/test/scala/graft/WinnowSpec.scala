package graft

import graft.operators.{Contamination, Dedup}
import org.apache.spark.sql.functions._

/** q85/q86 winnowing + q87 split-leakage audit.
  *
  * The load-bearing property is winnowing's DETERMINISTIC detection
  * guarantee (Schleimer et al. 2003): any shared token run of length
  * ≥ w + k − 1 contains at least one full gram window common to both
  * documents, and both documents select that window's minimum hash — so
  * a shared fingerprint is certain, not probabilistic. The first test
  * machine-checks exactly that bound with injected spans.
  */
class WinnowSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  import Dedup.{WinnowK, WinnowW}

  // distinct filler vocabularies so the two docs share ONLY the span
  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("guarantee: a shared run of w+k-1 tokens always yields a shared fingerprint") {
    val span = words("shared", WinnowW + WinnowK - 1) // exactly the bound
    val a = (words("aaa", 20) ++ span ++ words("bbb", 20)).mkString(" ")
    val b = (words("ccc", 5) ++ span ++ words("ddd", 35)).mkString(" ")
    val fp = Dedup.winnowFingerprintsOf(docsDf(Seq((1L, a), (2L, b))))
    val shared = fp.filter(col("doc_id") === 1L)
      .join(fp.filter(col("doc_id") === 2L), Seq("fp_h"), "inner")
    assert(shared.count() >= 1,
      "winnowing guarantee violated: no shared fingerprint for a w+k-1-token run")
  }

  test("fingerprints are a subset of the doc's own gram hashes") {
    import graft.functions.TextFns._
    val docs = Tables.documents(spark, dir).limit(50)
    val fp = Dedup.winnowFingerprintsOf(docs)
    val grams = Tables.spread(docs)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), explode(shingles3All(col("t"))).as("s"))
      .select(col("doc_id"), hash60(col("s")).as("fp_h"))
      .distinct()
    assert(fp.join(grams, Seq("doc_id", "fp_h"), "left_anti").isEmpty,
      "a selected fingerprint is not one of the doc's gram hashes")
  }

  test("short docs (< w grams) degrade to exactly one global-min fingerprint") {
    import graft.functions.TextFns._
    val text = words("tiny", WinnowK + 1).mkString(" ") // 2 grams < w
    val fp = Dedup.winnowFingerprintsOf(docsDf(Seq((7L, text)))).collect()
    assert(fp.length === 1)
    val minGram = docsDf(Seq((7L, text)))
      .select(explode(shingles3All(toks(col("text")))).as("s"))
      .select(min(hash60(col("s")))).head().getLong(0)
    assert(fp.head.getLong(1) === minGram)
  }

  test("q86 detects injected near-duplicates and sim is a valid ratio") {
    val pairs = Dedup.winnowPairs(spark, dir).collect()
    assert(pairs.nonEmpty, "fixture should contain winnow-overlap pairs")
    pairs.foreach { r =>
      val (da, db, shared, sim) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(da < db)
      assert(shared >= Dedup.WinnowMinShared.toLong)
      assert(sim > 0.0 && sim <= 1.0, s"sim out of range: $sim")
    }
  }

  test("q86 pair sim is exactly shared/min(|fpa|,|fpb|) against the index") {
    // nf is defined over the df <= WinnowMaxDf KEEP set (the operator's
    // documented semantics), not the raw index — the two only coincide
    // while the boilerplate guard stays dormant at fixture scale, and
    // this spec must encode the guarded definition either way
    val fp = Dedup.winnowIndex(spark, dir)
    val keep = fp.join(
      fp.groupBy(col("fp_h")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= Dedup.WinnowMaxDf),
      Seq("fp_h"))
    val nf = keep.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.winnowPairs(spark, dir).collect().foreach { r =>
      val expect = r.getLong(2).toDouble / math.min(nf(r.getLong(0)), nf(r.getLong(1)))
      assert(r.getDouble(3) === expect)
    }
  }

  test("q87 rows straddle the split boundary with verified jaccard") {
    import graft.functions.TextFns._
    val split = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(hash60(col("text")) % 100 < Contamination.TrainPct, "train")
          .when(hash60(col("text")) % 100 <
            Contamination.TrainPct + Contamination.ValPct, "val")
          .otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Contamination.splitLeakage(spark, dir).collect()
    assert(rows.nonEmpty, "fixture should contain cross-split leaks")
    assert(rows.map(_.getLong(0)).distinct.length === rows.length,
      "one best-match row per leaked eval doc")
    rows.foreach { r =>
      val (evalId, sp, trainId, jac) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(split(evalId) === sp)
      assert(sp != "train")
      assert(split(trainId) === "train")
      assert(jac >= Dedup.JaccardThreshold)
    }
  }

  test("q87 output is exactly the exhaustive cross-split best-matches it recalls") {
    // exhaustive reference: every cross-split pair's exact jaccard via the
    // inverted shingle index (no banding) — q87's rows must agree with it
    // on jaccard and never exceed the exhaustive best match
    import graft.functions.TextFns._
    val sh = Dedup.shingleIndex(spark, dir)
    val split = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(hash60(col("text")) % 100 < Contamination.TrainPct, "train")
          .otherwise("eval").as("sp"))
    val e = sh.join(split.filter(col("sp") === "eval"), Seq("doc_id"))
      .select(col("doc_id").as("de"), col("sh_h"))
    val t = sh.join(split.filter(col("sp") === "train"), Seq("doc_id"))
      .select(col("doc_id").as("dt"), col("sh_h"))
    val n = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val exhaustive = e.join(t, Seq("sh_h"))
      .groupBy(col("de"), col("dt")).agg(count(lit(1)).as("shared"))
      .join(n.withColumnRenamed("doc_id", "de").withColumnRenamed("n", "ne"), Seq("de"))
      .join(n.withColumnRenamed("doc_id", "dt").withColumnRenamed("n", "nt"), Seq("dt"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("ne") + col("nt") - col("shared")))
      .filter(col("jaccard") >= Dedup.JaccardThreshold)
      .select(col("de"), col("dt"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = Contamination.splitLeakage(spark, dir).collect()
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(exhaustive.contains(key), s"q87 emitted a non-pair $key")
      assert(exhaustive(key) === r.getDouble(3), "jaccard disagrees with exhaustive")
    }
  }
}
