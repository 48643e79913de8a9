package graft

/** Partitioning-invariance sweep: evaluate the nondeterminism-prone
  * queries under two different shuffle-partition counts and require
  * byte-identical row sequences. Partial-aggregation merge order, window
  * tie-breaks, and collect_list buffer order all change with the
  * partition count — any query whose result depends on them fails here
  * before it flakes in the driver's hash compare. (The per-operator
  * specs prove this property locally; this sweep proves it end-to-end
  * on the exact driver-contract queries.)
  */
class DeterminismSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // windows with tie-break ordering, ordered double folds, collect_list/
  // collect_set shapes, iterative CC, driver-paced kmeans — the surface
  // where partitioning could leak into results
  private val risky = Seq(
    "q12_running_balance", "q13_stock_points", "q16_token_stats",
    "q47_doc_ranks", "q55_quantiles_cont", "q59_trailing_24h",
    "q65_seq_packing", "q67_token_diversity", "q68_shard_assign",
    "q70_label_centroids", "q71_kmeans", "q45_dedup_clusters",
    "q72_fuzzy_contam")

  private def evalWith(partitions: Int, name: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toString)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("risky queries are byte-identical under 2 vs 5 shuffle partitions") {
    graft.operators.Graph.clearMemo(spark) // CC must rebuild per config
    risky.foreach { name =>
      val a = evalWith(2, name)
      graft.operators.Graph.clearMemo(spark)
      val b = evalWith(5, name)
      assert(a.nonEmpty, s"$name returned no rows")
      assert(a == b, s"$name differs across partition counts " +
        s"(first diff: ${a.zip(b).indexWhere { case (x, y) => x != y }})")
      graft.operators.Graph.clearMemo(spark)
    }
  }
}
