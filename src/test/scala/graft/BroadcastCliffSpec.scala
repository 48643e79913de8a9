package graft

/** The cliff differentials: q87/q88/q89 each contain a deliberately
  * UNHINTED join (benchmark-halves pairing, index×batch collision
  * probes, codes×probes candidates) whose scale story is "Catalyst
  * broadcasts while the side fits; AQE shuffles past the cliff"
  * (`Similarity.scala` q89 candidate join, the q87 rule). That claim was
  * documentation; this spec makes it code: disable broadcast joins
  * entirely (`autoBroadcastJoinThreshold=-1`, the 100 TB night where
  * every unhinted side outgrows executor memory), check the shuffle
  * path actually engaged, and require bit-identical output.
  *
  * Explicit `broadcast()` hints — the batch-bounded residual guards —
  * are unaffected by the threshold, which is exactly the contract: the
  * cliff only ever moves the AQE-decided joins.
  */
class BroadcastCliffSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val cliffQueries =
    Seq("q87_split_leakage", "q88_delta_winnow", "q89_delta_ann")

  test("q87/q88/q89 are bit-identical with broadcast joins disabled") {
    cliffQueries.foreach { name =>
      val base = SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).toSeq
      assert(base.nonEmpty, s"$name returned no rows")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val df = SparkEntry.queries(name)(spark, dir)
        val cliff = df.collect().map(_.toString).toSeq
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$name: disabling broadcasts should move an AQE-decided join " +
            s"onto the shuffle path — none found:\n${plan.take(4000)}")
        assert(cliff == base, s"$name differs on the shuffle path")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
