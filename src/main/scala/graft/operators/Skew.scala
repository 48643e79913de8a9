package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter aggregation keys.
  *
  * At 100 TB, power-law keys (one SKU with 10⁸ events, one shingle in
  * every document) make a single reducer the straggler. AQE's skew-join
  * splitting covers joins; for AGGREGATIONS the standard fix is salting:
  * aggregate in two phases, first on (key, salt) — spreading a hot key
  * over `buckets` reducers — then re-aggregate the partials on the key.
  *
  * Works for any algebraic aggregate (the caller supplies both the
  * partial and the merge expression). Sums/counts/min/max follow the
  * obvious pattern; avg = salted sum + salted count, divided at the end.
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param partial aggregates applied per (keys, salt) group
    * @param merge   aggregates combining the partial columns per key
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** The common case: salted long-sum + count per key. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int = 16): DataFrame =
    saltedAgg(df, keys, buckets)(
      partial = Seq(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt")),
      merge = Seq(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows")))

  /** Salted shuffle JOIN for heavy-hitter join keys: the skewed (fact)
    * side gets a random-ish salt in [0, buckets); the small-but-not-
    * broadcastable (dim) side is REPLICATED `buckets` times, once per
    * salt value, and the join key becomes (key, salt) — a hot key's rows
    * land on `buckets` reducers instead of one.
    *
    * When to use: AQE's skew-join split (OptimizeSkewedJoin) already
    * handles most cases at runtime and needs no replication — prefer it.
    * Salting is for the cases AQE can't help: a skewed key feeding an
    * aggregation-after-join on the same key (AQE must keep such
    * partitions intact), or engines/stages where AQE is off. Replication
    * cost is `buckets × |right|` shuffle rows — bounded and chosen by the
    * caller, vs the unbounded single-reducer straggler it removes.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String],
                 buckets: Int = 16): DataFrame = {
    require(!skewed.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name; rename it on the inputs")
    val salted = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
