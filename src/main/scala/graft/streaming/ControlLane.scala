package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared verb routing for the six op-routed control lanes (quantile,
  * dedup, winnow, ANN, retention, transitions): one place owns the
  * null/unknown-verb semantics so no twin can drift.
  *
  * A NULL verb routes to ADVANCE — the data-lane default (a plain
  * arrival that never carried a verb). This is load-bearing: both
  * `col("op") =!= "retract"` and `=== "retract"` evaluate to NULL on a
  * null op, so naive two-filter routing would land the row in NEITHER
  * half — silent data loss from a checkpointed stream.
  *
  * An UNKNOWN non-null verb FAILS FAST instead of being guessed at: a
  * CDC lane that silently reinterprets (or drops) verbs corrupts state
  * with no error surface; failing the micro-batch leaves the
  * checkpoint un-advanced, so the fixed producer replays the batch and
  * the exactly-once contracts of both halves take over.
  */
private[streaming] object ControlLane {

  /** Split a control micro-batch into (advances, retractions), both
    * with the verb column dropped.
    */
  def route(batch: DataFrame): (DataFrame, DataFrame) = {
    val verb = coalesce(col("op"), lit("advance"))
    val unknown = batch.filter(!verb.isin("advance", "retract"))
    require(unknown.isEmpty, {
      val seen = unknown.select(col("op")).distinct().limit(3)
        .collect().map(_.get(0)).mkString(", ")
      s"control lane: unknown op verb(s) [$seen] — want advance|retract"
    })
    (batch.filter(verb === "advance").drop("op"),
      batch.filter(verb === "retract").drop("op"))
  }
}
