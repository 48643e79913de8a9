package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch gap-sessionization (operators/Sessions,
  * q36): per-user session state lives in the checkpointed state store via
  * `flatMapGroupsWithState`, sessions FINALIZE when the next event
  * arrives more than [[GapMs]] after the previous one, and the emitted
  * rows match the batch window plan over the concatenated input (minus
  * each user's still-open last session — a stream never knows a session
  * is over until the gap passes; a production job would add an
  * event-time timeout to flush idle sessions).
  *
  * Same key as the batch shuffle (user_id), same strict-> gap rule, same
  * in-order-per-key input contract as [[StatefulBalance]] (the ingest
  * replays whole days, so cross-batch order holds per key).
  */
object StreamingSessions {

  /** Derived from the batch tier's single gap constant (q36's rule). */
  val GapUs: Long = graft.operators.Sessions.GapSec * 1000000L

  final case class SessEv(event_id: Long, user_id: Long,
                          ts: java.sql.Timestamp, event_type: String)

  /** Open-session accumulator persisted per user across micro-batches.
    * Times are epoch MICROseconds — `Timestamp.getTime` truncates to ms
    * and the gap/order comparisons must match the batch plan's
    * micro-precision timestamp arithmetic exactly.
    */
  final case class OpenSession(no: Long, startUs: Long, endUs: Long,
                               n: Long, nPurch: Long)

  private def micros(t: java.sql.Timestamp): Long =
    // floorDiv: plain `/` truncates toward zero, shifting pre-1970
    // timestamps one second late (getTime already includes the sub-second
    // part that getNanos re-adds)
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  final case class SessionRow(user_id: Long, session_no: Long,
                              session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp,
                              n_events: Long, n_purchases: Long)

  def apply(events: Dataset[SessEv]): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[SessEv], state: GroupState[OpenSession]) => {
          var open = state.getOption
          val out = Seq.newBuilder[SessionRow]
          it.toArray.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val t = micros(e.ts)
            val p = if (e.event_type == "purchase") 1L else 0L
            open match {
              case Some(s) if t - s.endUs <= GapUs => // strict >: gap == Gap stays
                open = Some(s.copy(endUs = t, n = s.n + 1, nPurch = s.nPurch + p))
              case Some(s) => // gap exceeded: finalize, start the next
                out += SessionRow(user, s.no, toTs(s.startUs), toTs(s.endUs),
                  s.n, s.nPurch)
                open = Some(OpenSession(s.no + 1, t, t, 1L, p))
              case None =>
                open = Some(OpenSession(1L, t, t, 1L, p))
            }
          }
          open.foreach(state.update)
          out.result().iterator
        })
  }
}
