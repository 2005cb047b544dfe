package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Gap-based sessionization — the classic custom-state streaming operator
 * the engine's scan/sink surface feeds (the reference has no streaming
 * operators of its own; its Spark integration delegates exactly this kind
 * of processing to Structured Streaming, which is why it belongs in the
 * library's streaming layer next to the sink/source).
 *
 * Batch form: one shuffle by user, per-user window lag to mark gap
 * breaks, running sum for the session index — no single-partition window,
 * scale-safe at any user count. Streaming form:
 * `flatMapGroupsWithState` with event-time timeout — a session closes
 * (emits) when the watermark passes its last event + gap, the canonical
 * Spark custom-state pattern.
 */
object Sessionize {

  /** One closed session: events of one user with no internal gap larger
    * than the threshold. Timestamps are internal micros so batch and
    * streaming results (and any SQL oracle) compare exactly. */
  case class Session(user_id: Long, session_idx: Long, n_events: Long,
      first_us: Long, last_us: Long)

  /** Open-session accumulator carried between micro-batches. */
  case class OpenSession(idx: Long, firstUs: Long, lastUs: Long, n: Long)

  /** Batch sessionization over a frame with (user_id: long, ts: timestamp,
    * event_id: long — the deterministic tie-break for equal timestamps). */
  def sessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .withColumn("brk",
        when(col("us") - lag("us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("first_us"), max("us").as("last_us"))
  }

  /** Streaming sessionization over the same shape of frame (must carry a
    * watermark on `ts` already, or pass `watermark` to set one). Emits a
    * session ONCE, when the event-time watermark passes its last event +
    * gap. Events inside one micro-batch may arrive unordered (sorted per
    * group here); across batches the watermark contract applies — an
    * event later than watermark-allowed lateness is dropped by Spark
    * upstream, exactly as in windowed aggregation. */
  def sessionsStream(events: DataFrame, gapMinutes: Int,
      watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fn(uid: Long, rows: Iterator[(Long, Long)],
        state: GroupState[(Long, Option[OpenSession])]): Iterator[Session] = {
      val (nextIdx0, open0) = state.getOption.getOrElse((0L, None))
      var nextIdx = nextIdx0
      var open = open0
      val out = scala.collection.mutable.ArrayBuffer[Session]()
      def close(o: OpenSession): Unit =
        out += Session(uid, o.idx, o.n, o.firstUs, o.lastUs)
      if (state.hasTimedOut) {
        // watermark passed last + gap: the open session is final
        open.foreach(close)
        open = None
        if (out.isEmpty) state.remove()
        else state.update((nextIdx, None))
      } else {
        rows.toSeq.sortBy(identity).foreach { case (us, _) =>
          open match {
            case Some(o) if us - o.lastUs > gapUs =>
              close(o)
              open = Some(OpenSession(nextIdx, us, us, 1)); nextIdx += 1
            case Some(o) =>
              open = Some(o.copy(lastUs = math.max(o.lastUs, us), n = o.n + 1))
            case None =>
              open = Some(OpenSession(nextIdx, us, us, 1)); nextIdx += 1
          }
        }
        state.update((nextIdx, open))
        open.foreach(o =>
          state.setTimeoutTimestamp((o.lastUs + gapUs) / 1000L + 1))
      }
      out.iterator
    }

    // the watermarked column itself must reach the stateful operator (a
    // projection to micros would strip the watermark and fail analysis);
    // convert to internal micros inside the lambda instead
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid, it, st: GroupState[(Long, Option[OpenSession])]) =>
          fn(uid, it.map(r => (micros(r._2), r._3)), st))
  }
}
