package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize

/**
 * Sessionization: the streaming form (flatMapGroupsWithState with
 * event-time timeout) must produce exactly the batch form's sessions once
 * the watermark has passed every gap — the custom-state analog of the
 * batch/stream agreement the windowed-aggregation gate (q26) proves.
 */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("streaming sessions equal batch sessions after watermark flush") {
    // 3 users, interleaved, gaps of >30 min split sessions
    val events = Seq(
      (1L, ts(0), 100L), (2L, ts(1), 101L), (1L, ts(10), 102L),
      (3L, ts(12), 103L), (1L, ts(55), 104L), // user 1: 45-min gap -> new session
      (2L, ts(60), 105L), (3L, ts(20), 106L),
      (1L, ts(70), 107L), (2L, ts(61), 108L),
      (3L, ts(200), 109L) // user 3: big gap -> new session
    )
    val batch = Sessionize.sessions(
      events.toDF("user_id", "ts", "event_id"), gapMinutes = 30)
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(batch.length == 6) // u1: 2 sessions, u2: 2, u3: 2

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long)]
    val sessions = Sessionize.sessionsStream(
      ms.toDF().toDF("user_id", "ts", "event_id"),
      gapMinutes = 30, watermark = "5 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append").start()
    try {
      // replay in event-time order across micro-batches
      events.sortBy(e => (e._2.getTime, e._3)).grouped(3).foreach { g =>
        ms.addData(g: _*); q.processAllAvailable()
      }
      // two sentinel rounds far in the future: the first advances max
      // event time, the second triggers the batch where the watermark
      // (computed between batches) has passed every open session's
      // last + gap, firing the event-time timeouts
      Seq(100000L, 100100L).foreach { m =>
        ms.addData((1L, ts(m), 900L), (2L, ts(m), 901L), (3L, ts(m), 902L))
        q.processAllAvailable()
      }
    } finally q.stop()
    val flushUs = (1700000000000L + 100000L * 60000L) * 1000L
    val streamed = spark.table("sessions_out")
      .filter(col("first_us") < flushUs) // drop the sentinel sessions
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(streamed == batch,
      s"stream:\n${streamed.mkString("\n")}\nbatch:\n${batch.mkString("\n")}")
  }

  test("late event within the watermark joins its session across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long)]
    val sessions = Sessionize.sessionsStream(
      ms.toDF().toDF("user_id", "ts", "event_id"),
      gapMinutes = 30, watermark = "60 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_late").outputMode("append").start()
    try {
      ms.addData((7L, ts(0), 1L), (7L, ts(20), 2L)); q.processAllAvailable()
      // arrives in a later micro-batch but inside the session's gap window
      ms.addData((7L, ts(25), 3L)); q.processAllAvailable()
      Seq(90000L, 90100L).foreach { m =>
        ms.addData((7L, ts(m), 9L)); q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("sessions_late")
      .filter(col("n_events") >= 2).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n_events") == 3L,
      spark.table("sessions_late").collect().mkString(", "))
  }
}
