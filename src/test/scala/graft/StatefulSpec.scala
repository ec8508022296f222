package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Stateful

/** flatMapGroupsWithState sessionization + streaming dedup semantics. */
class StatefulSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, uid: Long, time: String, value: Double): Ev =
    Ev(id, Timestamp.valueOf(time), uid, "purchase", value, "{}")

  private def tmpDir(): String = Files.createTempDirectory("graft-stateful").toString

  test("typeChangesStream (transformWithState) emits only transitions, across batches") {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    def evT(id: Long, uid: Long, time: String, typ: String): Ev =
      Ev(id, Timestamp.valueOf(time), uid, typ, 1.0, "{}")
    val q = Stateful.typeChangesStream(spark, input.toDF()).writeStream
      .outputMode("append")
      .format("memory")
      .queryName("typechange_out")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      input.addData(
        evT(1, 1, "2024-01-01 00:00:00", "view"),
        evT(2, 1, "2024-01-01 00:01:00", "view"), // duplicate → suppressed
        evT(3, 1, "2024-01-01 00:02:00", "purchase"),
        evT(4, 2, "2024-01-01 00:00:30", "signup"))
      q.processAllAvailable()
      // duplicate across a batch boundary is suppressed too; a change isn't
      input.addData(
        evT(5, 1, "2024-01-01 00:03:00", "purchase"),
        evT(6, 1, "2024-01-01 00:04:00", "view"))
      q.processAllAvailable()
      val rows = spark.table("typechange_out").as[Stateful.TypeChange].collect()
        .sortBy(r => (r.user_id, r.event_id))
        .map(r => (r.user_id, r.event_id, Option(r.prev_type), r.event_type))
      assert(rows.toSeq == Seq(
        (1L, 1L, None, "view"),
        (1L, 3L, Some("view"), "purchase"),
        (1L, 6L, Some("purchase"), "view"),
        (2L, 4L, None, "signup")))
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("sessionize closes a session after the inactivity gap and aggregates state") {
    val input = MemoryStream[Ev]
    val sessions = Stateful.sessionize(spark, input.toDF(), gapMinutes = 30)
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_out")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      // user 1: two events 10 min apart (one session), then 40-min silence → new session
      input.addData(
        ev(1, 1, "2024-01-01 00:00:00", 10.0),
        ev(2, 1, "2024-01-01 00:10:00", 5.0),
        ev(3, 1, "2024-01-01 00:50:00", 2.0))
      q.processAllAvailable()
      // same-batch session split emits the first session immediately
      val afterBatch1 = spark.table("sessions_out").as[Stateful.SessionOutput].collect()
      assert(afterBatch1.length == 1)
      assert(afterBatch1.head.n_events == 2 && afterBatch1.head.total_value == 15.0)

      // advance watermark far past the open session's timeout → it closes
      input.addData(ev(4, 2, "2024-01-01 03:00:00", 1.0))
      q.processAllAvailable()
      input.addData(ev(5, 2, "2024-01-01 03:01:00", 1.0)) // one more batch so the timeout fires
      q.processAllAvailable()
      val all = spark.table("sessions_out").as[Stateful.SessionOutput].collect()
      val u1 = all.filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(u1.length == 2, s"expected both user-1 sessions closed, got ${u1.toSeq}")
      assert(u1(1).n_events == 1 && u1(1).total_value == 2.0)
    } finally q.stop()
  }

  test("rateLimitedAlerts suppresses repeat alerts inside the cooldown window") {
    val input = MemoryStream[Ev]
    val alerts = Stateful.rateLimitedAlerts(spark, input.toDF(), cooldownMinutes = 30)
    val q = alerts.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("alerts_out")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      // three violations in 10 minutes: only the first may alert
      input.addData(
        ev(1, 1, "2024-01-01 00:00:00", 10.0),
        ev(2, 1, "2024-01-01 00:05:00", 11.0),
        ev(3, 1, "2024-01-01 00:10:00", 12.0))
      q.processAllAvailable()
      val afterBatch1 = spark.table("alerts_out").as[Stateful.Alert].collect()
      assert(afterBatch1.map(_.event_id).toSeq == Seq(1L), s"got ${afterBatch1.toSeq}")

      // past the cooldown → the next violation alerts again; a different
      // key alerts independently
      input.addData(
        ev(4, 1, "2024-01-01 00:31:00", 13.0),
        ev(5, 2, "2024-01-01 00:32:00", 9.0))
      q.processAllAvailable()
      val all = spark.table("alerts_out").as[Stateful.Alert].collect()
      assert(all.map(_.event_id).sorted.toSeq == Seq(1L, 4L, 5L), s"got ${all.toSeq}")
    } finally q.stop()
  }

  test("latestByKeyStream emits the running (ts, event_id)-max per key, surviving late data") {
    val input = MemoryStream[Ev]
    val latest = Stateful.latestByKeyStream(spark, input.toDF())
    val q = latest.writeStream
      .outputMode("update")
      .format("memory")
      .queryName("latest_out")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      input.addData(ev(1, 1, "2024-01-01 00:00:00", 10.0), ev(2, 1, "2024-01-01 01:00:00", 20.0))
      q.processAllAvailable()
      def currentOf(uid: Long): Stateful.KeyedEvent =
        spark.table("latest_out").as[Stateful.KeyedEvent].collect()
          .filter(_.user_id == uid).last
      assert(currentOf(1L).event_id == 2L)

      // a LATE event (older ts) must not displace the state — and a
      // stale-only batch must not RE-EMIT the unchanged current row
      // (round-7 contract: update-log rows only for keys that changed)
      val rowsBefore = spark.table("latest_out").count()
      input.addData(ev(3, 1, "2024-01-01 00:30:00", 5.0))
      q.processAllAvailable()
      assert(currentOf(1L).event_id == 2L, "late event displaced the newer state")
      assert(spark.table("latest_out").count() == rowsBefore,
        "stale-only batch re-emitted an unchanged current row")

      // a genuinely newer event does
      input.addData(ev(4, 1, "2024-01-01 02:00:00", 7.0))
      q.processAllAvailable()
      assert(currentOf(1L).event_id == 4L)
    } finally q.stop()
  }

  test("dedupByKey suppresses duplicate event_ids within the watermark") {
    val input = MemoryStream[Ev]
    val deduped = Stateful.dedupByKey(input.toDF())
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_out")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      input.addData(
        ev(1, 1, "2024-01-01 00:00:00", 1.0),
        ev(1, 1, "2024-01-01 00:00:01", 1.0), // dup id, same batch
        ev(2, 1, "2024-01-01 00:01:00", 2.0))
      q.processAllAvailable()
      input.addData(ev(1, 1, "2024-01-01 00:02:00", 1.0)) // dup id, later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }
}
