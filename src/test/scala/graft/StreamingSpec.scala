package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.RefPipelines
import graft.streaming._

/** Streaming-semantics tests (SURVEY.md §2.9) — the behaviors the DuckDB
  * oracle cannot check: watermark late-data drops, append-mode
  * finalized-window emission, foreachBatch sinks and alerts, 6-query
  * fan-out.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: java.lang.Double, props: String)

case class DocRow(doc_id: Long, text: String)

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ev(id: Long, hour: Int, min: Int, value: Double, typ: String = "purchase"): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00"), id % 25, typ, value, s"""{"k": ${value.toInt}}""")

  private def tmpDir(): String = Files.createTempDirectory("graft-stream").toString

  test("append-mode windowed agg emits a window only after the watermark passes its end") {
    val input = MemoryStream[Ev]
    val agg = RefPipelines.hourlyAvgRevenue(input.toDF().withWatermark("ts", "60 minutes"))
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("finalized_windows")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      // batch 1: events in hour 0 and hour 1 — nothing can finalize yet
      input.addData(ev(1, 0, 10, 10.0), ev(2, 0, 20, 20.0), ev(3, 1, 15, 30.0))
      q.processAllAvailable()
      assert(spark.table("finalized_windows").count() == 0, "window emitted before watermark passed")

      // batch 2: event at 03:30 → watermark 02:30 → hour-0 AND hour-1 windows finalize
      input.addData(ev(4, 3, 30, 40.0))
      q.processAllAvailable()
      val out1 = spark.table("finalized_windows").collect()
      assert(out1.map(_.getAs[String]("hour")).sorted.toSeq == Seq("00:00:00", "01:00:00"))
      val h0 = out1.find(_.getAs[String]("hour") == "00:00:00").get
      assert(h0.getAs[Double]("avg_revenue") == 15.0)

      // batch 3: straggler into hour 0 (>60 min late) must be dropped, not re-emitted
      input.addData(ev(5, 0, 30, 999.0))
      q.processAllAvailable()
      assert(spark.table("finalized_windows").count() == out1.length, "late row re-opened a finalized window")
    } finally q.stop()
  }

  test("sessionWindowStats runs incrementally: session emits once its gap closes under the watermark") {
    val input = MemoryStream[Ev]
    val sessions = graft.engine.Analytics
      .sessionWindowStats(input.toDF().withWatermark("ts", "60 minutes"), 30)
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("native_sessions")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      // user 1: two events 10 min apart (one session); nothing finalizes yet
      input.addData(ev(1, 0, 0, 10.0), ev(26, 0, 10, 20.0))
      q.processAllAvailable()
      assert(spark.table("native_sessions").count() == 0)

      // event at 02:00 → watermark 01:00 > session end 00:40 → session emits
      input.addData(ev(51, 2, 0, 5.0))
      q.processAllAvailable()
      val out = spark.table("native_sessions").collect()
      assert(out.length == 1)
      val s = out.head
      assert(s.getAs[Long]("n_events") == 2 && s.getAs[Double]("total_value") == 30.0)
      // end = last event (00:10) + 30 min gap
      assert(s.getAs[Long]("session_end") - s.getAs[Long]("session_start") == 40 * 60)
    } finally q.stop()
  }

  test("slidingWindowStats runs incrementally: each event lands in two finalized windows") {
    val input = MemoryStream[Ev]
    val sliding = graft.engine.Analytics
      .slidingWindowStats(input.toDF().withWatermark("ts", "60 minutes"))
    val q = sliding.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sliding_windows")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      input.addData(ev(1, 0, 40, 10.0)) // windows [23:30-00:30) prev day? no: [00:00,01:00) and [00:30,01:30)
      input.addData(ev(2, 4, 0, 1.0))   // advances watermark to 03:00 → both windows finalize
      q.processAllAvailable()
      val out = spark.table("sliding_windows").collect().filter(_.getAs[Long]("n_events") > 0)
      val withEv1 = out.filter(r => r.getAs[Double]("sum_value") >= 10.0)
      assert(withEv1.length == 2, s"expected event in exactly 2 windows, got ${withEv1.length}")
      assert(withEv1.map(_.getAs[Long]("ws")).sorted.toSeq
        .sliding(2).forall { case Seq(a, b) => b - a == 1800 })
    } finally q.stop()
  }

  test("stream-stream interval join matches its batch twin and keeps state bounded") {
    val anchors = MemoryStream[Ev]
    val candidates = MemoryStream[Ev]
    val joined = graft.streaming.Stateful
      .followUpsStream(anchors.toDF(), candidates.toDF(), 3600)
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_followups")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      // user 0: anchor at 01:00; candidates at 01:30 (in window) and 03:00 (outside)
      anchors.addData(ev(25, 1, 0, 1.0))
      candidates.addData(ev(50, 1, 30, 2.0), ev(75, 3, 0, 3.0))
      q.processAllAvailable()
      val out = spark.table("stream_followups").collect()
      assert(out.length == 1, s"expected 1 follow-up pair, got ${out.length}")
      assert(out.head.getAs[Long]("event_a") == 25 && out.head.getAs[Long]("event_b") == 50)
      assert(out.head.getAs[Long]("gap_seconds") == 1800)

      // batch twin agrees on the same rows
      val batchRows = graft.engine.Joins
        .followUpsWithin(
          Seq(ev(25, 1, 0, 1.0), ev(50, 1, 30, 2.0), ev(75, 3, 0, 3.0)).toDF(), 3600)
        .collect()
      assert(batchRows.map(r => (r.getAs[Long]("event_a"), r.getAs[Long]("event_b"))).toSet ==
        out.map(r => (r.getAs[Long]("event_a"), r.getAs[Long]("event_b"))).toSet)
    } finally q.stop()
  }

  test("detectors alert on violations and write only violating rows; clean batches don't alert") {
    val input = MemoryStream[Ev]
    val sink = new CollectingSink
    val alerter = new CollectingAlerter
    val runner = new StreamRunner(spark, sink, alerter, tmpDir())
    val q = runner.abnormalValue(input.toDF()).writeStream
      .outputMode("append")
      .option("checkpointLocation", tmpDir())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epochId: Long) =>
        val n = batch.count()
        if (n > 0) alerter.alert("abnormal_value violations", s"epoch $epochId: $n rows")
        sink.write(batch, epochId, "abnormal_value")
      }
      .start()
    try {
      input.addData(ev(1, 0, 5, 50.0), ev(2, 0, 6, 0.5), ev(3, 0, 7, 500.0))
      q.processAllAvailable()
      val rows = sink.rowsFor("abnormal_value")
      assert(rows.map(_.getAs[Long]("event_id")).sorted == Seq(2L, 3L))
      assert(alerter.alerts.size == 1 && alerter.alerts.head._2.contains("2 rows"))

      input.addData(ev(4, 0, 8, 60.0)) // clean batch
      q.processAllAvailable()
      assert(alerter.alerts.size == 1, "clean batch raised an alert")
    } finally q.stop()
  }

  test("wire-format parse: empty strings null-normalize and cast (P1-P4)") {
    val input = MemoryStream[String]
    val typed = EventSource.typed(
      input.toDF().select(from_json(col("value"), EventSource.wireSchema).as("data")).select("data.*"))
    val q = typed.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("wire_typed")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      input.addData(
        """{"event_id":"7","ts":"2024-01-01 00:00:07","user_id":"13","event_type":"error","value":"185.22","props":"{\"k\": 87}"}""",
        """{"event_id":"8","ts":"2024-01-01 00:01:00","user_id":"","event_type":"","value":"","props":""}""")
      q.processAllAvailable()
      val rows = spark.table("wire_typed").collect().sortBy(_.getAs[Long]("event_id"))
      assert(rows.length == 2)
      val ok = rows(0)
      assert(ok.getAs[Long]("event_id") == 7L)
      assert(ok.getAs[Timestamp]("ts") == Timestamp.valueOf("2024-01-01 00:00:07"))
      assert(ok.getAs[Double]("value") == 185.22)
      val nulls = rows(1)
      assert(nulls.isNullAt(nulls.fieldIndex("user_id")))
      assert(nulls.isNullAt(nulls.fieldIndex("event_type")))
      assert(nulls.isNullAt(nulls.fieldIndex("value")))
      assert(nulls.isNullAt(nulls.fieldIndex("props")))
    } finally q.stop()
  }

  test("idempotent sink: replaying an epoch leaves exactly one copy") {
    val sinkDir = tmpDir()
    val sink = new IdempotentParquetSink(sinkDir)
    val batch = Seq(ev(1, 0, 5, 50.0), ev(2, 0, 6, 60.0)).toDS().toDF()
    sink.write(batch, epochId = 0, table = "t")
    sink.write(batch, epochId = 0, table = "t") // replay after simulated crash
    val rows = spark.read.parquet(s"$sinkDir/t").count()
    assert(rows == 2, s"replayed epoch duplicated rows: $rows")
    // and the plain append sink shows why: same replay duplicates
    val appendDir = tmpDir()
    val append = new ParquetSink(appendDir)
    append.write(batch, 0, "t")
    append.write(batch, 0, "t")
    assert(spark.read.parquet(s"$appendDir/t").count() == 4)
  }

  test("Trigger.AvailableNow drains the backlog, stops, and resumes incrementally") {
    // The batch-catchup trigger: process everything available, then
    // terminate — re-running against the same checkpoint picks up ONLY
    // files that arrived since (a scheduled backfill over a 100 TB landing
    // zone, without a long-lived cluster).
    val srcDir = tmpDir()
    val ckpt = tmpDir()
    val sink = new CollectingSink
    Seq(ev(1, 0, 5, 10.0), ev(2, 0, 10, 20.0)).toDS().write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch((b: org.apache.spark.sql.DataFrame, e: Long) => sink.write(b, e, "cat"))
        .start()
      assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    }
    drain()
    assert(sink.rowsFor("cat").size == 2)
    Seq(ev(3, 1, 0, 30.0)).toDS().write.mode("append").parquet(srcDir)
    drain() // same checkpoint: only the new file is processed
    assert(sink.rowsFor("cat").size == 3)
  }

  test("streaming ingest screen: micro-batches probe the pinned corpus dedup index") {
    // The production ingest-dedup loop: each arriving micro-batch computes
    // its own MinHash signatures inline and probes the CORPUS's pinned
    // band index via foreachBatch — verdicts must equal the batch twin,
    // exact copies must attribute at est_jaccard = 1.0, novel text must
    // be admitted.
    val corpus = graft.engine.Tables.documents(spark, sfDir)
    val copies = corpus.select("doc_id", "text").orderBy("doc_id").limit(3).collect()
      .map(r => DocRow(r.getLong(0) + 1000000L, r.getString(1)))
    val novel = DocRow(9999999L, "utterly novel zxqv text stream never in corpus qwpo")
    val arriving = copies :+ novel
    val input = MemoryStream[DocRow]
    val got = scala.collection.mutable.Map.empty[Long, (Option[Long], Boolean)]
    val q = input.toDF().writeStream
      .option("checkpointLocation", tmpDir())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.text.Dedup.screenAgainst(b, corpus).collect().foreach { r =>
          got.synchronized {
            got(r.getAs[Long]("new_doc")) = (
              if (r.isNullAt(r.fieldIndex("corpus_doc"))) None
              else Some(r.getAs[Long]("corpus_doc")),
              r.getAs[Boolean]("admitted"))
          }
        }
      }
      .start()
    try {
      input.addData(arriving.take(2): _*)
      q.processAllAvailable()
      input.addData(arriving.drop(2): _*) // second micro-batch
      q.processAllAvailable()
    } finally q.stop()
    val twin = graft.text.Dedup
      .screenAgainst(arriving.toSeq.toDF(), corpus)
      .collect()
      .map { r =>
        r.getAs[Long]("new_doc") -> (
          if (r.isNullAt(r.fieldIndex("corpus_doc"))) None
          else Some(r.getAs[Long]("corpus_doc")),
          r.getAs[Boolean]("admitted"))
      }.toMap
    assert(got.toMap == twin, "streamed verdicts must equal the batch twin")
    copies.foreach { c =>
      val (m, admitted) = got(c.doc_id)
      assert(!admitted && m.isDefined, s"exact copy ${c.doc_id} must attribute to the corpus")
    }
    assert(got(novel.doc_id) == (None, true), "novel text must be admitted")
  }

  test("batch stages run unchanged on a stream: stratified sample matches its batch twin") {
    // The engine contract: operators are pure DataFrame => DataFrame
    // stages, so a map-side stage (deterministic hash sampling here)
    // composes into readStream without modification and selects exactly
    // the rows its batch twin selects on the same data.
    val input = MemoryStream[Ev]
    val strata = Map("purchase" -> 10)
    val sampled = graft.engine.Relational
      .stratifiedHashSample(input.toDF(), strata, 1, 20)
    val q = sampled.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_sample")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      val events = (1L to 200L).map(i =>
        ev(i, (i % 24).toInt, (i % 60).toInt, i.toDouble, if (i % 2 == 0) "purchase" else "view"))
      input.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_sample").collect().map(_.getAs[Long]("event_id")).sorted
      val batch = graft.engine.Relational
        .stratifiedHashSample(events.toDF(), strata, 1, 20)
        .collect().map(_.getAs[Long]("event_id")).sorted
      assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("ohlcBarsWindowed streams in append mode and matches the batch ohlcBars exactly") {
    // OHLC resampling unifies batch/stream because the group key is a
    // time window: with a watermark, append emits each finalized bar
    // once, and the min_by/max_by boundary picks are identical to the
    // batch twin's (one late-ish probe included to exercise ordering).
    val input = MemoryStream[Ev]
    val bars = graft.engine.Analytics
      .ohlcBarsWindowed(input.toDF().withWatermark("ts", "60 minutes"))
    val q = bars.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_ohlc")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      input.addData(
        ev(1, 0, 5, 10.0), ev(2, 0, 20, 50.0), ev(3, 0, 40, 3.0),
        ev(4, 0, 55, 30.0))
      q.processAllAvailable()
      input.addData(ev(5, 0, 50, 99.0)) // late within the hour, pre-finalization
      q.processAllAvailable()
      input.addData(ev(6, 3, 0, 7.0)) // watermark passes hour 0 → bar finalizes
      q.processAllAvailable()
      val streamed = spark.table("stream_ohlc").collect()
        .map(r => (r.getAs[Long]("hour_epoch"), r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"), r.getAs[Long]("volume")))
      val all = Seq(
        ev(1, 0, 5, 10.0), ev(2, 0, 20, 50.0), ev(3, 0, 40, 3.0),
        ev(4, 0, 55, 30.0), ev(5, 0, 50, 99.0), ev(6, 3, 0, 7.0))
      val batchHour0 = graft.engine.Analytics.ohlcBars(all.toDF())
        .filter(org.apache.spark.sql.functions.col("hour_epoch") % 24 === 0)
        .collect()
        .map(r => (r.getAs[Long]("hour_epoch"), r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"), r.getAs[Long]("volume")))
      assert(streamed.toSeq == batchHour0.toSeq)
      assert(streamed.head._2 == 10.0 && streamed.head._5 == 30.0, "open/close pick boundary events")
    } finally q.stop()
  }

  test("firstTouch runs as a streaming update-mode aggregation, converging to its batch twin") {
    // The dual claim to the sampling test: a STATEFUL stage (min_by
    // aggregate) also composes into readStream unchanged — update mode
    // streams the running winner per key, and once all data is
    // processed the latest row per key equals the batch answer.
    val input = MemoryStream[Ev]
    val touched = graft.engine.Relational.firstTouch(input.toDF())
    val q = touched.writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stream_first_touch")
      .option("checkpointLocation", tmpDir())
      .start()
    try {
      val events = (1L to 100L).map(i =>
        ev(i, (i % 12).toInt, (i % 60).toInt, i.toDouble, if (i % 3 == 0) "view" else "purchase"))
      // two batches, out of order across them
      input.addData(events.drop(50): _*)
      q.processAllAvailable()
      input.addData(events.take(50): _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_first_touch").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) -> r.getAs[Long]("event_id"))
        .toMap // last update per key wins
      val batch = graft.engine.Relational.firstTouch(events.toDF()).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) -> r.getAs[Long]("event_id"))
        .toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("six-query fan-out: all queries run concurrently off one source") {
    // A replayable source (files, like Kafka in the reference) — MemoryStream
    // truncates on commit and cannot feed six concurrent queries.
    val srcDir = tmpDir()
    val batch1 = Seq(
      ev(1, 0, 10, 50.0), ev(2, 0, 20, 0.2), ev(3, 1, 15, 30.0, "signup"),
      ev(4, 9, 0, 40.0)) // far-future event advances watermark past hours 0-1
    batch1.toDS().write.mode("append").parquet(srcDir)
    val source = spark.readStream.schema(batch1.toDS().schema).parquet(srcDir)
    val sink = new CollectingSink
    val alerter = new CollectingAlerter
    val runner = new StreamRunner(spark, sink, alerter, tmpDir())
    val queries = runner.startAll(source)
    try {
      assert(queries.length == 6)
      queries.foreach(_.processAllAvailable())
      Seq(ev(5, 10, 0, 41.0)).toDS().write.mode("append").parquet(srcDir) // second epoch flushes window state
      queries.foreach(_.processAllAvailable())

      assert(sink.rowsFor("events_full").size == 5)
      assert(sink.rowsFor("abnormal_value").map(_.getAs[Long]("event_id")) == Seq(2L))
      assert(sink.rowsFor("avg_revenue_per_hour").nonEmpty)
      assert(sink.rowsFor("trip_count_per_hour").nonEmpty)
      assert(sink.rowsFor("trip_count_by_borough").nonEmpty)
      assert(alerter.alerts.nonEmpty)
      // windowed sinks only contain finalized (pre-watermark) windows
      val hours = sink.rowsFor("trip_count_per_hour").map(_.getAs[String]("hour"))
      assert(hours.forall(h => h < "09:00:00"), s"unfinalized window emitted: $hours")
    } finally queries.foreach(_.stop())
  }
}
