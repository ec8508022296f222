package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{IdempotentJdbcSink, IdempotentParquetSink}

/** Crash-replay recovery: a streaming query is KILLED after a sink write
  * but before the checkpoint commit, restarted from the same checkpoint,
  * and both idempotent sinks (parquet epoch-partition overwrite AND the
  * live Derby epoch-delete-then-append) must hold exactly one copy of
  * every row — the strongest exactly-once claim testable without a
  * Kafka broker: not single-process replay of a sink call, but recovery
  * semantics across a query failure boundary (SURVEY.md §2.9).
  */
class CrashReplaySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")
  private val url = "jdbc:derby:/tmp/graft_derby_db;create=true"
  private def props = new java.util.Properties()

  private def tmpDir(): String = Files.createTempDirectory("graft-crash").toString

  private def dropIfExists(table: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () } // didn't exist
      finally st.close()
    } finally conn.close()
  }

  test("kill after sink write, restart from checkpoint: one copy per epoch in parquet AND Derby") {
    dropIfExists("CRASH_REPLAY")
    val srcDir = tmpDir()
    val ckpt = tmpDir()
    val pqDir = tmpDir()
    val pqSink = new IdempotentParquetSink(pqDir)
    val jdbcSink = new IdempotentJdbcSink(url, props)

    // three backlog files; maxFilesPerTrigger=1 → one epoch per file
    (1 to 3).foreach { i =>
      Seq((i.toLong, Timestamp.valueOf(f"2024-01-01 00:0$i%d:00"), i * 10.0))
        .toDF("event_id", "ts", "value")
        .write.mode("append").parquet(srcDir)
    }
    val schema = spark.read.parquet(srcDir).schema

    // Crash injection: epoch 1's first attempt throws AFTER both sinks
    // wrote — the query dies with the side effect durable but the offset
    // commit missing, which is exactly the window a real crash hits.
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val attempts = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, epochId: Long) =>
          attempts.merge(epochId, 1, (a, x) => a + x)
          pqSink.write(b, epochId, "t")
          jdbcSink.write(b, epochId, "CRASH_REPLAY")
          if (epochId == 1L && crashed.compareAndSet(false, true))
            throw new RuntimeException("injected crash after sink write")
        }
        .start()
      try q.awaitTermination(120000)
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally q.stop()
    }

    run() // dies mid-backlog, inside epoch 1
    assert(crashed.get, "crash was not injected")
    run() // restart from the same checkpoint — epoch 1 REPLAYS
    assert(attempts.get(1L) != null && attempts.get(1L) >= 2,
      s"epoch 1 was not replayed (attempts: $attempts)")

    // parquet: 3 rows total, exactly one per event despite the replay
    val pq = spark.read.parquet(s"$pqDir/t")
    assert(pq.count() == 3, s"parquet sink duplicated rows: ${pq.count()}")
    assert(pq.select("event_id").distinct().count() == 3)

    // Derby: same — the epoch delete-then-append absorbed the replay
    val back = spark.read.jdbc(url, "CRASH_REPLAY", props)
    assert(back.count() == 3, s"jdbc sink duplicated rows: ${back.count()}")
    assert(back.select("event_id").distinct().count() == 3)
    // and every epoch landed (nothing was lost to the crash either)
    assert(back.select("_epoch").distinct().count() == 3)
  }
}
