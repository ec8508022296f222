package graft.streaming

import org.apache.spark.sql.DataFrame

/** Pluggable micro-batch sinks — the rebuild of the reference's shared
  * JDBC-append writer (`spark_streaming.py:116-124`) with the hard-wired
  * Postgres dependency lifted behind a trait (SURVEY.md §2.2 K1).
  *
  * Contract: at-least-once, exactly like the reference (append per epoch,
  * no txn/upsert — SURVEY.md §2.9). Idempotent-upsert would key on
  * (epoch_id, partition) and is left as a deployment concern.
  */
trait BatchSink extends Serializable {

  /** Write one micro-batch for logical table `table` at epoch `epochId`. */
  def write(df: DataFrame, epochId: Long, table: String): Unit
}

/** Parquet-append sink (harness/test default — `Verify` has no Postgres). */
final class ParquetSink(baseDir: String) extends BatchSink {
  def write(df: DataFrame, epochId: Long, table: String): Unit =
    df.write.mode("append").parquet(s"$baseDir/$table")
}

/** JDBC-append sink — the reference's production path
  * (`spark_streaming.py:116-124`): one connection per partition,
  * executor-side, append mode. Requires the JDBC driver jar on the
  * cluster classpath; never exercised by the local harness.
  */
final class JdbcSink(url: String, props: java.util.Properties) extends BatchSink {
  def write(df: DataFrame, epochId: Long, table: String): Unit =
    df.write.mode("append").jdbc(url, table, props)
}

/** Idempotent parquet sink: each epoch overwrites its own
  * `epoch=<id>` partition directory, so a replayed micro-batch (restart
  * between sink write and checkpoint commit) rewrites identical data
  * instead of appending duplicates — upgrading the reference's
  * at-least-once contract (SURVEY.md §2.9 "exactly-once: NOT achieved")
  * to effective exactly-once for deterministic batches. The JDBC
  * equivalent is a txn keyed on (table, epoch) or upsert — deployment
  * concern.
  */
final class IdempotentParquetSink(baseDir: String) extends BatchSink {
  def write(df: DataFrame, epochId: Long, table: String): Unit =
    df.write.mode("overwrite").parquet(s"$baseDir/$table/epoch=$epochId")
}

/** Collects batches in memory for assertions (test double). */
final class CollectingSink extends BatchSink {
  val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Array[org.apache.spark.sql.Row])]
  def write(df: DataFrame, epochId: Long, table: String): Unit =
    batches.synchronized { batches += ((epochId, table, df.collect())) }
  def rowsFor(table: String): Seq[org.apache.spark.sql.Row] =
    batches.synchronized { batches.filter(_._2 == table).flatMap(_._3).toSeq }
}

/** Side-effect alert channel — rebuild of the reference's SMTP e-mail
  * alerts (`utils.py:11-30`, invoked from `spark_streaming.py:172-182,
  * 217-227`) behind a trait so tests can collect instead of send.
  */
trait Alerter extends Serializable {
  def alert(subject: String, body: String): Unit
}

/** Driver-side log alert (default; an SMTP impl would mirror the
  * reference's `send_email` and is a deployment concern).
  */
final class LoggingAlerter extends Alerter {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[LoggingAlerter])
  def alert(subject: String, body: String): Unit = log.warn(s"ALERT: $subject — $body")
}

/** Collects alerts for assertions (test double). */
final class CollectingAlerter extends Alerter {
  val alerts = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  def alert(subject: String, body: String): Unit =
    alerts.synchronized { alerts += ((subject, body)) }
}
