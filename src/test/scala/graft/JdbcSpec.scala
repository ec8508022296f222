package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Sources, Tables}
import graft.streaming.{IdempotentJdbcSink, JdbcSink}

/** Executes the reference's JDBC sink path (`spark_streaming.py:116-124`,
  * SURVEY.md §2.2 K1) for REAL against an embedded Derby database (the
  * JDBC engine already on the Spark classpath — `/opt/spark/jars/derby*`),
  * instead of merely constructing the writer: append-create, append-append
  * (the at-least-once per-epoch contract), and the partitioned parallel
  * read back ([[Sources.jdbcPartitioned]]) with row + value parity against
  * the original DataFrame.
  */
class JdbcSpec extends AnyFunSuite {
  import SparkTestSession._

  System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")
  private val url = "jdbc:derby:/tmp/graft_derby_db;create=true"
  private def props = new java.util.Properties()

  private def dropIfExists(table: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // Spark's JDBC writer issues CREATE TABLE with the name UNQUOTED, so
      // Derby folds it to upper case — drop the same way (a quoted
      // lower-case name would silently miss it and appends would
      // accumulate across test runs).
      try st.executeUpdate(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () } // didn't exist
      finally st.close()
    } finally conn.close()
  }

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("JdbcSink append creates the table and round-trips nation exactly") {
    dropIfExists("nation_rt")
    val nation = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
    new JdbcSink(url, props).write(nation, epochId = 0L, table = "nation_rt")
    val back = spark.read.jdbc(url, "nation_rt", props)
    assert(back.count() == nation.count())
    assert(canon(back.collect()) == canon(nation.collect()))
  }

  test("second epoch appends (at-least-once contract: no dedup, no overwrite)") {
    dropIfExists("nation_epochs")
    val nation = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_name"))
    val sink = new JdbcSink(url, props)
    sink.write(nation, epochId = 0L, table = "nation_epochs")
    sink.write(nation, epochId = 1L, table = "nation_epochs")
    val back = spark.read.jdbc(url, "nation_epochs", props)
    assert(back.count() == 2 * nation.count())
    // every key appears exactly twice — pure append, nothing dropped
    val dupCounts = back.groupBy("n_nationkey").count().select("count").distinct().collect()
    assert(dupCounts.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("IdempotentJdbcSink: replaying an epoch rewrites it instead of duplicating") {
    dropIfExists("nation_idem")
    val nation = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_name"))
    val n = nation.count()
    val sink = new IdempotentJdbcSink(url, props)
    sink.write(nation, epochId = 0L, table = "nation_idem")
    sink.write(nation, epochId = 0L, table = "nation_idem") // crash-replay of epoch 0
    val afterReplay = spark.read.jdbc(url, "nation_idem", props)
    assert(afterReplay.count() == n, "replayed epoch must not duplicate")
    sink.write(nation, epochId = 1L, table = "nation_idem") // a NEW epoch appends
    val afterEpoch1 = spark.read.jdbc(url, "nation_idem", props)
    assert(afterEpoch1.count() == 2 * n)
    assert(afterEpoch1.select("_epoch").distinct().collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 1L))
  }

  test("jdbcPartitioned reads stripes in parallel with full-parity union") {
    dropIfExists("customer_rt")
    val customer = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long"), col("c_name"), col("c_nationkey").cast("long"),
        col("c_acctbal"))
    new JdbcSink(url, props).write(customer, epochId = 0L, table = "customer_rt")
    val bounds = customer.agg(min(col("c_custkey")), max(col("c_custkey"))).head()
    val back = Sources.jdbcPartitioned(
      spark, url, "customer_rt", "c_custkey",
      bounds.getLong(0), bounds.getLong(1), numPartitions = 4, props)
    assert(back.rdd.getNumPartitions == 4) // the parallel-connection contract
    assert(back.count() == customer.count())
    assert(canon(back.collect()) == canon(customer.collect()))
  }
}
