package graft.streaming

import org.apache.spark.sql.SparkSession

/** Runnable fan-out demo over a file-based event stream:
  * {{{
  * sbt "runMain graft.streaming.StreamMain <srcDir> <outDir> [dimDir]"
  * }}}
  * Watches `srcDir` for parquet event files (schema of the events
  * fixture), runs the six reference queries,
  * appends results under `outDir/<table>`, and logs alerts. Stop with
  * Ctrl-C; checkpoints under `outDir/_checkpoints` make restarts resume
  * exactly where they left off. Swap the source for
  * [[EventSource.kafkaJsonStream]] on a cluster with the Kafka connector.
  */
object StreamMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamMain <srcDir> <outDir> [dimDir]")
    val Array(srcDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-stream")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dimDir = args.lift(2)
      .orElse(sys.env.get("GRAFT_DIM_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val schema = graft.engine.Tables.events(spark, dimDir).schema
    val source = spark.readStream.schema(schema).parquet(srcDir)
    val runner = new StreamRunner(
      spark,
      new ParquetSink(outDir),
      new LoggingAlerter,
      s"$outDir/_checkpoints",
      dimDir = dimDir)
    val queries = runner.startAll(source)
    sys.addShutdownHook(queries.foreach(_.stop()))
    runner.awaitAll(queries)
  }
}
