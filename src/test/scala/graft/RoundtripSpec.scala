package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Sources, Tables}

/** Sink→source roundtrip parity for parquet, CSV and JSON-lines on
  * sf0.001: the invariants after write+read must equal the direct
  * aggregates over the source table.
  */
class RoundtripSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val direct = {
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "md5(text) AS h")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    (docs.length.toLong, docs.map(_._1).sum, docs.map(_._2).distinct.length.toLong,
      docs.map(_._2).min, docs.map(_._2).max)
  }

  for (fmt <- Seq("parquet", "csv", "json")) {
    test(s"$fmt roundtrip preserves all invariants") {
      val row = Sources.roundtripAudit(spark, Tables.documents(spark, sfDir), fmt)
        .collect().head
      assert(row.getAs[Long]("n_rows") == direct._1, s"$fmt rows")
      assert(row.getAs[Long]("sum_ids") == direct._2, s"$fmt ids")
      assert(row.getAs[Long]("n_distinct_h") == direct._3, s"$fmt distinct")
      assert(row.getAs[String]("min_h") == direct._4, s"$fmt min")
      assert(row.getAs[String]("max_h") == direct._5, s"$fmt max")
    }
  }
}
