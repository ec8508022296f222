package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ByteEntropyStats, CdcBoundaries, DotMilli, DotProduct, FrameEnergy, MinHashSignature, SimHash64, SqDistMilli, Winnow}

/** Registers the native graft expressions as SQL functions.
  *
  * Builder-time (preferred):
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * }}}
  * or via config `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Runtime ([[GraftExtensions.register]]): for sessions built elsewhere
  * (e.g. the verification driver's).
  *
  * After either, `SELECT graft_dot(a, b)`, `graft_sqdist(ma, mb)`,
  * `graft_dot_milli(ma, mb)`, `graft_simhash64(tokens)`,
  * `graft_minhash(shingles, 32)`, `graft_winnow(text, 8, 4)`, and
  * `graft_byte_entropy(text)` work from SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.functions", name),
          builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression): Int =
    e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal].value match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"expected int literal, got $other")
    }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProduct(es(0), es(1))),
    "graft_sqdist" -> (es => SqDistMilli(es(0), es(1))),
    "graft_dot_milli" -> (es => DotMilli(es(0), es(1))),
    "graft_simhash64" -> (es => SimHash64(es(0))),
    "graft_minhash" -> (es => MinHashSignature(es(0), intLit(es(1)))),
    "graft_winnow" -> (es => Winnow(es(0), intLit(es(1)), intLit(es(2)))),
    "graft_frame_energy" -> (es => FrameEnergy(es(0), intLit(es(1)))),
    "graft_byte_entropy" -> (es => ByteEntropyStats(es(0))),
    "graft_cdc_boundaries" -> (es => CdcBoundaries(es(0))))

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.ColumnShim.registerFunction(spark, name, builder)
    }
}
