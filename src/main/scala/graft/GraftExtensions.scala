package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** Library packaging for a cluster deployment: inject the whole dd_*
  * function surface at session build —
  *
  * {{{
  * spark.sql.extensions = graft.GraftExtensions
  * }}}
  *
  * — the Spark-native equivalent of DuckDB's `LOAD dazzleduck` (the
  * reference extension registers its scalar functions on load). Every
  * session of the cluster then has the functions without per-session
  * [[GraftFunctions.register]] calls. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
