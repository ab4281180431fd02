package org.apache.spark.sql.graft

/** Test fixture: applies a SparkSessionExtensions configurator to a
  * scratch FunctionRegistry (registerFunctions is private[sql], hence
  * this package) so specs can assert what
  * `spark.sql.extensions=graft.GraftExtensions` would register at
  * session build. Test-only — lives in src/test. */
object ExtensionProbe {
  def injectedFunctionNames(
      configure: org.apache.spark.sql.SparkSessionExtensions => Unit): Set[String] = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    configure(ext)
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    val before = reg.listFunction().toSet
    ext.registerFunctions(reg)
    (reg.listFunction().toSet -- before).map(_.funcName)
  }
}
