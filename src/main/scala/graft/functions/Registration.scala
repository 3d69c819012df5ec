package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Register-once gate for graft's session temp functions.
  *
  * Query constructors call `X.register(spark)` defensively (a session
  * built without [[graft.GraftExtensions]] would otherwise fail to
  * resolve the function), and many QuerySpec builders construct per
  * invocation — so an unconditional `createOrReplaceTempFunction`
  * emitted a `SimpleFunctionRegistry ... replaced a previously
  * registered function` WARN per construction. Harmless semantically,
  * but the spam competes with the compact bench result line for the
  * driver's bounded stdout tail capture. Checking existence first keeps
  * re-registration silent and a no-op; sessions built with
  * GraftExtensions (the production path) skip straight through.
  */
private[functions] object Registration {
  def once(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    // synchronized: exists+register is check-then-act, and QuerySpecs
    // ARE constructed concurrently (IngestCertSpec's concurrency test) —
    // two threads both seeing functionExists=false would both register,
    // resurfacing the WARN this gate exists to silence. The registry is
    // the natural monitor (one per session; registrations are rare).
    reg.synchronized {
      if (!reg.functionExists(new FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
