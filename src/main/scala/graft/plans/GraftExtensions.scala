package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions.call_function

/** Session extension registering graft's native expressions, so that
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * [[GraftExtensions.register]] on a live session) exposes them to SQL and
  * the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.encodeWordFn)
    ext.injectOptimizerRule(_ => EncodeWordSimplification)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftExtensions {
  private val encodeWordFn = (
    new FunctionIdentifier("encode_word"),
    new ExpressionInfo(classOf[EncodeWordExpression].getName, "encode_word"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1,
        s"encode_word expects exactly 1 argument, got ${children.length}")
      EncodeWordExpression(children.head)
    })

  /** Imperative registration for an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      encodeWordFn._1, encodeWordFn._2, encodeWordFn._3)
    if (!spark.experimental.extraOptimizations.contains(EncodeWordSimplification))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ EncodeWordSimplification
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }

  /** Column API over the registered function. */
  def encode_word(c: Column): Column = call_function("encode_word", c)
}
