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
    ext.injectFunction(GraftExtensions.levWithinFn)
    ext.injectFunction(GraftExtensions.interleaveBitsFn)
    ext.injectFunction(GraftExtensions.charShinglesFn)
    ext.injectFunction(GraftExtensions.winnowFingerprintsFn)
    ext.injectOptimizerRule(_ => EncodeWordSimplification)
    ext.injectOptimizerRule(_ => SummaryRewrite)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    // parser tier: the GRAFT TOPK dialect (only effective when the session
    // is BUILT with spark.sql.extensions=graft.plans.GraftExtensions — the
    // parser is baked into sessionState at construction, so the imperative
    // register() below cannot retrofit it)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
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

  private val levWithinFn = (
    new FunctionIdentifier("lev_within"),
    new ExpressionInfo(classOf[LevWithinExpression].getName, "lev_within"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 3,
        s"lev_within expects (a, b, k), got ${children.length} arguments")
      val k = children(2) match {
        case e if e.foldable &&
            e.dataType == org.apache.spark.sql.types.IntegerType =>
          e.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"lev_within: k must be an INT literal, got $other")
      }
      require(k >= 0, s"lev_within: k must be non-negative, got $k")
      LevWithinExpression(children(0), children(1), k)
    })

  private val interleaveBitsFn = (
    new FunctionIdentifier("interleave_bits"),
    new ExpressionInfo(classOf[InterleaveBitsExpression].getName, "interleave_bits"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2,
        s"interleave_bits expects (x, y), got ${children.length} arguments")
      InterleaveBitsExpression(children(0), children(1))
    })

  private val charShinglesFn = (
    new FunctionIdentifier("char_shingles"),
    new ExpressionInfo(classOf[ShingleGenerator].getName, "char_shingles"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 3,
        s"char_shingles expects (text, k, stride), got ${children.length} arguments")
      def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                 what: String): Int = e match {
        case l if l.foldable && l.dataType == org.apache.spark.sql.types.IntegerType =>
          l.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"char_shingles: $what must be an INT literal, got $other")
      }
      ShingleGenerator(children(0),
        intLit(children(1), "k"), intLit(children(2), "stride"))
    })

  private val winnowFingerprintsFn = (
    new FunctionIdentifier("winnow_fingerprints"),
    new ExpressionInfo(classOf[WinnowGenerator].getName, "winnow_fingerprints"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 3,
        s"winnow_fingerprints expects (text, k, w), got ${children.length} arguments")
      def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                 what: String): Int = e match {
        case l if l.foldable && l.dataType == org.apache.spark.sql.types.IntegerType =>
          l.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"winnow_fingerprints: $what must be an INT literal, got $other")
      }
      WinnowGenerator(children(0), intLit(children(1), "k"), intLit(children(2), "w"))
    })

  /** Imperative registration for an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      encodeWordFn._1, encodeWordFn._2, encodeWordFn._3)
    spark.sessionState.functionRegistry.registerFunction(
      levWithinFn._1, levWithinFn._2, levWithinFn._3)
    spark.sessionState.functionRegistry.registerFunction(
      interleaveBitsFn._1, interleaveBitsFn._2, interleaveBitsFn._3)
    spark.sessionState.functionRegistry.registerFunction(
      charShinglesFn._1, charShinglesFn._2, charShinglesFn._3)
    spark.sessionState.functionRegistry.registerFunction(
      winnowFingerprintsFn._1, winnowFingerprintsFn._2, winnowFingerprintsFn._3)
    if (!spark.experimental.extraOptimizations.contains(EncodeWordSimplification))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ EncodeWordSimplification
    if (!spark.experimental.extraOptimizations.contains(SummaryRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SummaryRewrite
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }

  /** Column API over the registered function. */
  def encode_word(c: Column): Column = call_function("encode_word", c)
}
