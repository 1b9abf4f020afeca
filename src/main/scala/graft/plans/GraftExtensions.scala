package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom expressions for SQL
  * callers:
  *
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions …
  *   SELECT regexp_extract_groups(line, '^(\\S+) (\\S+)$') FROM logs
  *
  * (Scala callers use `RegexpExtractGroups.regexpGroups` directly.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("regexp_extract_groups"),
      new ExpressionInfo(classOf[RegexpExtractGroups].getName, "regexp_extract_groups"),
      GraftExtensions.regexpBuilder))
    ext.injectFunction((
      new FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
      GraftExtensions.dotBuilder))
    ext.injectFunction((
      new FunctionIdentifier("long_array_sum"),
      new ExpressionInfo(classOf[LongArraySum].getName, "long_array_sum"),
      GraftExtensions.arraySumBuilder))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSigs].getName, "minhash_sigs"),
      GraftExtensions.minhashBuilder))
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}

object GraftExtensions {
  private val regexpBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "regexp_extract_groups(subject, pattern)")
    RegexpExtractGroups(children.head, children(1))
  }

  private val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "long_array_dot(array<bigint>, array<bigint>)")
    LongArrayDot(children.head, children(1))
  }

  private val arraySumBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "long_array_sum(array<bigint>)")
    LongArraySum(children.head).toAggregateExpression()
  }

  private val minhashBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "minhash_sigs(array<string>)")
    MinhashSigs(children.head)
  }

  /** Register into an already-built session (the extensions conf only
    * applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "regexp_extract_groups", regexpBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_array_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_array_sum", arraySumBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", minhashBuilder, "built-in")
    // injectOptimizerRule only applies at session construction; the
    // experimental hook is the supported live-session equivalent
    if (!spark.experimental.extraOptimizations.contains(DotProductRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DotProductRewrite
    }
  }
}
