package graft.plans

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-group regex extraction: returns
  * `array(group0, group1, …)` for the first match, or NULL when the
  * pattern doesn't match.
  *
  * Spark's built-in `regexp_extract` yields one group per call, so a
  * 5-field parse (e.g. the Postfix header, maillog2db.go:46) costs a
  * match-guard plus five extractions — six regex executions per row.
  * This expression runs the pattern once and doubles as the match
  * guard (`isNotNull`). The pattern must be foldable; it is compiled
  * once per task, like the built-in regexp expressions.
  */
case class RegexpExtractGroups(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_extract_groups"

  /** Analysis-time validation — a non-foldable or NULL pattern must
    * fail cleanly, not as an executor-side eval error. */
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName pattern must be a literal")
    else if (right.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName pattern must not be NULL")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val pattern: Pattern =
    Pattern.compile(right.eval().toString)

  /** Shared by interpreted and generated paths. */
  def extract(subject: UTF8String): GenericArrayData = {
    val m = pattern.matcher(subject.toString)
    if (m.find()) {
      val out = new Array[Any](m.groupCount() + 1)
      var i = 0
      while (i <= m.groupCount()) {
        val g = m.group(i)
        out(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(out)
    } else null
  }

  override protected def nullSafeEval(subject: Any, regex: Any): Any =
    extract(subject.asInstanceOf[UTF8String])

  /** Stays inside whole-stage codegen: the generated code calls back
    * into [[extract]] through a bound reference (the regex work
    * dominates; what matters is not collapsing the whole projection
    * out of the codegen stage the way CodegenFallback does). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftRegexGroups", this,
      classOf[RegexpExtractGroups].getName)
    nullSafeCodeGen(ctx, ev, (subject, _) =>
      s"""
         |${ev.value} = $ref.extract($subject);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RegexpExtractGroups {
  /** Column API: one regex pass, groups as a string array. */
  def regexpGroups(c: Column, re: String): Column =
    Bridge.column(RegexpExtractGroups(Bridge.expression(c), Literal(re)))
}
