package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Analysis-time type guard for the SQL-surface time arguments: the
  * injected names take MICROSECOND BIGINT timestamps (`unix_micros(ts)`
  * — the same unit the batch operators use), and a TIMESTAMP column
  * silently cast to long yields SECONDS, so every `(?t OP v)` /
  * window-bound constraint would be off by 10^6 with no error. This
  * no-op pass-through rejects non-integral inputs during analysis with
  * a message that names the fix. */
case class RequireMicrosLong(child: Expression, what: String)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$what must be an integral microsecond value " +
          s"(use unix_micros(ts)), got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = input match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(long) $c")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
