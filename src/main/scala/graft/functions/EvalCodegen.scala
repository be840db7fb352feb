package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

/** Codegen bridges for the native single-pass expressions: instead of
  * `CodegenFallback` (which boxes the current row into an InternalRow and
  * re-evaluates the CHILD expression interpretively on every call), the
  * generated code receives the child value from whole-stage codegen and
  * invokes this expression's own eval body directly — one virtual call
  * per row, no row boxing, and the projection's codegen span stays
  * unbroken. The loop itself intentionally stays compiled Scala (it is
  * already a tight monomorphic loop; re-emitting it as Java source would
  * add compile risk for no measured win).
  */
trait UnaryEvalCodegen extends UnaryExpression {

  /** Public bridge so generated code can reach the protected eval body. */
  final def evalNonNullInput(v: Any): Any = nullSafeEval(v)

  /** Java cast from Object to this expression's physical result type,
    * e.g. `(org.apache.spark.sql.catalyst.util.ArrayData) x` or
    * `((java.lang.Long) x).longValue()`. */
  protected def castResult(resVar: String): String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("expr", this)
      val res = ctx.freshName("res")
      if (nullable)
        s"""Object $res = $ref.evalNonNullInput($c);
           |if ($res == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${castResult(res)}; }""".stripMargin
      else
        s"""Object $res = $ref.evalNonNullInput($c);
           |${ev.value} = ${castResult(res)};""".stripMargin
    })
}

/** Binary twin of [[UnaryEvalCodegen]]. */
trait BinaryEvalCodegen extends BinaryExpression {

  final def evalNonNullInputs(a: Any, b: Any): Any = nullSafeEval(a, b)

  protected def castResult(resVar: String): String

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("expr", this)
      val res = ctx.freshName("res")
      if (nullable)
        s"""Object $res = $ref.evalNonNullInputs($a, $b);
           |if ($res == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${castResult(res)}; }""".stripMargin
      else
        s"""Object $res = $ref.evalNonNullInputs($a, $b);
           |${ev.value} = ${castResult(res)};""".stripMargin
    })
}
