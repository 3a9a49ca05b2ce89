package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.DataType

/** Identity barrier that stops the optimizer from duplicating an
  * EXPENSIVE derived column (optimization-guide §4.4, applied to
  * built-in expressions instead of Python UDFs).
  *
  * The problem it solves: `withColumn("x", bigExpr).filter(p(x))`
  * gets rewritten by predicate pushdown into `Filter(p(bigExpr))`
  * BELOW the project, so `bigExpr` is evaluated twice per surviving
  * row — once in the pushed filter, once again in the projection —
  * and the pushed copy lands in the scan stage (r15 measured the
  * stac link synthesis and the dedup pair-verify `intersect_size`
  * running exactly twice this way). Whole-stage codegen does NOT
  * eliminate common subexpressions across operator boundaries, so
  * the duplication is real CPU at any scale.
  *
  * `Once(child)` evaluates as the identity at zero runtime cost
  * (codegen passthrough) but reports `deterministic = false`, which
  * makes the optimizer refuse to push predicates referencing it past
  * the defining Project — the sanctioned §4.4 mechanism
  * (`asNondeterministic`) scoped to one call site. The child itself
  * IS deterministic, so retries/replays still reproduce identical
  * values; only the optimizer's licence to copy the expression is
  * withdrawn. Use it on expensive derived columns that are
  * subsequently filtered on — never on join keys or grouping keys
  * (analysis rejects non-deterministic expressions there).
  */
case class Once(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Once =
    copy(child = newChild)
}
