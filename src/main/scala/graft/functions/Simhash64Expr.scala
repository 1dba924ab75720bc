package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 64-bit document fingerprint
  * (`graft.Queries.simhash64` — the mixed two-half SimHash the Hamming
  * joins key on): a codegen'd static call instead of a Scala UDF, so a
  * SQL user can write the WHOLE near-dup join in SQL —
  *
  * {{{ SELECT ... FROM docs a JOIN docs b
  *     ON bit_count(simhash64(a.text) ^ simhash64(b.text)) <= 3 }}}
  *
  * — and [[graft.plans.HammingJoinRewrite]] plans it as the banded
  * equi-join (the fingerprint expressions land one per side, which is
  * exactly the shape the rule matches). The interpreted path calls the
  * same kernel, so codegen-on/off plans agree by construction.
  */
case class Simhash64Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    graft.Queries.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.Queries.simhash64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash64Expr {
  import org.apache.spark.sql.graft.bridge

  /** Column API: the 64-bit fingerprint of a text column. */
  def simhash64(text: Column): Column =
    bridge.column(Simhash64Expr(bridge.expression(text)))
}
