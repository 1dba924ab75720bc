package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expression for H3 point encoding: `latLngToCell(lat,
  * lon, res)` as a codegen'd call instead of a Scala UDF. On the hot
  * cell-keyed join paths a UDF pays per-row boxing + Option wrapping and
  * breaks the WholeStageCodegen span in two; this generates a direct
  * static call inside the span (scalac emits static forwarders for the
  * H3Geo object, so Janino resolves `graft.index.H3Geo.latLngToCell`).
  * The interpreted path (`nullSafeEval`) calls the same kernel, so
  * codegen-on and codegen-off plans are identical by construction.
  */
case class H3CellExpr(left: Expression, right: Expression, res: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  // the analyzer inserts implicit casts (or fails analysis) for non-double
  // inputs, so the SQL surface and the codegen/interpreted paths all see
  // doubles — without this, an IntegerType input would silently widen under
  // codegen but ClassCastException under nullSafeEval. (Covariant override:
  // AbstractDataType itself is private[sql]; Seq[DataType] narrows it.)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def prettyName: String = "h3_cell"

  override protected def nullSafeEval(lat: Any, lon: Any): Any =
    graft.index.H3Geo.latLngToCell(lat.asInstanceOf[Double], lon.asInstanceOf[Double], res)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, lo) => s"graft.index.H3Geo.latLngToCell($la, $lo, $res)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object H3CellExpr {
  import org.apache.spark.sql.graft.bridge

  /** Column API: H3 cell id of (lat, lon) at `res`; inputs are cast to
    * double so callers can pass any numeric column. */
  def h3Cell(lat: Column, lon: Column, res: Int): Column =
    bridge.column(
      H3CellExpr(bridge.expression(lat.cast("double")), bridge.expression(lon.cast("double")), res))
}
