package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the geohash-from-indices encode: one
  * leaf node calling `Geohash.fromIndices` (the kernel) instead of the
  * former ~40·len-node composed-builtin tree (5 shifts/masks/ors + substr
  * per char, concat over len chars). The behavior on the query domain is
  * identical — the composed tree was the MIRROR of this very kernel,
  * differentially pinned in SpatialJoinSpec (which now pins the codegen
  * call path against the direct kernel call instead) — but the plan the
  * analyzer/optimizer walk shrinks from hundreds of expression nodes to
  * one, which matters because Catalyst planning runs inside the timed
  * region of every bench rep (measured 0.15–0.21 s/rep on q02–q05 with
  * the composed tree, bench.PlanTimeProbe). The interpreted path
  * (`nullSafeEval`) calls the same kernel, so codegen-on and codegen-off
  * plans agree by construction (the H3CellExpr pattern).
  *
  * Domain note: the kernel uses logical shifts (`>>>`) where the composed
  * tree used arithmetic `shiftright` — identical for the non-negative
  * clamped indices every call site produces (the lonIdxCol/latIdxCol
  * GREATEST(…, 0) clamp exists precisely to keep this domain). */
case class GeohashExpr(left: Expression, right: Expression, len: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def prettyName: String = "geohash_cell"

  override protected def nullSafeEval(lonIdx: Any, latIdx: Any): Any =
    UTF8String.fromString(graft.index.Geohash.fromIndices(
      lonIdx.asInstanceOf[Long], latIdx.asInstanceOf[Long], len))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lo, la) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.index.Geohash.fromIndices($lo, $la, $len))")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
