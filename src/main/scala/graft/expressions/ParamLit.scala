package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** A bound-parameter literal: evaluates to a constant like `Literal`, but
  * the value lives in the codegen `references` array instead of being
  * inlined into the generated Java source.
  *
  * Why this exists: the crawl loop builds ~30 plans per epoch that differ
  * ONLY in the epoch number. A plain `lit(epoch)` inlines the number into
  * the generated code, so every epoch produces textually different code and
  * pays Janino compilation for every plan again — the measured ~12.5 s/epoch
  * fixed driver cost (BASELINE.md round-4 addendum). With the value behind
  * `references[i]`, identical plan shapes generate byte-identical source
  * across epochs and `CodeGenerator.cache` turns per-epoch compilation into
  * a hit.
  *
  * `foldable = false` keeps ConstantFolding from turning it back into an
  * inlined `Literal`. That also opts out of literal-only optimizations
  * (e.g. partition pruning), so use this ONLY for values feeding
  * projections/arithmetic — never for pruning predicates on partition
  * columns (the loop prunes by listing leaf directories explicitly).
  */
case class ParamLit(value: Any, dataType: DataType) extends LeafExpression {
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    val ref = ctx.addReferenceObj("graftParam", value, boxed)
    val v = ctx.freshName("graftParam")
    ev.copy(
      code = code"final $javaType $v = $ref;",
      isNull = FalseLiteral,
      value = JavaCode.variable(v, dataType))
  }
  override def prettyName: String = "param_lit"
}

object ParamLit {
  import org.apache.spark.sql.graftbridge.Bridge
  def int(v: Int): Column = Bridge.column(ParamLit(v, IntegerType))
  def long(v: Long): Column = Bridge.column(ParamLit(v, LongType))
}
