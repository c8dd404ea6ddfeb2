package graft.iceberg

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-level Iceberg partition transform for the WRITE path: computes the
  * transformed partition value of each row so the writer can cluster rows
  * into per-partition data files and record exact partition tuples.
  *
  * Delegates to the same [[PartitionTransforms.apply]] the read side
  * prunes with, so written tuples and pruning judgments agree by
  * construction — a bespoke Spark-builtin formulation (e.g. `year(ts)`,
  * murmur3 via `hash()`) could drift on timezone or hash-seed semantics
  * and silently mis-prune everything this writer produces.
  *
  * Codegen emits one virtual call per row through a referenced instance
  * (the [[graft.functions.catalyst]] pattern), keeping the write
  * projection inside whole-stage codegen.
  */
case class IcebergTransform(transform: String, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType =
    PartitionTransforms.resultType(transform, child.dataType)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (dataType == NullType)
      TypeCheckResult.TypeCheckFailure(
        s"transform $transform is not applicable to ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any = compute(input)

  /** Internal-row value in, internal-row value out (UTF8String ↔ String
    * at the boundary; date/timestamp are already epoch ints/micros). */
  def compute(input: Any): Any = {
    val raw = input match {
      case u: UTF8String => u.toString
      case o => o
    }
    PartitionTransforms.apply(transform, child.dataType, raw) match {
      case Some(s: String) => UTF8String.fromString(s)
      case Some(v) => v
      case None => throw new IllegalArgumentException(
        s"cannot apply partition transform $transform to value $raw " +
          s"of ${child.dataType.simpleString}")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("xform", this, classOf[IcebergTransform].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${CodeGenerator.boxedType(dataType)}) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergTransform =
    copy(child = newChild)
}
