package graft.functions.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step applied to a symbol sequence: every LEFT-TO-RIGHT
  * NON-OVERLAPPING adjacent occurrence of (`left`, `right`) fuses into the
  * concatenated symbol — the inner loop of byte-pair-encoding training and
  * tokenization (Sennrich et al. 2016 §3.2). A Column-builtin formulation
  * needs a stateful scan (each fusion consumes the next position), which
  * higher-order functions cannot express without CodegenFallback; this is
  * the codegen'd kernel instead, same shape as [[SrpBuckets]].
  */
case class BpeMergePair(child: Expression, left: String, right: String)
    extends UnaryExpression {

  // null elements pass through untouched (they can never match a merge
  // side), so the output permits nulls exactly when the input does —
  // claiming containsNull=false over a nullable input would let
  // downstream codegen skip null checks and NPE
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpeMergePair expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    BpeMergePair.compute(a.asInstanceOf[ArrayData],
      UTF8String.fromString(left), UTF8String.fromString(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeLeft", UTF8String.fromString(left))
    val r = ctx.addReferenceObj("bpeRight", UTF8String.fromString(right))
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.catalyst.BpeMergePair$$.MODULE$$" +
        s".compute($a, $l, $r);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

object BpeMergePair {
  def compute(sym: ArrayData, left: UTF8String, right: UTF8String): ArrayData = {
    val n = sym.numElements()
    val out = new Array[AnyRef](n)
    var o = 0
    var i = 0
    while (i < n) {
      val cur = sym.getUTF8String(i)
      if (i + 1 < n && cur != null && left.equals(cur) &&
          right.equals(sym.getUTF8String(i + 1))) {
        out(o) = UTF8String.concat(left, right)
        i += 2 // consume both: non-overlapping left-to-right
      } else {
        out(o) = cur
        i += 1
      }
      o += 1
    }
    val trimmed = if (o == n) out else java.util.Arrays.copyOf(out, o)
    new GenericArrayData(trimmed.asInstanceOf[Array[Any]])
  }
}
