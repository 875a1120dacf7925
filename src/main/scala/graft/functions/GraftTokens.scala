package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer: maximal runs of [a-z0-9] in the lowercased text —
  * bit-identical to the dialect fragment
  * `filter(split(trim(regexp_replace(lower(t), '[^a-z0-9]+', ' ')), ' '), ...)`
  * but a single byte-scan pass instead of four interpreted
  * higher-order/regex expressions (the chain sits under every shingle
  * and SimHash query).  Works on the lowered UTF8String's bytes:
  * multi-byte (non-ASCII) characters have all bytes ≥ 0x80, so they
  * can never be mistaken for [a-z0-9] — the run semantics match the
  * regex exactly for any input.
  */
case class GraftTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokens requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(input: Any): Any =
    GraftTokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftTokens.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftTokens =
    copy(child = newChild)
}

object GraftTokens {
  def tokenize(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val out = new ArrayBuffer[Any](16)
    var i = 0
    var start = -1
    while (i <= bytes.length) {
      val alnum = i < bytes.length && {
        val b = bytes(i)
        (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      }
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) {
        out += UTF8String.fromBytes(bytes, start, i - start)
        start = -1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
