package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit hash as one native expression —
  * bit-identical to the dialect fragment
  * `CAST(CONV(SUBSTRING(MD5(x), 1, 15), 16, 10) AS BIGINT)` (the first
  * 15 hex chars of md5, parsed base-16; see TextOps.SqlDialect), but
  * computed straight from the digest bytes: no 32-char hex string, no
  * substring copy, no base-conversion parse.  The first 15 hex chars
  * are bytes 0..6 plus the high nibble of byte 7.
  *
  * This chain sits under every per-row hash in the dedup/sketch
  * family (MinHash shingle hashing, SimHash word hashing, KMV key
  * hashing), so it is the hottest scalar in those plans.
  */
case class GraftH60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h60 requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override def nullSafeEval(input: Any): Any =
    GraftH60.h60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftH60.h60($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftH60 =
    copy(child = newChild)
}

object GraftH60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def h60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    // hex chars 0..14 = bytes 0..6 in full + the high nibble of byte 7
    ((b(0) & 0xffL) << 52) | ((b(1) & 0xffL) << 44) |
      ((b(2) & 0xffL) << 36) | ((b(3) & 0xffL) << 28) |
      ((b(4) & 0xffL) << 20) | ((b(5) & 0xffL) << 12) |
      ((b(6) & 0xffL) << 4) | ((b(7) & 0xffL) >>> 4)
  }
}
