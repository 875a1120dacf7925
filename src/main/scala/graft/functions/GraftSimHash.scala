package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash signature of a token array as ONE native expression.
  *
  * Semantically identical to the dialect SQL chain the oracle keeps
  * (Dedup.simhashCte: explode tokens → h60 per word → 60 per-bit
  * ±1 sums grouped by doc → sign pack), but computed as a narrow
  * per-row loop: no explode, no 60-column hash aggregate, no shuffle.
  * The SQL form turns every document into |tokens| rows and pays a
  * hash-shuffle keyed by doc_id whose aggregate codegen (60 sum
  * columns) is the largest generated class in the engine; this
  * expression replaces that whole subplan with a projection that runs
  * at scan speed — the difference at 100 TB is a full shuffle of the
  * tokenized corpus.
  *
  * Duplicated words contribute once per occurrence (explode
  * semantics).  An EMPTY token array yields NULL (the SQL form emits
  * no row for a token-less doc — callers filter nulls to match that
  * relation exactly).  Ties (sum == 0) leave the bit clear, matching
  * `CASE WHEN s > 0`.
  */
case class GraftSimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    GraftSimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Long ${ev.value}$$r = graft.functions.GraftSimHash.compute($c);
         |if (${ev.value}$$r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}$$r.longValue();
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): GraftSimHash =
    copy(child = newChild)
}

object GraftSimHash {
  val Bits = 60

  /** Sign-packed per-bit ±1 sums over the h60 hashes of all non-null
    * elements; null when none contribute (the grouped SQL form's sum()
    * skips nulls and emits no row for an empty group). */
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    val counts = new Array[Int](Bits)
    var contributed = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        contributed = true
        val h = GraftH60.h60(arr.getUTF8String(i))
        var j = 0
        while (j < Bits) {
          counts(j) += ((((h >>> j) & 1L) << 1) - 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    if (!contributed) return null
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }
}
