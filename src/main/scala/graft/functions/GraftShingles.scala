package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingle set as ONE native expression —
  * semantically identical to the dialect chain the oracle keeps
  * (TextOps.shingles3: `array_distinct(transform(sequence(1, n-2),
  * i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))`), which Spark
  * executes as interpreted HigherOrderFunction lambdas (HOFs are
  * CodegenFallback) with one boxed call per shingle.  This is a single
  * primitive pass with first-occurrence-ordered dedup, exactly
  * array_distinct's order. */
case class GraftShingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles3 requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles3"

  override def nullSafeEval(input: Any): Any =
    GraftShingles3.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftShingles3.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftShingles3 =
    copy(child = newChild)
}

object GraftShingles3 {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]((n - 2) * 2)
    var i = 0
    while (i <= n - 3) {
      // a null token nulls the concat in the HOF chain and the null
      // gram is dropped by the downstream explode/hash — skip it here
      // so the output honors containsNull=false (graft_tokens never
      // emits nulls; this guards the public SQL surface)
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1) && !arr.isNullAt(i + 2))
        seen.add(UTF8String.concat(arr.getUTF8String(i), Space,
          arr.getUTF8String(i + 1), Space, arr.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

/** 32-component MinHash signature of a (distinct) gram array as ONE
  * native expression — identical to the oracle's formulation
  * `min((a_i * (h60(gram) % P) + b_i) % P) GROUP BY doc` over the
  * exploded gram relation (Dedup.sigCtes), but computed per row: one
  * md5 per gram, 32 min-updates, no explode and no hash-shuffle of
  * the gram corpus.  An empty gram array yields NULL (the grouped
  * form emits no row), so callers filter nulls to match the relation. */
case class GraftMinHash(child: Expression) extends UnaryExpression {
  import graft.ops.TextOps

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    GraftMinHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.GraftMinHash.compute($c);
         |if (${ev.value} == null) {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): GraftMinHash =
    copy(child = newChild)
}

object GraftMinHash {
  import graft.ops.TextOps.{NumPerms, P, permA, permB}

  private val as: Array[Long] = Array.tabulate(NumPerms)(permA)
  private val bs: Array[Long] = Array.tabulate(NumPerms)(permB)

  /** Returns null when no non-null element contributes (the grouped
    * form's min() skips nulls; a group of only nulls yields no usable
    * signature). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    var contributed = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        contributed = true
        val g = GraftH60.h60(arr.getUTF8String(i)) % P
        var k = 0
        while (k < NumPerms) {
          val v = (as(k) * g + bs(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!contributed) null else new GenericArrayData(mins)
  }
}
