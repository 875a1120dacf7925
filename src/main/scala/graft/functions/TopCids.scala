package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native nearest-centroids assignment: for a row's vector `v` (with
  * precomputed norm `nrm`), the `top` best centroid ids of a FIXED
  * codebook by (cosine desc, cid asc), where a non-positive norm
  * product scores the sentinel −2.0 (cosine ∈ [−1, 1], so it sorts
  * below every real score) — bit-for-bit the contract of the
  * broadcast-join + bounded-heap form it replaces
  * (`Similarity.centroidTopDF`: `graft_dot(v, cv)/(nrm·cnrm)` with a
  * `> 0` guard, `TopKPairs`' (cs desc, cid asc) order).
  *
  * Why an expression and not a join: assignment against k trained
  * centroids as a join materializes n·k rows through an object
  * aggregate plus a shuffle of n groups — measured ~47 s for
  * k = 447, n = 200 k at the 100× fixture, ~90 % of every `_scaled`
  * serve.  As an expression the k·D loop runs inside the row
  * pipeline: no join, no shuffle, primitive arrays only.  The
  * codebook enters as THREE foldable literals (one `Literal` node
  * each, extracted once into flat primitive arrays) — never as k·D
  * expression leaves, which is what overflowed Janino and
  * constant-folding in the unrolled-literal form
  * (`Similarity.CentroidExprMaxK`).
  *
  * Arguments: (v array<double>, nrm double, cids array<bigint>
  * ASCENDING, cvs array<array<double>>, cnrms array<double>,
  * top int); the last four must be foldable.  Returns array<bigint>
  * of min(top, k) cids, best first.  Null `v` or `nrm` → null.
  */
case class GraftTopCids(v: Expression, nrm: Expression,
    cids: Expression, cvs: Expression, cnrms: Expression,
    top: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(v, nrm, cids, cvs, cnrms, top)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_top_cids"

  override def checkInputDataTypes(): TypeCheckResult = {
    // pin the codebook literals' ELEMENT types too — graft_top_cids is
    // a registered SQL function, so a caller passing e.g. array(1, 2)
    // (ints) must fail at analysis, not ClassCastException in the lazy
    // codebook extraction on the first task
    def arrOf(e: Expression, elem: DataType): Boolean = e.dataType match {
      case ArrayType(t, _) => t == elem
      case _ => false
    }
    val ok = arrOf(v, DoubleType) &&
      nrm.dataType == DoubleType &&
      Seq(cids, cvs, cnrms, top).forall(_.foldable) &&
      arrOf(cids, LongType) &&
      (cvs.dataType match { // nullability of the nesting is irrelevant
        case ArrayType(ArrayType(DoubleType, _), _) => true
        case _ => false
      }) &&
      arrOf(cnrms, DoubleType) &&
      top.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_top_cids requires (v array<double>, nrm double) row " +
        "arguments and a foldable literal codebook typed " +
        "(cids array<bigint>, cvs array<array<double>>, " +
        "cnrms array<double>, top int)")
  }

  // The codebook literals, extracted ONCE into flat primitive arrays.
  // cid order must be ascending so the strict-> insertion below
  // resolves equal cosines toward the smaller cid — the (cs desc,
  // cid asc) total order of the join form.
  @transient private lazy val (kN, dimD, cidArr, cvFlat, cnrmArr, topN) = {
    val cidA = cids.eval(null).asInstanceOf[ArrayData].toLongArray()
    val cvA = cvs.eval(null).asInstanceOf[ArrayData]
    val cnA = cnrms.eval(null).asInstanceOf[ArrayData].toDoubleArray()
    val t = top.eval(null).asInstanceOf[Int]
    val k = cidA.length
    require(k > 0 && cnA.length == k && cvA.numElements() == k && t > 0,
      s"graft_top_cids: inconsistent codebook (k=$k, cnrms=${cnA.length}, " +
        s"cvs=${cvA.numElements()}, top=$t)")
    var i = 1
    while (i < k) {
      require(cidA(i - 1) < cidA(i), "graft_top_cids: cids must ascend")
      i += 1
    }
    val d = cvA.getArray(0).numElements()
    val flat = new Array[Double](k * d)
    i = 0
    while (i < k) {
      val row = cvA.getArray(i)
      require(row.numElements() == d, "graft_top_cids: ragged codebook")
      var j = 0
      while (j < d) { flat(i * d + j) = row.getDouble(j); j += 1 }
      i += 1
    }
    (k, d, cidA, flat, cnA, t)
  }

  /** The per-row kernel, shared by eval and codegen (one virtual call
    * per row; the k·D loop itself is JIT-compiled primitive code). */
  def topCids(x: ArrayData, xnrm: Double): ArrayData = {
    val m = math.min(topN, kN)
    val bs = new Array[Double](m)
    val bc = new Array[Long](m)
    var filled = 0
    val lim0 = x.numElements()
    var ci = 0
    while (ci < kN) {
      val lim = if (lim0 < dimD) lim0 else dimD
      var s = 0.0
      var i = 0
      val base = ci * dimD
      while (i < lim) { s += x.getDouble(i) * cvFlat(base + i); i += 1 }
      val den = xnrm * cnrmArr(ci)
      val cs = if (den > 0) s / den else -2.0
      // strict > keeps the earlier (smaller) cid on equal cosines
      if (filled < m || cs > bs(filled - 1)) {
        var pos = if (filled < m) filled else m - 1
        while (pos > 0 && cs > bs(pos - 1)) {
          bs(pos) = bs(pos - 1); bc(pos) = bc(pos - 1); pos -= 1
        }
        bs(pos) = cs
        bc(pos) = cidArr(ci)
        if (filled < m) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(bc.slice(0, filled))
  }

  override def eval(input: InternalRow): Any = {
    val vV = v.eval(input)
    if (vV == null) return null
    val nV = nrm.eval(input)
    if (nV == null) return null
    topCids(vV.asInstanceOf[ArrayData], nV.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // force codebook extraction at codegen time so a malformed literal
    // fails the query, not the first task
    val _ = kN
    val ref = ctx.addReferenceObj("graftTopCids", this, classOf[GraftTopCids].getName)
    val vEv = v.genCode(ctx)
    val nEv = nrm.genCode(ctx)
    ev.copy(code = code"""
      ${vEv.code}
      ${nEv.code}
      boolean ${ev.isNull} = ${vEv.isNull} || ${nEv.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = $ref.topCids(${vEv.value}, ${nEv.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftTopCids =
    copy(v = newChildren(0), nrm = newChildren(1), cids = newChildren(2),
      cvs = newChildren(3), cnrms = newChildren(4), top = newChildren(5))
}
