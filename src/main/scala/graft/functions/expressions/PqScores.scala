package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** All product-quantizer subspace scores in ONE pass:
  * `graft_pq_scores(v, cbFlat, c2Flat, m, k)` → `array<double>` of length
  * `m·k`, where entry `m0·k + i` is the ADC score of centroid i in
  * subspace m0:
  *
  *   score = −2·⟨v[lo₍m0₎..hi₍m0₎), cb(m0)(i)⟩ + ‖cb(m0)(i)‖²
  *
  * i.e. the subspace L2 distance minus the per-row constant ‖v_m‖², which
  * cancels in both uses of the array: the per-subspace argmin (encoding a
  * corpus vector to its m codes) and the per-query ADC table (summing one
  * slot per subspace). Subspace m0 covers dims [m0·dim/m, (m0+1)·dim/m) —
  * the same even-split rule the codebook trainer uses
  * (SimilarityQueries.pqCodebooks), so the flat codebook blocks line up
  * with the slices by construction (block m0 starts at k·lo).
  *
  * The composed spelling — m·k separate `graft_dot(slice(v,…), <literal
  * centroid>)` calls — carries 128 array literals through the plan and
  * re-reads the vector per centroid; it measured 1.9 s of the sf0.1
  * battery (plan compile dominated). Here the codebook and the
  * precomputed ‖c‖² terms are foldable, materialized once as codegen
  * reference arrays, and the vector converts to `double[]` once per row.
  *
  * Nulls/ragged vectors: a null vector, a null element, or a dimension
  * mismatch with the codebook (`cbFlat.length != k·dim`) yields NULL —
  * matching the composed spelling, where `graft_dot` over a misaligned
  * slice returns NULL and poisons the score array. Downstream `array_min`
  * / `element_at` propagate the NULL instead of aborting (EdgeCorpusSpec
  * sweeps this).
  */
case class PqScores(vector: Expression, codebook: Expression,
    c2: Expression, m: Expression, k: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(vector, codebook, c2, m, k)

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!arr(vector.dataType) || !arr(codebook.dataType) || !arr(c2.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_pq_scores requires array<double> vector/codebook/c2, got " +
          s"(${vector.dataType.sql}, ${codebook.dataType.sql}, ${c2.dataType.sql})")
    else if (m.dataType != IntegerType || k.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("m/k must be INT literals")
    else if (!codebook.foldable || !c2.foldable || !m.foldable || !k.foldable)
      TypeCheckResult.TypeCheckFailure(
        "codebook/c2/m/k must be foldable (the codebook is per-query, not per-row)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_pq_scores"

  @transient private lazy val nSub: Int = m.eval().asInstanceOf[Int]
  @transient private lazy val nCent: Int = k.eval().asInstanceOf[Int]
  @transient private lazy val cbFlat: Array[Double] = {
    val a = codebook.eval().asInstanceOf[ArrayData].toDoubleArray()
    require(nSub > 0 && nCent > 0, s"bad PQ geometry: $nSub x $nCent")
    require(a.length % nCent == 0,
      s"codebook length ${a.length} not divisible by k=$nCent")
    a
  }
  @transient private lazy val c2Flat: Array[Double] = {
    val a = c2.eval().asInstanceOf[ArrayData].toDoubleArray()
    require(a.length == nSub * nCent,
      s"c2 length ${a.length} != m*k=${nSub * nCent}")
    a
  }
  @transient private lazy val dim: Int = cbFlat.length / nCent

  override def eval(input: InternalRow): Any = {
    val v = vector.eval(input)
    if (v == null) return null
    val xs = v.asInstanceOf[ArrayData]
    if (xs.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (xs.isNullAt(i)) return null
      i += 1
    }
    new GenericArrayData(
      PqScores.scores(xs.toDoubleArray(), cbFlat, c2Flat, nSub, nCent))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cbRef = ctx.addReferenceObj("pqCodebook", cbFlat, "double[]")
    val c2Ref = ctx.addReferenceObj("pqC2", c2Flat, "double[]")
    val vEv = vector.genCode(ctx)
    val xs = ctx.freshName("xs")
    val i = ctx.freshName("i")
    val ok = ctx.freshName("ok")
    ev.copy(code =
      code"""
         |${vEv.code}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${vEv.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $xs = ${vEv.value};
         |  if ($xs.numElements() == $dim) {
         |    boolean $ok = true;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($xs.isNullAt($i)) { $ok = false; break; }
         |    }
         |    if ($ok) {
         |      ${ev.isNull} = false;
         |      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |        graft.functions.expressions.PqScores.scores(
         |          $xs.toDoubleArray(), $cbRef, $c2Ref, $nSub, $nCent));
         |    }
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqScores =
    copy(vector = newChildren(0), codebook = newChildren(1),
      c2 = newChildren(2), m = newChildren(3), k = newChildren(4))
}

object PqScores {
  /** All m·k ADC scores for one vector — shared by interpreted eval and
    * generated code. Per centroid: strict left-to-right dot product (the
    * [[DotProduct]] fold order), so scores are bit-identical to the
    * composed `graft_dot(slice(v,…), centroid)` spelling. */
  def scores(vec: Array[Double], cb: Array[Double], c2: Array[Double],
      m: Int, k: Int): Array[Double] = {
    val dim = vec.length
    val out = new Array[Double](m * k)
    var m0 = 0
    while (m0 < m) {
      val lo = m0 * dim / m
      val hi = (m0 + 1) * dim / m
      val len = hi - lo
      var i0 = 0
      while (i0 < k) {
        // block m0 starts at k·lo; centroid i0 of that block at +i0·len
        val base = k * lo + i0 * len
        var acc = 0d
        var d = 0
        while (d < len) {
          acc += vec(lo + d) * cb(base + d)
          d += 1
        }
        out(m0 * k + i0) = -2.0 * acc + c2(m0 * k + i0)
        i0 += 1
      }
      m0 += 1
    }
    out
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqScores].getName, "graft_pq_scores")
}
