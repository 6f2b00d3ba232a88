package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Banded hyperplane-LSH signature in ONE pass:
  * `graft_lsh_bands(v, planesFlat, bands, bits)` → `array<long>` of length
  * `bands`, where band b's value has bit j set iff
  * `dot(v, plane_{b*bits+j}) > 0`.
  *
  * The composed spelling — `bands × bits` separate `graft_dot(v, <literal
  * plane>)` calls — re-reads the vector from ArrayData once per plane (96×
  * per row at the default 16×6 geometry) and carries 96 array literals
  * through the plan; this expression was the dedup_embed_cosine hot path
  * (~5.3 s of the sf0.1 battery). Here the plane matrix is foldable and is
  * materialized ONCE into a flat `double[]` (a codegen reference object,
  * not per-row literals), and the vector converts to `double[]` once per
  * row — identical arithmetic, ~1/bands·bits of the overhead.
  *
  * ORACLE PARITY: each plane's dot product is the same strict left-to-right
  * IEEE-double summation as [[DotProduct]]/DuckDB's `list_dot_product`, so
  * the sign — and therefore every band value — is bit-identical to the
  * composed spelling the oracle still runs.
  *
  * Nulls/ragged vectors: a null vector, a null ELEMENT, or a dimension
  * mismatch with the plane matrix yields the ALL-ZERO signature — exactly
  * what the composed spelling computes there (`graft_dot` returns NULL,
  * and `WHEN null > 0 … ELSE 0` maps every band to 0), so the fused and
  * composed plans stay row-for-row identical even on malformed input
  * (CodegenSpec pins it). Such vectors collide into bucket 0 of every
  * band; the exact verify stage then drops them (their cosine is NULL in
  * both engines), so they can inflate candidates but never results.
  */
case class LshBands(vector: Expression, planes: Expression,
    bands: Expression, bits: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(vector, planes, bands, bits)

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!arr(vector.dataType) || !arr(planes.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_lsh_bands requires array<double> vector and planes, got " +
          s"(${vector.dataType.sql}, ${planes.dataType.sql})")
    else if (bands.dataType != IntegerType || bits.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("bands/bits must be INT literals")
    else if (!planes.foldable || !bands.foldable || !bits.foldable)
      TypeCheckResult.TypeCheckFailure(
        "planes/bands/bits must be foldable (the plane matrix is per-query, not per-row)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_lsh_bands"

  @transient private lazy val nBands: Int = bands.eval().asInstanceOf[Int]
  @transient private lazy val nBits: Int = bits.eval().asInstanceOf[Int]
  @transient private lazy val flat: Array[Double] = {
    val a = planes.eval().asInstanceOf[ArrayData].toDoubleArray()
    require(nBands > 0 && nBits > 0 && nBits <= 63, s"bad geometry: $nBands x $nBits")
    require(a.length % (nBands * nBits) == 0,
      s"plane matrix length ${a.length} not divisible by bands*bits=${nBands * nBits}")
    a
  }
  @transient private lazy val dim: Int = flat.length / (nBands * nBits)

  override def eval(input: InternalRow): Any = {
    val v = vector.eval(input)
    if (v == null) return new GenericArrayData(new Array[Long](nBands))
    val xs = v.asInstanceOf[ArrayData]
    if (xs.numElements() != dim)
      return new GenericArrayData(new Array[Long](nBands))
    var i = 0
    while (i < dim) {
      if (xs.isNullAt(i)) return new GenericArrayData(new Array[Long](nBands))
      i += 1
    }
    val vec = xs.toDoubleArray()
    new GenericArrayData(LshBands.signature(vec, flat, nBands, nBits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    val vEv = vector.genCode(ctx)
    val xs = ctx.freshName("xs")
    val vec = ctx.freshName("vec")
    val i = ctx.freshName("i")
    val hasNull = ctx.freshName("hasNull")
    ev.copy(code =
      code"""
         |${vEv.code}
         |boolean ${ev.isNull} = false;
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${vEv.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $xs = ${vEv.value};
         |  if ($xs.numElements() == $dim) {
         |    boolean $hasNull = false;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      if ($xs.isNullAt($i)) { $hasNull = true; break; }
         |    }
         |    if (!$hasNull) {
         |      double[] $vec = $xs.toDoubleArray();
         |      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |        graft.functions.expressions.LshBands.signature($vec, $planesRef, $nBands, $nBits));
         |    }
         |  }
         |}
         |if (${ev.value} == null) {
         |  // composed-spelling parity: NULL dot products map every band to 0
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new long[$nBands]);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LshBands =
    copy(vector = newChildren(0), planes = newChildren(1),
      bands = newChildren(2), bits = newChildren(3))
}

object LshBands {
  /** All band values for one vector — shared by interpreted eval and the
    * generated code. Per plane: strict left-to-right `Σ v(i)·plane(i)` in
    * IEEE double (the [[DotProduct]] fold order; sign parity with the
    * oracle). */
  def signature(vec: Array[Double], flat: Array[Double],
      nBands: Int, nBits: Int): Array[Long] = {
    val dim = vec.length
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var bb = 0L
      var j = 0
      while (j < nBits) {
        val base = (b * nBits + j) * dim
        var acc = 0d
        var i = 0
        while (i < dim) {
          acc += vec(i) * flat(base + i)
          i += 1
        }
        if (acc > 0) bb |= 1L << j
        j += 1
      }
      out(b) = bb
      b += 1
    }
    out
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LshBands].getName, "graft_lsh_bands")
}
