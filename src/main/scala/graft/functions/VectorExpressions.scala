package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native vector math for the embedding operators (build brief E2).
  *
  * Why Expressions and not the `aggregate`/`zip_with` higher-order
  * functions the first implementation used: Catalyst HOFs are
  * CodegenFallback — every row leaves WholeStageCodegen, allocates a
  * lambda frame per element, and boxes the accumulator. On a 64-dim
  * corpus that is 64 boxed iterations per row per plane; brute-force
  * kNN at corpus scale pays it per PAIR. These expressions generate a
  * tight primitive loop over the underlying `ArrayData` instead, and
  * read `array<float>` directly (each element widened to double exactly
  * like the old `transform(_.cast("double"))` — which was itself an
  * interpreted HOF — so results are bit-identical and the oracle SQL is
  * unchanged).
  *
  * Null semantics match the HOF composition they replace: null array →
  * null; any null element → null; length mismatch (dot) → null, where
  * `zip_with` would have produced a null-padded product.
  */
object VectorExpressions {

  private[functions] def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Element accessor expression for generated code, widened to double. */
  private[functions] def genGet(arr: String, dt: DataType, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }

  private[functions] def evalGet(arr: ArrayData, dt: DataType, i: Int): Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }

  private[functions] def containsNull(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].containsNull
}

/** `vec_dot(a, b)` — Σ aᵢ·bᵢ over two float/double arrays. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += evalGet(x, left.dataType, i) * evalGet(y, right.dataType, i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val nullCheck =
        if (containsNull(left.dataType) || containsNull(right.dataType))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $sum += ${genGet(a, left.dataType, i)} * ${genGet(b, right.dataType, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `vec_norm(a)` — √(Σ aᵢ²) over a float/double array. */
case class VecNorm(child: Expression) extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm"

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = evalGet(x, child.dataType, i)
      sum += v * v
      i += 1
    }
    math.sqrt(sum)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val v = ctx.freshName("v")
      val nullCheck =
        if (containsNull(child.dataType))
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  final double $v = ${genGet(a, child.dataType, i)};
         |  $sum += $v * $v;
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($sum);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sq8_adc(codes)` — the SQ8 reconstruction dot
  * Σ_d q_d · (mn_d + code_d · step_d) over an `array<long|int>` code
  * row, with the query / per-dim affine params bound as driver-side
  * constants (they are literals of the probe, not data).
  *
  * Why an Expression and not the unrolled literal fold the first probe
  * used: at dim 64 the fold is ~260 Catalyst nodes PER ROW-EXPRESSION —
  * the generated method blows past JIT-friendly size (measured 9× slower
  * than the brute scan it is supposed to beat at 1M vectors). This is
  * the same tight primitive loop as [[VecDot]], with term order and
  * grouping IEEE-identical to the fold (and to the DuckDB oracle's
  * `list_reduce(list(t ORDER BY i))`): acc += q[d]*(mn[d]+(double)c[d]*st[d])
  * in dim order, so `sq8_topk`'s oracle hash is unchanged.
  *
  * Null semantics: null array → null; any null element → null; length
  * mismatch vs the bound params → null.
  *
  * The params are `Seq[Double]` (not arrays) so the case-class
  * equals/hashCode compare CONTENTS: two probes binding the same
  * query/codebook canonicalize equal, keeping Catalyst subexpression
  * elimination and exchange/plan reuse live (an `Array` field compares
  * by reference and silently defeats both). eval/codegen read the
  * lazily-materialized primitive arrays — no per-row boxing.
  */
case class Sq8Adc(child: Expression, q: Seq[Double], mn: Seq[Double],
    st: Seq[Double]) extends UnaryExpression {
  import VectorExpressions._

  require(q.length == mn.length && q.length == st.length,
    s"param arrays disagree: q=${q.length} mn=${mn.length} st=${st.length}")

  @transient private lazy val qArr: Array[Double] = q.toArray
  @transient private lazy val mnArr: Array[Double] = mn.toArray
  @transient private lazy val stArr: Array[Double] = st.toArray

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_adc"

  private def codeElemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (codeElemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<long|int> argument, got " +
        child.dataType.catalogString)

  private def codeGet(arr: ArrayData, i: Int): Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case IntegerType => arr.getInt(i).toDouble
      case _           => arr.getLong(i).toDouble
    }

  private def genCodeGet(arr: String, i: String): String =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case IntegerType => s"(double) $arr.getInt($i)"
      case _           => s"(double) $arr.getLong($i)"
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != qArr.length) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      sum += qArr(i) * (mnArr(i) + codeGet(x, i) * stArr(i))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val qRef = ctx.addReferenceObj("sq8q", qArr, "double[]")
      val mnRef = ctx.addReferenceObj("sq8mn", mnArr, "double[]")
      val stRef = ctx.addReferenceObj("sq8st", stArr, "double[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val nullCheck =
        if (containsNull(child.dataType))
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $qRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $sum += $qRef[$i] * ($mnRef[$i] + ${genCodeGet(a, i)} * $stRef[$i]);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sq8_pack(codes)` — an `array<long|int>` of 8-bit code values
  * (pre-clamped to [0, 255] by the encoder) packed into BINARY, one
  * byte per dimension. THE load-bearing layout decision of the SQ8
  * rung at real-embedding geometry: stored as `array<long>`, a dim-768
  * code row decodes to 8 B/dim in memory — the SAME traffic as the raw
  * doubles it was supposed to undercut, and the dense 1M×768 ladder
  * measured the "compressed" first pass SLOWER than brute. One byte
  * per dim on disk AND in memory restores the 8× the rung is sold on.
  * Null semantics: null array → null; null element → null.
  */
case class Sq8Pack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_pack"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) | ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<long|int> argument, got " +
        child.dataType.catalogString)

  private def isInt: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (isInt) x.getInt(i).toLong else x.getLong(i)
      out(i) = (v & 0xFFL).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val get = if (isInt) s"$a.getInt($i)" else s"$a.getLong($i)"
      val nullCheck =
        if (VectorExpressions.containsNull(child.dataType))
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |final byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $out[$i] = (byte) ($get & 0xFFL);
         |}
         |if (!${ev.isNull}) ${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[Sq8Adc]] over BINARY-packed codes ([[Sq8Pack]] layout): the same
  * fused reconstruction dot — acc += q[d]·(mn[d] + byte[d]·st[d]) in
  * dim order, bytes read UNSIGNED — so probe scores over the packed
  * layout are bit-identical to the array form's (and to the oracle's
  * ordered fold, whose code VALUES are unchanged by packing).
  */
case class Sq8AdcBytes(child: Expression, q: Seq[Double], mn: Seq[Double],
    st: Seq[Double]) extends UnaryExpression {

  require(q.length == mn.length && q.length == st.length,
    s"param arrays disagree: q=${q.length} mn=${mn.length} st=${st.length}")

  @transient private lazy val qArr: Array[Double] = q.toArray
  @transient private lazy val mnArr: Array[Double] = mn.toArray
  @transient private lazy val stArr: Array[Double] = st.toArray

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_adc_bytes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    if (x.length != qArr.length) return null
    var sum = 0.0
    var i = 0
    while (i < x.length) {
      sum += qArr(i) * (mnArr(i) + (x(i) & 0xFF).toDouble * stArr(i))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val qRef = ctx.addReferenceObj("sq8q", qArr, "double[]")
      val mnRef = ctx.addReferenceObj("sq8mn", mnArr, "double[]")
      val stRef = ctx.addReferenceObj("sq8st", stArr, "double[]")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.length != $qRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $sum += $qRef[$i] * ($mnRef[$i] + (double) ($a[$i] & 0xFF) * $stRef[$i]);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The BATCH twin of [[Sq8AdcBytes]]: the query vector is a PER-ROW
  * `array<float|double>` column (a batch has no driver-literal query),
  * the affine params stay bound. Identical IEEE sequence — compute
  * mn + byte·st, multiply by q_d, accumulate in dim order — so batch
  * probes ≡ loops of single probes bit-for-bit.
  */
case class Sq8AdcVec(left: Expression, right: Expression, mn: Seq[Double],
    st: Seq[Double]) extends BinaryExpression {
  import VectorExpressions._

  require(mn.length == st.length,
    s"param arrays disagree: mn=${mn.length} st=${st.length}")

  @transient private lazy val mnArr: Array[Double] = mn.toArray
  @transient private lazy val stArr: Array[Double] = st.toArray

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_adc_vec"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.BinaryType &&
        elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, array<float|double>) arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[ArrayData]
    if (x.length != mnArr.length || y.numElements() != x.length) return null
    var sum = 0.0
    var i = 0
    while (i < x.length) {
      if (y.isNullAt(i)) return null
      sum += evalGet(y, right.dataType, i) *
        (mnArr(i) + (x(i) & 0xFF).toDouble * stArr(i))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mnRef = ctx.addReferenceObj("sq8mn", mnArr, "double[]")
      val stRef = ctx.addReferenceObj("sq8st", stArr, "double[]")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val nullCheck =
        if (containsNull(right.dataType))
          s"if ($b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.length != $mnRef.length || $b.numElements() != $a.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $nullCheck
         |    $sum += ${genGet(b, right.dataType, i)} * ($mnRef[$i] + (double) ($a[$i] & 0xFF) * $stRef[$i]);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `count_less(arr, v)` — the number of elements of `arr` strictly
  * below `v`: the chunk-assignment primitive of
  * [[graft.ext.TextStats.percentileGate]]'s two-phase prefix sum
  * (count of learned boundaries below a histogram value — monotone in
  * `v`, so chunks are value-contiguous). The equivalent
  * `aggregate(arr, 0, (acc, b) -> acc + if(v > b, 1, 0))` HOF is
  * CodegenFallback (see the file header) and linear-interpreted: at
  * C=256 boundaries × 10⁷ histogram rows it dominated the gate's
  * wall clock. This is a tight primitive loop inside
  * WholeStageCodegen. Null semantics: null array or null value → null;
  * a null ELEMENT → null (matching the HOF, whose null accumulator
  * poisons the fold).
  */
case class CountLess(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "count_less"

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, double), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[Double]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      if (evalGet(arr, left.dataType, i) < v) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val nullCheck =
        if (containsNull(left.dataType))
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |final int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  if (${genGet(a, left.dataType, i)} < $b) $c++;
         |}
         |if (!${ev.isNull}) ${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `rotate_vec(v)` — the learned OPQ rotation applied in-plan:
  * out[i] = floor((Σⱼ R[i][j]·v[j]) · 1e9 + 0.5) / 1e9, the exact
  * arithmetic of the previous literal form (a [[VecDot]] against a
  * literal row per output coordinate, `pround`ed at 1e-9 — sequential
  * j-ascending fold, same IEEE op order), so results are bit-identical
  * and the rotation-literal oracle SQL is unchanged.
  *
  * Why an Expression and not `array(d × pround(dot(v, lit-row)))`: at
  * d=768 the literal form embeds d² = 589,824 literal nodes in the
  * expression tree — measured 145 MB serialized task binaries PER
  * k-means iteration of the OPQ learn (the whole plan re-ships every
  * job), falling out of JIT the same way the unrolled SQ8 fold did.
  * Here the matrix rides ONCE as a codegen reference object (4.7 MB of
  * primitive doubles) and the rotate is a tight d² loop inside
  * WholeStageCodegen.
  *
  * Null semantics: null input array, a null element, or a length
  * mismatch against d → null OUTPUT ARRAY (the literal form produced a
  * d-array of null components in those cases; no learner accepts
  * either, and real corpora hit neither — the hash-gated fixtures are
  * null-free and exact-dimension).
  */
case class RotateVec(child: Expression, r: Seq[Seq[Double]])
    extends UnaryExpression {
  import VectorExpressions._

  require(r.nonEmpty && r.forall(_.size == r.size),
    s"rotation must be square, got ${r.size} rows of ${r.headOption.map(_.size)}")

  @transient private lazy val d: Int = r.size
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { a(i * d + j) = r(i)(j); j += 1 }
      i += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rotate_vec"

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> argument, got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != d) return null
    val v = new Array[Double](d)
    var j = 0
    while (j < d) {
      if (x.isNullAt(j)) return null
      v(j) = evalGet(x, child.dataType, j)
      j += 1
    }
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      j = 0
      while (j < d) { s += v(j) * flat(i * d + j); j += 1 }
      out(i) = math.floor(s * 1e9 + 0.5) / 1e9
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val rRef = ctx.addReferenceObj("rotmat", flat, "double[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("d")
      val nullCheck =
        if (containsNull(child.dataType))
          s"if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $dd = $d;
         |if ($a.numElements() != $dd) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $v = new double[$dd];
         |  for (int $j = 0; $j < $dd; $j++) {
         |    $nullCheck
         |    $v[$j] = ${genGet(a, child.dataType, j)};
         |  }
         |  if (!${ev.isNull}) {
         |    double[] $out = new double[$dd];
         |    for (int $i = 0; $i < $dd; $i++) {
         |      double $s = 0.0;
         |      for (int $j = 0; $j < $dd; $j++) {
         |        $s += $v[$j] * $rRef[$i * $dd + $j];
         |      }
         |      $out[$i] = Math.floor($s * 1e9 + 0.5) / 1e9;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
