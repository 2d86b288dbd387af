package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Double-precision dot product of two float vectors as a native Catalyst
  * expression with code generation — the hot scalar of every similarity
  * operator. A codegen'd while-loop over `ArrayData.getFloat` stays
  * inside whole-stage codegen; the `zip_with`+`aggregate` higher-order
  * formulation is interpreted per element and an order of magnitude
  * slower on all-pairs workloads.
  *
  * Accumulation is in index order with each float widened to double, so
  * results are bit-identical to the higher-order formulation (and to an
  * oracle computing the same left-to-right sum).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  // analysis-time rejection of non-ARRAY<FLOAT> inputs (AbstractDataType /
  // ExpectsInputTypes are private[sql] in Spark 4, so check directly)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT> inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** BIGINT dot product of two quantized long vectors — the integer-exact
  * scalar behind the MMR / kNN-probe family (milli-quantized embeddings,
  * so every comparison both engines make is the same integer). Same
  * story as [[FloatVecDot]]: a codegen'd while-loop over
  * `ArrayData.getLong` stays inside whole-stage codegen, where the
  * `aggregate(zip_with(...))` higher-order formulation allocates an
  * intermediate array and boxes every element per row — measured ~5×
  * slower on the 400k-row probe scan. Integer addition is associative,
  * so unlike the float path there is no accumulation-order caveat:
  * results are exactly the oracle's `list_reduce` sum.
  */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused milli-quantize-and-dot: `Σ floor(a[i]·1000 + 0.5) · b[i]` for a
  * raw ARRAY<FLOAT> left side against an already-quantized ARRAY<BIGINT>
  * right side. This is [[LongVecDot]] with the left side's
  * `transform(v, x -> cast(floor(x*1000 + 0.5) as bigint))` folded into
  * the codegen loop: in the broadcast-scan shape every probe/query scan
  * uses (corpus row × probe row), Catalyst's CollapseProject merges the
  * corpus-side transform into the post-join projection, and the
  * quantized array is then re-allocated PER OUTPUT ROW (|corpus|·|probes|
  * times, interpreted). Fusing it means the scan reads the float column
  * directly and quantizes in two registers — no allocation, no
  * higher-order call. The quantize formula is character-identical to the
  * oracle's (double-widen, ×1000.0, +0.5, floor, bigint cast), so
  * results stay integer-exact.
  */
case class MilliVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_milli"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<BIGINT>) inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(a.getFloat(i).toDouble * 1000.0 + 0.5).toLong *
        b.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) java.lang.Math.floor(
         |          (double) $a.getFloat($i) * 1000.0 + 0.5)
         |        * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All SRP-LSH band values of one quantized vector in ONE fused pass —
  * `planes` (the quantized hyperplane matrix, a plan-time constant)
  * rides the expression as a reference object and every plane's dot
  * runs in a tight two-register loop, emitting ARRAY<BIGINT> of
  * `ceil(|planes| / bandBits)` band values (bit j of band b = sign of
  * plane b·bandBits+j's dot). Replaces the 192-column formulation
  * (one `vec_dot(qf, typedlit(plane)) > 0` CASE per plane), whose
  * generated projection exploded past what whole-stage codegen
  * handles — measured 4.6× slower end-to-end at the x10 soak than
  * this single call. Accumulation is double over ×1024-quantized
  * floats (exact integers ≤ 2^27 with 64-term sums ≪ 2^53), so the
  * sign tests are integer-exact and bit-identical to the DuckDB
  * oracle's BIGINT formulation.
  */
case class SrpBands(child: Expression, planes: Array[Array[Float]],
                    bandBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an ARRAY<FLOAT> input, got ${t.catalogString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    SrpPlanes.compute(v.asInstanceOf[ArrayData], planes, bandBits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpPlanes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SrpPlanes.compute($v, $ref, $bandBits);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SrpPlanes {
  /** see [[SrpBands]] — public static-forwarded so generated code
    * calls it directly. */
  def compute(v: ArrayData, planes: Array[Array[Float]],
              bandBits: Int): ArrayData = {
    val nBands = (planes.length + bandBits - 1) / bandBits
    val out = new Array[Long](nBands)
    var k = 0
    while (k < planes.length) {
      val p = planes(k)
      // fail loudly on a dimension mismatch (ADVICE r12): planes are
      // sampled from the same corpus, so lengths always match — a
      // truncated dot would emit sign bits of a PARTIAL product, i.e.
      // silently wrong LSH bands (missed/spurious candidates)
      val n = v.numElements()
      if (p.length != n) throw new IllegalArgumentException(
        s"srp_bands: embedding dimension $n != hyperplane dimension " +
          s"${p.length} (plane $k) — malformed embedding; planes are " +
          "sampled from the corpus and must match the vector dimension")
      var s = 0.0
      var i = 0
      while (i < n) {
        s += v.getFloat(i).toDouble * p(i).toDouble
        i += 1
      }
      if (s > 0) out(k / bandBits) |= 1L << (k % bandBits)
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorFunctions {
  /** Register `vec_dot` / `vec_dot_long` in the session's function
    * registry so they are usable from `expr(...)` and SQL. Idempotent. */
  def register(spark: SparkSession): Unit = {
    Registry.registerOnce(spark, "vec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)))
    Registry.registerOnce(spark, "vec_dot_long",
      exprs => LongVecDot(exprs(0), exprs(1)))
    Registry.registerOnce(spark, "vec_dot_milli",
      exprs => MilliVecDot(exprs(0), exprs(1)))
  }
}
