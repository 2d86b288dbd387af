package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 63-bit SimHash (Charikar 2002) of a token array as a native Catalyst
  * expression with codegen: per-bit majority vote over the md5 hashes
  * of every token INSTANCE, bit-for-bit identical to the 21-lane SQL
  * aggregation it replaces (`Dedup.simhashSignaturesLanes` — kept and
  * spec-pinned against this) and to the DuckDB oracle's hex-digit
  * arithmetic: bit b of a token's hash is bit (b mod 4) of md5 hex
  * digit b/4.
  *
  * The point at 100 TB: the signature stage becomes a PER-ROW
  * projection — no token explode, no vocabulary broadcast, no 22-lane
  * hash aggregate, ZERO shuffles before the band join. Where the lane
  * design shuffles one 21-long row per document, this shuffles nothing
  * and keeps the whole signature computation inside one
  * whole-stage-codegen span.
  */
case class SimHash63(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash63"

  override protected def nullSafeEval(input: Any): Any =
    SimHash63.compute(input.asInstanceOf[ArrayData])

  // analysis-time rejection of a non-ARRAY<STRING> child (AbstractDataType /
  // ExpectsInputTypes are private[sql] in Spark 4, so check directly)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // MODULE$ is a static field of the companion CLASS `SimHash63$` —
    // the raw getClass name, `$` included, is the one Janino must see.
    val helper = SimHash63.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): SimHash63 =
    copy(child = c)
}

object SimHash63 {
  private val mdPool =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Majority-vote 63-bit signature over the md5 of each element. */
  def compute(arr: ArrayData): Long = {
    val md = mdPool.get()
    val counts = new Array[Int](63)
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      val w = arr.getUTF8String(i)
      if (w != null) {
        md.reset()
        val d = md.digest(w.getBytes)
        var b = 0
        while (b < 63) {
          val p = b >> 2 // hex digit index of bit b
          val byte0 = d(p >> 1)
          val digit =
            if ((p & 1) == 0) (byte0 >> 4) & 0xf else byte0 & 0xf
          if (((digit >> (b & 3)) & 1) == 1) counts(b) += 1
          b += 1
        }
        n += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 63) {
      if (2 * counts(b) > n) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Register `simhash63` for use from expr()/SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "simhash63", exprs => SimHash63(exprs.head))
}
