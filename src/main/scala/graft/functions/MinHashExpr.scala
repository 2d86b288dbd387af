package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K=9 MinHash signature of a token array as a native Catalyst
  * expression with codegen: distinct word-3-gram shingles, and per
  * hash function i the lexicographic minimum of md5("i|" + shingle)
  * hex — exactly the signature `Dedup.minhashesDict` computes through
  * explode → distinct → dictionary join → group-min (kept and
  * spec-pinned bit-for-bit against this).
  *
  * The trade at 100 TB: the dictionary path hashes each DISTINCT
  * corpus shingle once but pays three shuffles (shingle distinct,
  * dictionary join, per-doc group-min); this expression recomputes
  * md5 per shingle INSTANCE but turns the whole signature stage into
  * a ZERO-SHUFFLE per-row projection. md5 is ~100 ns; a shuffled row
  * is microseconds of serialize/spill/network — instance-level
  * recompute wins unless the corpus is overwhelmingly repetitive,
  * and the banded join downstream is unchanged either way.
  *
  * Returns NULL for docs with fewer than 3 words (no shingles), the
  * same rows the dictionary path drops via its inner join.
  */
case class MinHash9(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash9"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHash9.compute(input.asInstanceOf[ArrayData])

  // analysis-time rejection of a non-ARRAY<STRING> child (AbstractDataType /
  // ExpectsInputTypes are private[sql] in Spark 4, so check directly)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // MODULE$ is a static field of the companion CLASS `MinHash9$` —
    // the raw getClass name, `$` included, is the one Janino must see.
    val helper = MinHash9.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $helper.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(c: Expression): MinHash9 =
    copy(child = c)
}

/** K=16 sibling of [[MinHash9]] — same shingles, same seed scheme
  * (hash i seeds md5 with "i|"), seven more hash functions: a wider
  * signature admits the divisor bandings 16×1 / 8×2 / 4×4 / 2×8 /
  * 1×16, whose S-curve midpoints give the high-precision chooser
  * (api.Corpus.lshBandingFor(target, k = 16)) a sharper menu near 1.0
  * than K=9's 9/3/1. The first 9 hashes are BY CONSTRUCTION identical
  * to minhash9's (DedupSpec pins it), so the K=9 production plan and
  * its artifacts are untouched. */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash16"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHash9.computeK(input.asInstanceOf[ArrayData], 16)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val helper = MinHash9.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $helper.computeK($c, 16);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(c: Expression): MinHash16 =
    copy(child = c)
}

object MinHash16 {
  /** Register `minhash16` for use from expr()/SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "minhash16",
      exprs => MinHash16(exprs.head))
}

object MinHash9 {
  private val HEX = "0123456789abcdef".toCharArray

  private val mdPool =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** null when the array has fewer than 3 elements (no 3-gram). */
  def compute(arr: ArrayData): ArrayData = computeK(arr, 9)

  /** Width-parameterized body — hash k of any width uses the same
    * "(k+1)|shingle" md5 seed, so a narrower signature is always a
    * PREFIX of a wider one over the same doc. */
  def computeK(arr: ArrayData, width: Int): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return null
    val words = new Array[String](n)
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      words(i) = if (w == null) "" else w.toString
      i += 1
    }
    val seen = new java.util.HashSet[String]()
    val mins = new Array[String](width)
    val md = mdPool.get()
    i = 0
    while (i <= n - 3) {
      val g = words(i) + " " + words(i + 1) + " " + words(i + 2)
      if (seen.add(g)) {
        var k = 0
        while (k < width) {
          md.reset()
          val d = md.digest(((k + 1) + "|" + g).getBytes("UTF-8"))
          val hex = new Array[Char](32)
          var j = 0
          while (j < 16) {
            hex(2 * j) = HEX((d(j) >> 4) & 0xf)
            hex(2 * j + 1) = HEX(d(j) & 0xf)
            j += 1
          }
          val h = new String(hex)
          if (mins(k) == null || h.compareTo(mins(k)) < 0) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }

  /** Register `minhash9` for use from expr()/SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "minhash9", exprs => MinHash9(exprs.head))
}
