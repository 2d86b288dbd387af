package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bloom-filter semi-join reduction, the runtime-filter technique the
  * reference's warehouse applies implicitly and Spark exposes via AQE's
  * `runtime.bloomFilter` rule — here as an EXPLICIT operator pair so a
  * pipeline can build the filter once and reuse it across queries:
  *
  *   - `bloom_agg(key)`: one-pass `TypedImperativeAggregate` building a
  *     fixed-size bitset over the (filtered) dimension keys. Partial
  *     buffers are OR-merged, so the full dimension never gathers on
  *     one node — only 32 KiB bitsets travel.
  *   - `bloom_contains(key, bits)`: codegen'd membership probe applied
  *     to the fact side BEFORE its shuffle. No false negatives by
  *     construction, so the downstream exact join sees every matching
  *     row and the operator is transparent to results (the oracle is
  *     the plain join); false positives only cost wasted shuffle.
  *
  * At 100 TB the win is the shuffle: a selective dimension predicate
  * prunes the fact table map-side to ~(matches + fpp·n) rows instead of
  * shuffling all n. Size `mBits` from a cardinality estimate (the
  * `card_sketch` aggregate): k=5 hashes wants ≥ 8 bits/key for ~2% fpp;
  * the 2^18 default holds ~32k keys at that rate.
  *
  * Hashing is splitmix64 double-hashing (h1 + i·h2, public-domain
  * finalizer from Steele et al., "Fast splittable pseudorandom number
  * generators", OOPSLA'14) — engine-internal only; nothing about the
  * filter leaks into results, so cross-engine hash agreement is not
  * required (unlike the signature sketches).
  */
case class BloomAgg(child: Expression,
                    mBits: Int = BloomAgg.DEFAULT_M_BITS,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require((mBits & (mBits - 1)) == 0 && mBits >= 64,
    s"mBits must be a power of two >= 64, got $mBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key (TINYINT..BIGINT), got " +
        t.catalogString)
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Number].longValue()
      val h1 = BloomAgg.mix(key)
      val h2 = BloomAgg.mix(key ^ BloomAgg.GOLDEN) | 1L
      var i = 0
      while (i < BloomAgg.K) {
        val bit = ((h1 + i * h2) & (mBits - 1)).toInt
        buf(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
}

object BloomAgg {
  val DEFAULT_M_BITS: Int = 1 << 18 // 32 KiB
  val K: Int = 5                    // probes per key
  val GOLDEN: Long = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer — the public-domain 64-bit mixer. */
  def mix(z0: Long): Long = {
    var z = z0 + GOLDEN
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def register(spark: SparkSession): Unit = {
    Registry.registerOnce(spark, "bloom_agg",
      exprs => BloomAgg(exprs.head).toAggregateExpression())
    Registry.registerOnce(spark, "bloom_contains",
      exprs => BloomMightContain(exprs(0), exprs(1)))
  }
}

/** Membership probe against a `bloom_agg` bitset (an ARRAY<BIGINT>
  * column, usually a single broadcast row cross-joined onto the fact
  * side). Same splitmix64 double-hash as the build; the bitset length
  * must be the power of two the aggregate produced. Fully codegen'd —
  * the probe sits in the fact scan's projection stage, inside
  * whole-stage codegen, upstream of the shuffle it exists to shrink.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult = {
    val keyOk = left.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val bitsOk = right.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (keyOk && bitsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (integral key, ARRAY<BIGINT> bitset), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val key = l.asInstanceOf[Number].longValue()
    val bits = r.asInstanceOf[ArrayData]
    val mBits = bits.numElements() << 6
    val h1 = BloomAgg.mix(key)
    val h2 = BloomAgg.mix(key ^ BloomAgg.GOLDEN) | 1L
    var i = 0
    while (i < BloomAgg.K) {
      val bit = ((h1 + i * h2) & (mBits - 1)).toInt
      if ((bits.getLong(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, b) => {
      val z = ctx.freshName("z")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val bit = ctx.freshName("bit")
      // inline splitmix64 twice (no companion-object call: generated
      // Java referencing Scala companions is the MODULE$ trap the
      // round-4 signature expressions fell into)
      def mixSteps(v: String): String =
        s"""$z = $v + ${BloomAgg.GOLDEN}L;
           |$z = ($z ^ ($z >>> 30)) * ${0xBF58476D1CE4E5B9L}L;
           |$z = ($z ^ ($z >>> 27)) * ${0x94D049BB133111EBL}L;
           |$z = $z ^ ($z >>> 31);""".stripMargin
      s"""
         |long $z;
         |${mixSteps(s"(long) $k")}
         |long $h1 = $z;
         |${mixSteps(s"(((long) $k) ^ ${BloomAgg.GOLDEN}L)")}
         |long $h2 = $z | 1L;
         |long $m = ((long) $b.numElements()) << 6;
         |${ev.value} = true;
         |for (int $i = 0; $i < ${BloomAgg.K}; $i++) {
         |  int $bit = (int) (($h1 + $i * $h2) & ($m - 1L));
         |  if (($b.getLong($bit >>> 6) & (1L << ($bit & 63))) == 0L) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
