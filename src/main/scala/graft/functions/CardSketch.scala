package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HLL-style cardinality sketch as a custom Catalyst
  * `TypedImperativeAggregate`: a 64-register byte buffer updated in a
  * single pass (bucket = top 6 bits of a 60-bit md5 prefix, register =
  * max leading-zero rank of the remaining 54 bits), merged by
  * element-wise max — the sketch property that makes distinct-counting
  * a one-pass, fixed-memory, shuffle-light aggregate at 100 TB
  * (registers travel between executors, never values).
  *
  * Deterministic by construction (md5), so the register table is
  * integer-exact and oracle-checkable; the cardinality estimate is
  * derived downstream (see SketchSpec) rather than baked into eval —
  * emitting the registers keeps the operator's contract exact.
  */
case class CardSketch(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val M = 64 // registers
  private val TAIL_BITS = 54

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  // one digest per task (deserialized expression copy); reset per row —
  // building a hex string and re-parsing it per input row costs more
  // than the whole register update
  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      md.reset()
      val d = md.digest(v.toString.getBytes("UTF-8"))
      // value of the first 15 hex digits == top 60 bits of the first
      // 8 bytes (big-endian >>> 4) — identical to the SQL oracle's
      // hex-digit sum
      val h64 =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val h60 = h64 >>> 4
      val b = (h60 >>> TAIL_BITS).toInt
      val tail = h60 & ((1L << TAIL_BITS) - 1)
      val rho =
        if (tail == 0L) TAIL_BITS + 1
        else java.lang.Long.numberOfLeadingZeros(tail) - (64 - TAIL_BITS) + 1
      if (rho > buf(b)) buf(b) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    UTF8String.fromString(buf.map(_.toInt).mkString(","))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "card_sketch"

  override def withNewMutableAggBufferOffset(o: Int): CardSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CardSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CardSketch =
    copy(child = c)
}

object CardSketch {
  /** Register `card_sketch` for use from expr()/SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "card_sketch",
      exprs => CardSketch(exprs.head).toAggregateExpression())

  /** Estimate cardinality from the register string (standard HLL
    * harmonic-mean with small-range correction). Driver/spec-side. */
  def estimate(registers: String): Double = {
    val rs = registers.split(",").map(_.toInt)
    val m = rs.length.toDouble
    val alpha = 0.709 // alpha_64
    val z = rs.map(r => math.pow(2.0, -r)).sum
    val raw = alpha * m * m / z
    val zeros = rs.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }
}
