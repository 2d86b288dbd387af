package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable log-scale quantile histogram as a custom Catalyst
  * `TypedImperativeAggregate` (the third custom aggregate next to
  * [[CardSketch]] and [[FreqSketch]]): 64 power-of-two buckets over a
  * positive BIGINT measure — bucket = bit length of the value — counted
  * in one pass and merged by element-wise add. Any quantile is then
  * within one bucket of exact, i.e. the estimate's lower bound is
  * ≤ the true quantile < 2× the lower bound — a fixed 512-byte state
  * that survives partial aggregation, so at 100 TB quantile estimation
  * shuffles 64 longs per group instead of sorting the measure column
  * (what exact `percentile` must do).
  *
  * Deterministic by construction (integer bit length), so the bucket
  * table AND the derived bounds are integer-exact and oracle-checkable
  * — no estimate drift in the comparison, unlike sampling sketches.
  */
case class QuantileSketch(child: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val B = 64

  // analysis-time rejection of non-integral measures: update() reads the
  // value as java.lang.Number, which DECIMAL (Spark's Decimal) and STRING
  // are not — without this a misuse is a runtime ClassCastException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral measure (TINYINT..BIGINT), " +
        s"got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](B)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Number].longValue()
      // bit length of x (0 for x <= 0 — measure columns are positive;
      // a zero/negative lands in bucket 0 rather than throwing)
      val idx =
        if (x <= 0L) 0
        else math.min(64 - java.lang.Long.numberOfLeadingZeros(x) - 1, B - 1)
      buf(idx) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < B) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    UTF8String.fromString(buf.mkString(","))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(B * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(B)(bb.getLong())
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sketch"

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileSketch =
    copy(child = c)
}

object QuantileSketch {
  /** Register `quantile_sketch` for use from expr()/SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "quantile_sketch",
      exprs => QuantileSketch(exprs.head).toAggregateExpression())
}
