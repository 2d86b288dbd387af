package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary (Metwally et al. 2005) as a custom
  * Catalyst `TypedImperativeAggregate`: a bounded map of
  * item → (count, overestimation error). When full, the minimum-count
  * item is evicted and the newcomer inherits its count as error — the
  * classic guarantees hold after any merge order:
  *
  *   - `count` never underestimates the true frequency;
  *   - `count − err` never overestimates it;
  *   - every item with true frequency > N/capacity is in the summary.
  *
  * Merging uses the conservative offset rule: an item absent from the
  * other summary gains that summary's minimum count (0 if it never
  * evicted), then the union is re-truncated to capacity. While NO
  * buffer ever evicts — capacity ≥ distinct items, the corpus
  * token-stats case this ships for — every count is exact, every error
  * is 0 and the result is deterministic, which is what lets the DuckDB
  * oracle pair the summary against plain GROUP BY counts. At 100 TB the
  * summary is fixed-memory and shuffle-light: capacity entries travel
  * between executors, never the token stream.
  */
case class FreqSketch(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch.Buffer]
    with UnaryLike[Expression] {

  require(capacity > 0, "freq_sketch capacity must be positive")

  override def createAggregationBuffer(): FreqSketch.Buffer =
    new FreqSketch.Buffer(mutable.HashMap.empty, evicted = false)

  override def update(buf: FreqSketch.Buffer,
                      input: InternalRow): FreqSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      buf.counts.get(s) match {
        case Some((c, e)) => buf.counts(s) = (c + 1, e)
        case None if buf.counts.size < capacity => buf.counts(s) = (1L, 0L)
        case None =>
          // evict the minimum-count item (ties by key for determinism)
          val (mk, (mc, _)) = buf.counts.minBy { case (k, (c, _)) => (c, k) }
          buf.counts.remove(mk)
          buf.counts(s) = (mc + 1, mc)
          buf.evicted = true
      }
    }
    buf
  }

  override def merge(b1: FreqSketch.Buffer,
                     b2: FreqSketch.Buffer): FreqSketch.Buffer = {
    val m1 = if (b1.evicted) b1.counts.values.map(_._1).min else 0L
    val m2 = if (b2.evicted) b2.counts.values.map(_._1).min else 0L
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (b1.counts.keySet ++ b2.counts.keySet).foreach { k =>
      val (c1, e1) = b1.counts.getOrElse(k, (m1, m1))
      val (c2, e2) = b2.counts.getOrElse(k, (m2, m2))
      merged(k) = (c1 + c2, e1 + e2)
    }
    var evicted = b1.evicted || b2.evicted
    val kept =
      if (merged.size <= capacity) merged
      else {
        evicted = true
        val top = merged.toSeq
          .sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
        mutable.HashMap(top: _*)
      }
    new FreqSketch.Buffer(kept, evicted)
  }

  /** Deterministic string form: `item:count:err` entries sorted by
    * count desc then item. */
  override def eval(buf: FreqSketch.Buffer): Any =
    UTF8String.fromString(
      buf.counts.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
        .map { case (k, (c, e)) => s"$k:$c:$e" }.mkString(";"))

  override def serialize(buf: FreqSketch.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(buf.evicted)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, (c, e)) =>
      out.writeUTF(k); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch.Buffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val evicted = in.readBoolean()
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ =>
      val k = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      m(k) = (c, e)
    }
    new FreqSketch.Buffer(m, evicted)
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def withNewMutableAggBufferOffset(o: Int): FreqSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqSketch =
    copy(child = c)
}

object FreqSketch {
  final class Buffer(val counts: mutable.HashMap[String, (Long, Long)],
                     var evicted: Boolean)

  /** Register `freq_sketch(col, capacity)` for expr()/SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "freq_sketch",
      exprs => {
        val cap = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval().toString.toInt
        }
        FreqSketch(exprs.head, cap).toAggregateExpression()
      })
}
