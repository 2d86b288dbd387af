package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Morton (Z-order) code of two dimension keys as a native Catalyst
  * expression with code generation: the low 16 bits of each input are
  * bit-interleaved (x in even positions, y in odd) into a 32-bit curve
  * position. Sorting or range-partitioning a table by this code
  * co-locates rows that are close in BOTH dimensions, so parquet
  * row-group min/max stats prune 2-D box predicates — the multi-column
  * data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER) that single-key
  * clustering cannot give. At 100 TB the code is computed once at write
  * time; reads pay nothing.
  *
  * The interleave is the standard closed-form magic-mask spreading
  * (Hacker's Delight §7-2, public), branch-free in generated code — no
  * loop, five mask-shift steps per dimension.
  */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "morton"

  // analysis-time rejection of non-integral keys (AbstractDataType /
  // ExpectsInputTypes are private[sql] in Spark 4, so check directly);
  // the generated code casts straight to long, which DECIMAL/STRING
  // children would break at runtime
  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integral(left.dataType) && integral(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two integral keys (TINYINT..BIGINT), got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  private def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[Number].longValue()
    val y = r.asInstanceOf[Number].longValue()
    spread(x) | (spread(y) << 1)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def steps(v: String): String =
        s"""$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |long $x = ((long) $a) & 0xFFFFL;
         |long $y = ((long) $b) & 0xFFFFL;
         |${steps(x)}
         |${steps(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonCode {
  /** Register `morton` in the session's function registry so it is
    * usable from `expr("morton(a, b)")` and SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "morton",
      exprs => MortonCode(exprs(0), exprs(1)))
}
