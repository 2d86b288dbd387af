package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, DateType, DecimalType,
  DoubleType, FloatType, IntegerType, LongType, ShortType, StringType}

/** Public library facade for one-pass column profiling over ARBITRARY
  * caller DataFrames, delegating to the aggregate-then-reshape path
  * behind the oracle-checked `dq_profile` query.
  */
object Profiles {

  /** (tbl, column_name, n_rows, n_null, n_distinct, min_val, max_val,
    * sum_len) — one row per profiled column, all columns measured in
    * ONE aggregation pass over one scan. Values profile through an
    * engine-portable string rendering: integers / strings / dates
    * verbatim, floating point through the toward-zero BIGINT cast
    * (the library's documented cross-engine double contract), so
    * extremes and payload lengths never depend on float formatting.
    * `cols` defaults to every column of a supported type. */
  def profile(df: DataFrame, table: String = "df",
              cols: Seq[String] = Seq.empty): DataFrame = {
    val chosen = if (cols.nonEmpty) cols
      else df.schema.fields.filter(f => rendering(f.name, f.dataType)
        .isDefined).map(_.name).toSeq
    val rendered = chosen.map { c =>
      val dt = df.schema(c).dataType
      c -> rendering(c, dt).getOrElse(
        throw new IllegalArgumentException(
          s"unsupported type $dt for column $c"))
    }
    graft.operators.DataQuality.profileOf(df, table, rendered)
  }

  private def rendering(name: String,
                        dt: org.apache.spark.sql.types.DataType)
      : Option[String] = dt match {
    case StringType => Some(s"`$name`")
    case ByteType | ShortType | IntegerType | LongType | DateType |
         _: DecimalType => Some(s"cast(`$name` as string)")
    case DoubleType | FloatType =>
      Some(s"cast(cast(`$name` as bigint) as string)")
    case _ => None
  }
}
