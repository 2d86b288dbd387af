package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd Catalyst expression —
  * the edit-similarity measure record-linkage systems favor for person
  * and product names (short strings, typo-dominated noise, prefix
  * agreement worth more than suffix agreement).
  *
  * Semantics are the textbook Winkler variant, matching DuckDB's
  * `jaro_winkler_similarity` bit-for-bit (probed empirically, see
  * FuzzyJoinSpec): match window `max(|a|,|b|)/2 - 1`, transpositions
  * counted over matched sequences and halved by integer division,
  * `jaro = (m/|a| + m/|b| + (m-t)/m) / 3`, and the prefix boost
  * `jaro + L * 0.1 * (1 - jaro)` applied only when `jaro > 0.7`, with
  * L the common prefix length capped at 4. Either side empty → 0.0
  * (DuckDB's convention, not RapidFuzz's both-empty→1).
  *
  * Engine-side value: Spark ships `levenshtein` but no Jaro family, so
  * without this a blocked ER scorer falls back to a Scala UDF — which
  * breaks whole-stage codegen around the similarity filter. This
  * expression stays inside the codegen span (scratch arrays allocated
  * per call; strings here are names, tens of bytes — allocation is
  * nanoseconds against the O(|a|·|b|)-window scan).
  *
  * Reference tie-in: generalizes the reference's fuzzy customer
  * standardization motif (`code/curate/02_customer_sp.sql` cleans name
  * variants deterministically; a real linkage pass scores them) —
  * same family as `dd_fuzzy_levenshtein`/`er_blocked_match`.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, STRING), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.compute(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val helper = JaroWinklerSim.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = $helper.compute($a.toString(), $b.toString());""")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaroWinklerSim = copy(left = l, right = r)
}

object JaroWinklerSim {

  /** Textbook Jaro-Winkler; arithmetic order mirrors DuckDB so results
    * agree to the last ulp (oracle compares raw doubles).
    */
  def compute(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var halfT = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val t = halfT / 2
    val md = m.toDouble
    val jaro = (md / len1 + md / len2 + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val cap = math.min(4, math.min(len1, len2))
    while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Register `jaro_winkler` for expr()/SQL use. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "jaro_winkler",
      exprs => JaroWinklerSim(exprs(0), exprs(1)))
}
