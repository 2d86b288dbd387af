package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact J ≥ 1/2 verification of two SORTED BIGINT shingle-id sets as
  * one native expression — the verify stage of the prefix-filter
  * n-gram Jaccard join (`dd_ngram_jaccard`), replacing
  * `array_intersect` + `size` + a threshold filter. Three phases, each
  * sound (never prunes a qualifying pair), each strictly cheaper than
  * the one it guards:
  *
  *  1. LENGTH: `min(na, nb) < ⌈(na+nb)/3⌉` (3·|∩| ≥ na+nb is J ≥ 1/2)
  *     can never qualify — O(1).
  *  2. SUFFIX FILTER (PPJoin+ — Xiao et al., WWW'08, public): a
  *     depth-limited recursive partition of both sets around the left
  *     set's median with a binary-search split of the right set; the
  *     per-segment `min(|Aᵢ|, |Bᵢ|)` sums to an upper bound on |∩|
  *     (segments are VALUE-aligned, so the bound is exact per
  *     partition level). Bound < need ⇒ prune, O(2^d · log n).
  *  3. EARLY-EXIT MERGE: one linear merge of the two sorted arrays
  *     computing the EXACT intersection, aborting the moment
  *     `inter + min(remaining_a, remaining_b)` can no longer reach the
  *     threshold — no per-row hash set, no allocation (Spark's own
  *     `ArrayIntersect` builds an OpenHashSet and a result array per
  *     row, all of which this query immediately reduces to a size).
  *
  * Returns: the exact |∩| when the pair qualifies (3·|∩| ≥ na+nb);
  * −1 when the merge ran and disqualified it; −2 when phase 1/2
  * pruned it before any merge work — the scale soak reports the −2
  * share as the suffix filter's measured cut. Inputs MUST be sorted
  * ascending and duplicate-free (the `sort_array(collect_list(...))`
  * over distinct shingles both call sites use); unsorted input yields
  * undercounts, never errors.
  */
case class SortedJaccardMeets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "jaccard_meets"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SetOverlap.jaccardMeets(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData])

  // one static call — the expression stays inside whole-stage codegen
  // (the method is the loop; there is nothing to inline further)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetOverlap.jaccardMeets($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetOverlap {
  /** suffix-filter recursion depth: 2^3 = 8 value-aligned segments —
    * past this the probe's binary searches cost what the merge's
    * early-exit already bounds. */
  private final val DEPTH = 3

  /** see [[SortedJaccardMeets]]; public + JVM-static-shaped so the
    * generated code calls it directly. */
  def jaccardMeets(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    val need = (na + nb + 2) / 3 // ceil((na+nb)/3)
    if (math.min(na, nb) < need) return -2L
    if (suffixBound(a, 0, na, b, 0, nb, DEPTH) < need) return -2L
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      if (inter + math.min(na - i, nb - j) < need) return -1L
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (3L * inter >= na + nb) inter.toLong else -1L
  }

  /** upper bound on |A[alo,ahi) ∩ B[blo,bhi)| by value-aligned median
    * partition, `d` levels deep — PPJoin+'s suffixFilter shape. */
  private def suffixBound(a: ArrayData, alo: Int, ahi: Int,
                          b: ArrayData, blo: Int, bhi: Int,
                          d: Int): Int = {
    val la = ahi - alo
    val lb = bhi - blo
    if (la == 0 || lb == 0 || d == 0) return math.min(la, lb)
    val mid = alo + la / 2
    val pivot = a.getLong(mid)
    // lower bound of pivot in b
    var lo = blo
    var hi = bhi
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (b.getLong(m) < pivot) lo = m + 1 else hi = m
    }
    val hit = lo < bhi && b.getLong(lo) == pivot
    suffixBound(a, alo, mid, b, blo, lo, d - 1) +
      (if (hit) 1 else 0) +
      suffixBound(a, mid + 1, ahi, b, if (hit) lo + 1 else lo, bhi, d - 1)
  }

  /** Register `jaccard_meets` for `expr(...)`/SQL use. Idempotent. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "jaccard_meets",
      exprs => SortedJaccardMeets(exprs(0), exprs(1)))
}
