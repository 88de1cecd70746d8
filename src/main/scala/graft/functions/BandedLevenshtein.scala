package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `levenshtein_leq(a, b, k)` — bounded edit distance: the exact
  * Levenshtein distance when it is ≤ k, else k + 1 ("more than k").
  *
  * The entity-resolution verify stage ([[graft.operators.EntityResolution]])
  * only ever asks "is the distance within the match band?" — computing
  * the full O(|a|·|b|) DP per candidate pair (what the built-in
  * `levenshtein` does) wastes the bound. This is Ukkonen's banded
  * algorithm: only the 2k+1 diagonal band of the DP matrix is computed
  * (O(k·min(n,m)) work), rows that exceed k everywhere exit early, and
  * a length gap > k returns immediately — the right inner loop when the
  * verify runs on 10⁹ candidate pairs with k = 2.
  *
  * Semantics match the built-in on the match band: for pairs the query
  * keeps (distance ≤ k) the returned value IS the exact distance, so
  * swapping this in changes no query output (FunctionsSpec proves
  * equality against the built-in on random pairs). Distances are
  * unit-cost over UTF-16 code units (identical to the built-in and to
  * DuckDB's `levenshtein` for all BMP text; the synthetic data is
  * ASCII).
  *
  * Codegen: the banded DP lives in a static helper; the generated code
  * makes one direct call — the expression stays inside whole-stage
  * codegen with no interpreted-row fallback.
  */
case class BandedLevenshtein(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "levenshtein_leq"

  override protected def nullSafeEval(a: Any, b: Any, k: Any): Any =
    BandedLevenshtein.banded(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) =>
      s"${ev.value} = graft.functions.BandedLevenshtein.banded($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BandedLevenshtein {

  /** Banded DP: exact distance if ≤ k, else k + 1. Static (Java-visible)
    * so generated code calls it directly. */
  def banded(ua: UTF8String, ub: UTF8String, k: Int): Long = {
    if (k < 0) return 0L
    val a = ua.toString
    val b = ub.toString
    val n = a.length
    val m = b.length
    if (math.abs(n - m) > k) return (k + 1).toLong
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val inf = k + 1
    // prev(j) = D[i-1][j], cur(j) = D[i][j]; only |i - j| ≤ k computed.
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      cur(lo - 1) = if (i - (lo - 1) <= k && lo - 1 == 0) i else inf
      var rowMin = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        val del = if (prev(j) >= inf) inf else prev(j) + 1
        val ins = if (cur(j - 1) >= inf) inf else cur(j - 1) + 1
        val sub = if (prev(j - 1) >= inf) inf else prev(j - 1) + cost
        var v = if (del < ins) del else ins
        if (sub < v) v = sub
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (rowMin >= inf) return inf.toLong // whole band exceeded k
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val d = prev(m)
    (if (d > k) inf else d).toLong
  }
}
