package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's two string-similarity scorers as codegen expressions —
  * the score functions behind its matcher scripts (J1/J2), which round 3
  * exercised only with stand-in scores:
  *
  *  - [[SeqRatio]] = `difflib.SequenceMatcher(None, a, b).ratio()`
  *    (`Sequence matcher.py:13-14`, `bestmatch.py:13-14`) — raw [0,1]
  *    Ratcliff-Obershelp similarity, threshold-compared with `> 0.8` in
  *    `bestmatch.py:30`.
  *  - [[TokenSortRatio]] = `fuzz.token_sort_ratio(a, b)` (`fuzzy.py:13-14`)
  *    — integer 0..100; the difflib backend applies because the reference
  *    pins no python-Levenshtein (see [[graft.core.SeqMatcher]]).
  *
  * Both are one static-call kernel per pair inside whole-stage codegen (the
  * [[Kernels]] forwarder pattern), O(|a|·|b|) worst-case per pair — score
  * columns for a broadcast-nested-loop pair set, not a per-token scan. */
object StringSimilarity {

  /** Analysis-time string check (both scorers are SQL-registered with
    * arbitrary user columns; a bigint child would otherwise die at runtime
    * in codegen/ClassCastException instead of a clear analysis error). */
  private def checkBothStrings(name: String, left: Expression,
                               right: Expression): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name requires two string arguments, got ${l.catalogString} and ${r.catalogString}")
    }

  /** (a, b) → difflib SequenceMatcher ratio, double in [0, 1]. */
  case class SeqRatio(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkBothStrings("seq_ratio", left, right)
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      graft.core.SeqMatcher.ratio(
        a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.Kernels.seqRatio($a.toString(), $b.toString());")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** (a, b) → fuzzywuzzy token_sort_ratio, int in [0, 100]. */
  case class TokenSortRatio(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkBothStrings("token_sort_ratio", left, right)
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      graft.core.SeqMatcher.tokenSortRatio(
        a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.Kernels.tokenSortRatio($a.toString(), $b.toString());")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // ---- Column-level API ----------------------------------------------------
  def seq_ratio(a: Column, b: Column): Column =
    column(SeqRatio(expression(a), expression(b)))

  def token_sort_ratio(a: Column, b: Column): Column =
    column(TokenSortRatio(expression(a), expression(b)))
}
