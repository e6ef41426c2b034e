package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Native Catalyst expressions over serialized sketch columns.
  *
  * Spark ships KLL aggregation (`kll_sketch_agg_double`) and FOLDABLE
  * probes (`kll_sketch_get_quantile_double` / `_get_rank_double` demand a
  * literal argument — they answer "one quantile of many sketches", not
  * "many values against their row's sketch"). The per-ROW probe that
  * `percentileRankApprox` needs — each row scored against its own group's
  * sketch column — has no built-in, so this is the (b) rung of the
  * extension ladder: a codegen'd `BinaryExpression`, not a UDF.
  */

/** `graft_kll_rank(sketch, value)` — the INCLUSIVE normalized rank of
  * `value` in a serialized `KllDoublesSketch` (`binary` column from
  * `kll_sketch_agg_double`): the estimated fraction of the sketched
  * stream ≤ `value`, a double in [0, 1]. Non-foldable in BOTH arguments
  * (the whole point). Heapify-per-row is O(retained) = O(k log(n/k)) —
  * the same order as the rank scan itself — and the sketch bytes arrive
  * off a group-cardinality-sized join build side, so the scan stays
  * inside whole-stage codegen with no window and no extra shuffle. */
case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"KllRank needs (binary sketch, double value) args, got " +
        s"${left.dataType} / ${right.dataType}")

  override def nullSafeEval(sk: Any, v: Any): Any =
    KllRank.rank(sk.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, v) =>
      s"${ev.value} = graft.functions.KllRank.rank($sk, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KllRank {
  /** Shared eval/codegen kernel. Loud on an empty or foreign blob —
    * `kll_sketch_agg_double` never emits an empty sketch for a group
    * that exists, so reaching one means the column isn't what the
    * caller thinks it is. */
  def rank(bytes: Array[Byte], v: Double): Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    require(!sk.isEmpty,
      "graft_kll_rank: empty KLL sketch — not a kll_sketch_agg_double output")
    sk.getRank(v, QuantileSearchCriteria.INCLUSIVE)
  }
}

object SketchExpressions {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column wrapper: per-row inclusive rank against a sketch column. */
  def kllRank(sketch: Column, value: Column): Column =
    ColumnBridge.column(
      KllRank(ColumnBridge.expression(sketch), ColumnBridge.expression(value)))
}
