package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-`n`-gram count as a native codegen expression — the
  * per-document half of the repetition signal (`1 − distinct/total`).
  *
  * Why an expression and not a typed `Dataset.map` (VERDICT r10
  * what's-wrong #2: `repetitionStats` was the one per-row column job
  * still paying encoder round-trips outside whole-stage codegen) or a
  * SQL higher-order function (the `transform(sequence(...))` form
  * re-inlines the `split` derivation into every lambda element —
  * O(words²) per document, profiled in r5): this stays inside the
  * codegen span like [[UnicodeNormalize]], one static call per row, no
  * Row boxing, and shares [[graft.dedup.Dedup.distinctShingleCount]]
  * with the LSH shingle family so there is exactly one definition of
  * the gram semantics.
  */
case class DistinctShingleCount(child: Expression, n: Int)
  extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"distinct_shingle_count needs STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "distinct_shingle_count"

  override def nullSafeEval(input: Any): Any =
    graft.dedup.Dedup.distinctShingleCount(
      input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.dedup.Dedup.distinctShingleCount($c.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingleCount =
    copy(child = newChild)
}

object DistinctShingleCount {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Column-DSL surface: distinct word-n-gram count of `text`. */
  def of(text: Column, n: Int = 3): Column =
    GraftSqlBridge.column(DistinctShingleCount(GraftSqlBridge.expression(text), n))
}
