package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the kNN scoring hot path: the full
  * per-row score against a LITERAL query vector in ONE array traversal
  * with `doGenCode` (SURVEY §7.3's "custom codegen Expression if the
  * bench misses": the higher-order-function form builds a zipped
  * intermediate array per row and re-traverses for the row norm —
  * measured ~2× slower on the unindexed scan path).
  *
  * BIT-PARITY CONTRACT with [[VectorFunctions]]: every accumulator adds
  * in ascending element order in double precision, exactly like the
  * HOF `aggregate(zip_with(...))` fold, and the cosine denominator is
  * `sqrt(rowNorm²) × qNorm` with `qNorm` precomputed by the same
  * left-to-right fold [[graft.search.VectorSearch.knn]] inlines — so
  * swapping this in changes no oracle-checked result. Null array →
  * null; null element or length mismatch → null (the HOF form's
  * null-propagation through `zip_with` padding).
  */
case class QueryScore(child: Expression, query: Array[Double], mode: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"query_score needs ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "query_score"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Same left-to-right fold as VectorSearch.knn's inlined qNorm. */
  private lazy val qNorm: Double =
    math.sqrt(query.foldLeft(0.0)((acc, x) => acc + x * x))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = query.length
    if (arr.numElements() != n) return null
    var dot = 0.0
    var n2v = 0.0
    var d2 = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      mode match {
        case QueryScore.Dot | QueryScore.DotScore =>
          dot += v * query(i)
        case QueryScore.CosineFull =>
          dot += v * query(i)
          n2v += v * v
        case QueryScore.EuclidScore =>
          val d = v - query(i)
          d2 += d * d
      }
      i += 1
    }
    mode match {
      case QueryScore.Dot         => dot
      case QueryScore.DotScore    => 1.0 + dot
      case QueryScore.CosineFull  => dot / (math.sqrt(n2v) * qNorm)
      case QueryScore.EuclidScore => 1.0 - math.sqrt(d2)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("query", query, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val qn = qNorm
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val n2v = ctx.freshName("n2v")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      val acc = mode match {
        case QueryScore.Dot | QueryScore.DotScore =>
          s"$dot += (double) $arr.$getter($i) * $qRef[$i];"
        case QueryScore.CosineFull =>
          s"""double v = (double) $arr.$getter($i);
             |$dot += v * $qRef[$i];
             |$n2v += v * v;""".stripMargin
        case QueryScore.EuclidScore =>
          s"""double $d = (double) $arr.$getter($i) - $qRef[$i];
             |$dot += $d * $d;""".stripMargin
      }
      val result = mode match {
        case QueryScore.Dot         => s"$dot"
        case QueryScore.DotScore    => s"1.0 + $dot"
        case QueryScore.CosineFull  => s"$dot / (java.lang.Math.sqrt($n2v) * ${qn}D)"
        case QueryScore.EuclidScore => s"1.0 - java.lang.Math.sqrt($dot)"
      }
      s"""
         |if ($arr.numElements() != $qRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  double $n2v = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $qRef.length; $i++) {
         |    if ($arr.isNullAt($i)) { $bad = true; break; }
         |    $acc
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $result;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QueryScore {
  /** raw Σ v·q — the CosineUnit fast path (unit vectors at ingest). */
  final val Dot = 0
  /** `1 + dot` — the DotProduct metric's score. */
  final val DotScore = 1
  /** `dot / (‖v‖ · ‖q‖)` — full cosine, one traversal. */
  final val CosineFull = 2
  /** `1 − √Σ(v−q)²` — the Euclidean metric's score. */
  final val EuclidScore = 3

  import org.apache.spark.sql.{Column, GraftSqlBridge}

  def apply(v: Column, query: Seq[Double], mode: Int): Column =
    GraftSqlBridge.column(QueryScore(GraftSqlBridge.expression(v), query.toArray, mode))
}
