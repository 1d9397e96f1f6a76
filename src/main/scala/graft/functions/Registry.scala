package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData

/** SQL-surface registration for graft's native expressions.
  *
  * Two routes to the same function descriptions:
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `.withExtensions(new graft.GraftExtensions)`) installs them at
  *    session build — the canonical `SparkSessionExtensions` mechanism;
  *  - [[Registry.register]] adds them to an already-running session.
  *
  * `graft_query_score(vector, array(...), 'cosine')` then runs the
  * codegen'd [[QueryScore]] from plain SQL. The query array and mode
  * must be foldable (literals) — the expression embeds the query as a
  * constant, which is what makes it fast.
  */
object Registry {

  private def modeOf(s: String): Int = s match {
    case "dot"       => QueryScore.Dot
    case "dot_score" => QueryScore.DotScore
    case "cosine"    => QueryScore.CosineFull
    case "euclidean" => QueryScore.EuclidScore
    case other => throw new IllegalArgumentException(
      s"unknown query_score mode '$other' (dot|dot_score|cosine|euclidean)")
  }

  private val queryScoreBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      "graft_query_score(vector, query_array, mode) takes exactly 3 arguments")
    require(exprs(1).foldable, "query_score's query array must be a literal")
    require(exprs(2).foldable, "query_score's mode must be a literal string")
    // SQL array literals arrive as array<decimal>/<int>/etc — cast to
    // array<double> before folding (numeric casts need no timezone)
    val asDouble = org.apache.spark.sql.catalyst.expressions.Cast(
      exprs(1), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    val q = asDouble.eval() match {
      case a: ArrayData => a.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"query_score's query must be an array, got $other")
    }
    QueryScore(exprs(0), q, modeOf(exprs(2).eval().toString))
  }

  /** Lift a Column-DSL function into a SQL function builder: arguments
    * arrive as analyzed child expressions, get wrapped as Columns, and
    * the composed expression tree is handed back to the parser — the
    * SQL surface and the Scala API share one implementation. */
  private def colFn(name: String, arity: Int)(
      build: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
    : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(Registry.getClass.getCanonicalName, name),
      exprs => {
        require(exprs.length == arity, s"$name takes exactly $arity argument(s)")
        GraftSqlBridge.expression(build(exprs.map(GraftSqlBridge.column)))
      })

  /** The function descriptions both registration routes share. */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import graft.textanalysis.TextAnalysis
    Seq(
      (FunctionIdentifier("graft_query_score"),
        new ExpressionInfo(classOf[QueryScore].getCanonicalName, "graft_query_score"),
        queryScoreBuilder),
      // the text-analysis surface, SQL-first: identical trees to the
      // Scala Column API (all codegen'd builtins)
      colFn("graft_redact_pii", 1)(cs => TextAnalysis.redactPii(cs.head)),
      colFn("graft_lang_id", 1)(cs => TextAnalysis.langId(cs.head)),
      colFn("graft_quality_flag", 1)(cs => TextAnalysis.qualityFlag(cs.head)),
      colFn("graft_ws_tokens", 1)(cs => TextAnalysis.wsTokenCount(cs.head)),
      colFn("graft_bpeish_tokens", 1)(cs => TextAnalysis.bpeishTokenCount(cs.head)),
      colFn("graft_est_tokens", 1)(cs => TextAnalysis.estTokenCount(cs.head)),
      colFn("graft_normalize_text", 1)(cs => TextAnalysis.normalized(cs.head)),
      // Unicode normalization: graft_nfc(text) or graft_nfc(text, 'NFKC')
      (FunctionIdentifier("graft_nfc"),
        new ExpressionInfo(classOf[UnicodeNormalize].getCanonicalName, "graft_nfc"),
        { exprs =>
          require(exprs.nonEmpty && exprs.length <= 2,
            "graft_nfc(text[, form]) takes 1 or 2 arguments")
          val form = if (exprs.length == 2) {
            require(exprs(1).foldable, "graft_nfc's form must be a literal string")
            java.text.Normalizer.Form.valueOf(exprs(1).eval().toString)
          } else java.text.Normalizer.Form.NFC
          UnicodeNormalize(exprs.head, form)
        }),
      // distinct word-n-gram count: graft_distinct_shingles(text[, n])
      (FunctionIdentifier("graft_distinct_shingles"),
        new ExpressionInfo(classOf[DistinctShingleCount].getCanonicalName,
          "graft_distinct_shingles"),
        { exprs =>
          require(exprs.nonEmpty && exprs.length <= 2,
            "graft_distinct_shingles(text[, n]) takes 1 or 2 arguments")
          val n = if (exprs.length == 2) {
            require(exprs(1).foldable, "graft_distinct_shingles's n must be a literal")
            exprs(1).eval().toString.toInt
          } else 3
          DistinctShingleCount(exprs.head, n)
        }),
      // Morton key: graft_zorder_key(bits, c0, c1, ...) — bits literal,
      // columns cast to long
      (FunctionIdentifier("graft_zorder_key"),
        new ExpressionInfo(
          graft.pipeline.ZOrder.ZOrderKey.getClass.getCanonicalName, "graft_zorder_key"),
        { exprs =>
          require(exprs.length >= 2, "graft_zorder_key(bits, col, ...) needs ≥ 1 column")
          require(exprs.head.foldable, "graft_zorder_key's bits must be a literal")
          val bits = exprs.head.eval().toString.toInt
          graft.pipeline.ZOrder.ZOrderKey(
            exprs.tail.map(e => org.apache.spark.sql.catalyst.expressions.Cast(
              e, org.apache.spark.sql.types.LongType)), bits)
        }))
  }

  /** Register on a live session (idempotent — re-registration replaces). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach(GraftSqlBridge.registerFunction(spark, _))
}
