package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton-curve) data layout — the lakehouse multi-column
  * pruning technique: interleave the bits of several quantized columns
  * into one sort key, range-partition + sort the corpus by it, and
  * min/max file statistics become selective on EVERY interleaved
  * column at once (a single-column sort clusters only its own column).
  *
  * At 100 TB this is a WRITE-ONCE cost (one range-partition sort, the
  * same shape as [[CorpusOps.epochShuffle]]) that every subsequent
  * filtered scan repays: a box predicate on any subset of the z-columns
  * skips the files whose min/max z-range cannot contain it — parquet
  * row-group stats do the skipping for free, no index structure to
  * maintain.
  */
object ZOrder {

  /** Interleaved Morton key over `children`, each quantized by the
    * caller to `[0, 2^bits)` (values are masked to `bits` bits — the
    * caller picks the quantization: modulo, range-bucket, or
    * truncation). Bit `i` of input `j` lands at output bit
    * `i * n + j` — the standard Morton interleave, pure integer math,
    * reproducible in any engine (the DuckDB oracle computes the same
    * key as a 2·bits-term arithmetic sum).
    */
  case class ZOrderKey(children: Seq[Expression], bits: Int)
    extends Expression {

    require(children.nonEmpty, "zorder_key needs at least one column")
    require(bits >= 1 && bits * children.size <= 63,
      s"bits*numCols must fit a signed long, got $bits*${children.size}")

    // the DSL surface ([[zkey]]) casts every input to long; SQL callers
    // must do the same — no implicit coercion here
    override def checkInputDataTypes(): TypeCheckResult =
      children.find(_.dataType != LongType) match {
        case Some(bad) => TypeCheckResult.TypeCheckFailure(
          s"zorder_key needs BIGINT inputs, got ${bad.dataType.catalogString}")
        case None => TypeCheckResult.TypeCheckSuccess
      }

    override def dataType: DataType = LongType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "zorder_key"
    override def foldable: Boolean = children.forall(_.foldable)

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val n = children.size
      var z = 0L
      var j = 0
      while (j < n) {
        val v = children(j).eval(input)
        if (v == null) return null
        val x = v.asInstanceOf[Long] & ((1L << bits) - 1)
        var i = 0
        while (i < bits) {
          z |= ((x >>> i) & 1L) << (i * n + j)
          i += 1
        }
        j += 1
      }
      z
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = children.size
      val mask = (1L << bits) - 1
      val childGen = children.map(_.genCode(ctx))
      val z = ctx.freshName("z")
      val x = ctx.freshName("x")
      // Fully unrolled interleave: bits*n constant-shift OR terms, no
      // loop-carried state — JIT-friendly, stays in whole-stage codegen.
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val body = childGen.zipWithIndex.map { case (cg, j) =>
        val xj = s"${x}_$j"
        val terms = (0 until bits).map { i =>
          s"$z |= (($xj >>> $i) & 1L) << ${i * n + j};"
        }.mkString("\n")
        code"""
           |${cg.code}
           |if (${cg.isNull}) { ${ev.isNull} = true; } else {
           |  long $xj = ${cg.value} & ${mask}L;
           |  $terms
           |}
         """.stripMargin
      }.reduce(_ + _)
      ev.copy(code =
        code"""
           |boolean ${ev.isNull} = false;
           |long $z = 0L;
           |$body
           |long ${ev.value} = $z;
         """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): ZOrderKey =
      copy(children = newChildren)
  }

  /** Column-DSL surface: `zkey(Seq($"a", $"b"), bits = 16)`. Inputs are
    * cast to long and masked to `bits` bits. */
  def zkey(cols: Seq[Column], bits: Int): Column =
    GraftSqlBridge.column(
      ZOrderKey(cols.map(c => GraftSqlBridge.expression(c.cast("long"))), bits))

  /** The DuckDB-oracle-equivalent SQL for [[zkey]] — an arithmeticized
    * interleave (`((x >> i) & 1) * 2^(i*n+j)` summed), generated so the
    * graded entry and the Scala key share one definition of the curve.
    */
  def zkeySql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val terms = for {
      j <- cols.indices
      i <- 0 until bits
    } yield s"(((${cols(j)} >> $i) & 1) << ${i * n + j})"
    terms.mkString(" + ")
  }

  /** Write-side layout: range-partition + sort by the z-key so file
    * min/max stats are tight boxes on the curve. `numFiles` bounds the
    * output file count (at 100 TB pick `corpus_bytes / 1 GB`). The key
    * column is kept (`zCol`) so readers can range-prune on it directly
    * too.
    */
  def zorderLayout(df: DataFrame, cols: Seq[Column], bits: Int,
                   numFiles: Int, zCol: String = "z_key"): DataFrame = {
    val keyed = df.withColumn(zCol, zkey(cols, bits))
    keyed.repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
  }
}
