package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for the Bench 500k corpus-probe block (VERDICT r9 #1):
  * replicates Bench's documents tile (same copies expression, same
  * cache + count materialization) and times the named probes ×RUNS
  * each, printing every run — so a cross-round swing on unchanged code
  * can be attributed to environment vs a real plan change without
  * paying for the whole Bench suite.
  *
  * Usage:
  * {{{
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.CorpusProbe pack surp_split span span_hashed"
  * }}}
  * Env: `SPARK_GRAFT_SF_DIR` (default sf0.1), `SPARK_GRAFT_CPUS`
  * (default 32), `SPARK_GRAFT_RUNS` timed runs per probe (default 3).
  */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // identical tile to Bench's corpus500k block
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = d.count()
    val copies = math.max(1, (500000L / math.max(1L, n)).toInt)
    val tiled = d.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select((col("doc_id") + col("copy") * n).as("doc_id"), col("lang"), col("text"))
      .repartition(cpus.toInt).cache()
    val total = tiled.count()
    println(s"[corpus-probe] tiled $total docs (${copies}x) from $sfDir")

    // `<name>_fb` twins force the r18 span/line fast paths back onto
    // the pre-r18 join fallback (graft.span.hotBroadcastMax = -1) so
    // the before/after pair measures in ONE JVM under one box state
    def withFallback(body: => Unit): Unit = {
      val keys = Seq("graft.span.hotBroadcastMax", "graft.vocab.broadcastMax")
      val old = keys.map(k => k -> sys.props.get(k))
      keys.foreach(sys.props(_) = "-1")
      try body
      finally old.foreach {
        case (k, Some(o)) => sys.props(k) = o
        case (k, None) => sys.props -= k; ()
      }
    }
    def spanBody(hashed: Boolean): Unit =
      graft.pipeline.CorpusOps.maskRepeatedNgrams(
          tiled, "text", "doc_id", n = 8, minCount = 3, hashedGrams = hashed)
        .agg(sum(col("n_covered")), sum(size(col("kept")))).collect(): Unit
    def substrBody(): Unit =
      graft.pipeline.CorpusOps.exactSubstrSpans(tiled, "text", "doc_id", minLen = 8)
        .agg(sum(col("span_len")), count(lit(1))).collect(): Unit
    def lineBody(): Unit =
      graft.pipeline.CorpusOps.dropBoilerplateLines(tiled, "text", "doc_id", minDf = 1000L)
        .agg(sum(col("n_kept") + length(col("clean_text")))).collect(): Unit
    def surpBody(): Unit =
      graft.textanalysis.TextAnalysis.unigramSurprisal(tiled, "text", "doc_id")
        .agg(sum(col("surprisal"))).collect(): Unit
    def dsirBody(): Unit =
      graft.textanalysis.TextAnalysis.dsirWeights(
          tiled, tiled.filter(col("lang") === "en"), "text", "doc_id")
        .agg(sum(col("log_w")), sum(col("n_feats"))).collect(): Unit
    val probes: Map[String, () => Unit] = Map(
      "surp_fb" -> (() => withFallback(surpBody())),
      "dsir_fb" -> (() => withFallback(dsirBody())),
      "substr" -> (() => substrBody()),
      "substr_fb" -> (() => withFallback(substrBody())),
      "span_fb" -> (() => withFallback(spanBody(false))),
      "span_hashed_fb" -> (() => withFallback(spanBody(true))),
      "line_fb" -> (() => withFallback(lineBody())),
      "curate" -> (() => graft.pipeline.CorpusOps.curate(
          tiled, "text", "doc_id").count(): Unit),
      "pii" -> (() => tiled.agg(sum(length(
          graft.textanalysis.TextAnalysis.redactPii(col("text"))))).collect(): Unit),
      "pack" -> (() => graft.pipeline.CorpusOps.packSequences(
          tiled.select(col("doc_id"),
            size(split(col("text"), "\\s+")).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", seqLen = 2048, bucketSize = 100000)
        .agg(sum(col("span_len")), max(col("seq_id"))).collect(): Unit),
      "rep" -> (() => graft.pipeline.CorpusOps.repetitionStats(
          tiled, "text", "doc_id")
        .agg(sum(col("repetition"))).collect(): Unit),
      "surp" -> (() => graft.textanalysis.TextAnalysis.unigramSurprisal(
          tiled, "text", "doc_id")
        .agg(sum(col("surprisal"))).collect(): Unit),
      "surp_split" -> (() => graft.textanalysis.TextAnalysis.unigramSurprisalSplit(
          tiled, "text", "doc_id")
        .agg(sum(col("surprisal"))).collect(): Unit),
      "span" -> (() => graft.pipeline.CorpusOps.maskRepeatedNgrams(
          tiled, "text", "doc_id", n = 8, minCount = 3)
        .agg(sum(col("n_covered")), sum(size(col("kept")))).collect(): Unit),
      "span_hashed" -> (() => graft.pipeline.CorpusOps.maskRepeatedNgrams(
          tiled, "text", "doc_id", n = 8, minCount = 3, hashedGrams = true)
        .agg(sum(col("n_covered")), sum(size(col("kept")))).collect(): Unit),
      "dsir" -> (() => graft.textanalysis.TextAnalysis.dsirWeights(
          tiled, tiled.filter(col("lang") === "en"), "text", "doc_id")
        .agg(sum(col("log_w")), sum(col("n_feats"))).collect(): Unit),
      "gopher" -> (() => graft.textanalysis.TextAnalysis.gopherRules(
          tiled, "text", "doc_id")
        .agg(sum(col("n_words"))).collect(): Unit),
      "c4" -> (() => graft.textanalysis.TextAnalysis.c4Filters(
          tiled, "text", "doc_id")
        .agg(sum(col("n_kept_lines"))).collect(): Unit),
      "gopher_rep" -> (() => graft.textanalysis.TextAnalysis.gopherRepetition(
          tiled, "text", "doc_id")
        .agg(sum(col("dup_5gram_char_frac"))).collect(): Unit),
      "contam" -> (() => graft.pipeline.CorpusOps.contaminationStats(
          tiled, "text", "doc_id", col("doc_id") % 9973 === 0).count(): Unit),
      "contam_hashed" -> (() => graft.pipeline.CorpusOps.contaminationStats(
          tiled, "text", "doc_id", col("doc_id") % 9973 === 0,
          hashedGrams = true).count(): Unit),
      "line" -> (() => graft.pipeline.CorpusOps.dropBoilerplateLines(
          tiled, "text", "doc_id", minDf = 1000L)
        .agg(sum(col("n_kept") + length(col("clean_text")))).collect(): Unit),
      "line_hashed" -> (() => graft.pipeline.CorpusOps.dropBoilerplateLines(
          tiled, "text", "doc_id", minDf = 1000L, hashedLines = true)
        .agg(sum(col("n_kept") + length(col("clean_text")))).collect(): Unit))

    val names = if (args.nonEmpty) args.toSeq else probes.keys.toSeq.sorted
    names.foreach { name =>
      val p = probes.getOrElse(name,
        sys.error(s"unknown probe '$name'; known: ${probes.keys.toSeq.sorted.mkString(", ")}"))
      p() // warmup
      val secs = Array.fill(runs) {
        val t0 = System.nanoTime()
        p()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[corpus-probe] $name%-12s best=${secs.min}%.2fs runs=${secs.map(s => f"$s%.2f").mkString("[", ",", "]")}")
    }
    tiled.unpersist()
    spark.stop()
  }
}
