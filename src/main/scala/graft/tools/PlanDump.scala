package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Regenerates `docs/PLANS.md`: the formatted physical plans of a
  * representative slice of the graded queries, with a one-line note on
  * what each plan must show (pushed filters, broadcast sides, shuffle
  * count, WholeStageCodegen spans). Standing evidence for plan review
  * without running anything — re-run after operator changes:
  *
  * {{{
  *   sbt "runMain graft.tools.PlanDump"
  * }}}
  */
object PlanDump {

  /** (query, what the plan must show). */
  val Selected: Seq[(String, String)] = Seq(
    "point_lookup" -> ("The id predicate reaches the scan as a pushed " +
      "partition/data filter (`PushedFilters`) — a 100 TB collection " +
      "answers a point lookup from one shard's files, not a scan."),
    "q1_agg" -> ("Classic agg: partial aggregation before the single " +
      "exchange (`HashAggregate` twice), column-pruned scan " +
      "(`ReadSchema` carries only the grouped/summed columns)."),
    "knn_cosine" -> ("Brute-force kNN is ZERO-shuffle: codegen score " +
      "expression inside WholeStageCodegen, then `TakeOrderedAndProject` " +
      "— top-k merges per-partition heaps on the driver, no exchange."),
    "metadata_filter" -> ("Metadata predicates stay inside the scan " +
      "stage — the filter runs before any wide op (the Exchange below " +
      "it is only the entry's deterministic ORDER BY for the oracle)."),
    "hybrid_rrf" -> ("Three retrieval branches union BEFORE a single " +
      "per-branch rank window; the RRF sum is one aggregation — no " +
      "N-pass loop over strategies."),
    "dedup_pairs" -> ("Banded-LSH self-join: the only wide ops are the " +
      "band/bucket count (guard) and the bucket equi-join; verification " +
      "joins shingles back on candidate ids only."),
    "dedup_incremental" -> ("New×history: history text is semi-joined " +
      "down to candidate ids BEFORE shingling — the scan of a " +
      "never-candidate history row never happens."),
    "dedup_substring" -> ("ExactSubstr spans (r17): ONE gram-count " +
      "shuffle on 8-byte hashed anchors (partial-agg combined) + a " +
      "left-semi join of gram starts vs the hot set + one per-doc " +
      "starts groupBy — no suffix array, no pairwise op, island merge " +
      "is per-doc bounded column work."),
    "html_extract" -> ("HTML main-content extraction (r18). The page " +
      "synthesis is a codegen'd concat projection, the extractor one " +
      "narrow mapPartitions kernel — the only Exchange in the plan is " +
      "the entry's deterministic ORDER BY for the oracle. At 100 TB " +
      "this is scan-speed work that scales with input splits."),
    "warc_extract" -> ("WARC crawl ingestion (r18). The ONE groupBy " +
      "Exchange is the entry's file-assembly scaffolding (50 docs → " +
      "one gzip-member WARC blob); the OPERATOR is the parse after " +
      "it — a narrow mapPartitions kernel over file blobs (gunzip " +
      "members, frame records by Content-Length bytes, peel the HTTP " +
      "envelope), zero shuffle of its own. In production the blobs " +
      "come straight from binaryFile splits and the assembly " +
      "exchange does not exist — the stage is scan-speed."),
    "warc_html_pipeline" -> ("WARC → HTML main text, composed (r18). " +
      "Same plan as warc_extract with the HtmlExtract kernel fused " +
      "into the same narrow stage — two pipeline stages, still one " +
      "scan-shaped pass; nothing widens between the parse and the " +
      "block classification."),
    "training_export" -> ("Trainer shard export (r17). The entry " +
      "dumps its READ-BACK grading plan (scan of the written shards → " +
      "one per-split agg); the WRITE plan itself — per-row splitAssign/" +
      "epochShuffleKey projections, ONE range-partition sort, no extra " +
      "writer-inserted SortExec because split leads the task ordering — " +
      "is pinned in CorpusOpsSpec's writer-contract tests and executes " +
      "inside the entry before this plan runs."),
    "line_dedup" -> ("C4 line dedup keys the corpus-wide count shuffle " +
      "on 8-byte line hashes (`hashedLines`), not line strings."),
    "pack_sequences" -> ("Greedy packing is one narrow pass after a " +
      "single range-partition sort; shard boundaries come from a " +
      "bounded cumsum, not a global single-task window."),
    "events_asof" -> ("As-of join compiles to a bucketized range join " +
      "(equi-join on time buckets + residual), not a " +
      "BroadcastNestedLoopJoin."),
    "bucketed_join" -> ("Both sides pre-bucketed by the join key. At " +
      "sf0.01 the optimizer picks an even cheaper BroadcastHashJoin " +
      "(small side under the threshold); the zero-Exchange " +
      "co-located sort-merge contract for the at-scale case is " +
      "asserted in BucketedStoreSpec with broadcast disabled."),
    "nb_classifier" -> ("NB inference: model tables are broadcast " +
      "(`BroadcastHashJoin` / `BroadcastExchange`); the only wide " +
      "exchanges are the train-side count and the per-(doc,label) sum."),
    "corpus_curate" -> ("Composed curation: digest window for exact " +
      "dedup, then narrow maps; one shuffle per logical stage, no " +
      "repeated corpus scans."),
    "dsir_weights" -> ("DSIR: both LM count tables build with partial " +
      "aggregation on 8-byte gram hashes; the instance stream joins " +
      "the merged vocab once (AQE broadcasts it at this SF; sort-merge " +
      "at scale), then one per-doc sum — no pairwise ops, the p75 " +
      "threshold is a scalar over the doc-count-sized weight table."),
    "ccnet_buckets" -> ("CCNet bucketing: one vocab count shuffle with " +
      "partial aggregation, the scalar total and the one-row-per-" +
      "language threshold table BROADCAST back (both explicit), one " +
      "doc-count-sized left join restoring featureless rows — no " +
      "corpus-sized exchange after the vocab count."),
    "semdedup_pooled" -> ("Composed pool→semdedup pipeline: ONE " +
      "groupBy(doc) shuffle carries the chunk vectors into the " +
      "in-order pooling folds, the k-means assign passes are " +
      "broadcast-closure maps (k·dim centroid rows to the driver per " +
      "iteration), and the cosine pass repartitions by cluster only — " +
      "pair work bounded by the largest cell, never all-pairs."),
    "zorder_key" -> ("Morton key is pure per-row bit math — scan → " +
      "project, nothing else."))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# Physical plans of representative graded queries\n\n")
    sb.append("Generated by `graft.tools.PlanDump` (sf0.01, local[" + cpus +
      "], AQE on — `AdaptiveSparkPlan isFinalPlan=false` shows the\n" +
      "pre-execution plan; broadcasts chosen at runtime by AQE appear as\n" +
      "`Exchange` here and collapse to broadcasts during execution).\n" +
      "Each section notes what the plan must show; regenerate after\n" +
      "operator changes with `sbt \"runMain graft.tools.PlanDump\"`.\n")
    Selected.foreach { case (name, note) =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        sb.append(s"\n## $name\n\n$note\n\n```\n")
        // keep the operator tree + the interesting node details, cap size
        val lines = plan.linesIterator.toVector
        val capped = if (lines.size > 120) lines.take(120) :+ s"... (${lines.size - 120} more lines)" else lines
        sb.append(capped.mkString("\n"))
        sb.append("\n```\n")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("docs/PLANS.md"),
      sb.toString.getBytes("UTF-8"))
    println(s"[plans] wrote docs/PLANS.md (${Selected.size} queries)")
    spark.stop()
  }
}
