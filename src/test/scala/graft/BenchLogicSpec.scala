package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's build re-pair decision (VERDICT r16 #1) on
  * synthetic timings — the same `Bench.rePairDecision` the hnsw/ann
  * build blocks run, so the graded machinery's truth table is
  * spec-verified independently of any live measurement:
  *
  *   pair agrees            → min, no retry, no flag
  *   pair splits, reconciles → min of three, no flag (transient)
  *   pair splits, stays split → min of three, FLAG (sustained drift)
  */
class BenchLogicSpec extends AnyFunSuite {

  private def run(s1: Double, s2: Double, s3: => Double):
      (Double, Boolean, Int, Int) = {
    var settles = 0
    var retries = 0
    val (best, flagged) = Bench.rePairDecision(
      s1, s2, 1.5, () => settles += 1, () => { retries += 1; s3 })
    (best, flagged, settles, retries)
  }

  test("agreeing pair: min wins, no retry, no settle, no flag") {
    assert(run(10.0, 12.0, fail("retry must not run")) ===
      ((10.0, false, 0, 0)))
    // exactly at the gate is still agreement (<=, not <)
    assert(run(10.0, 15.0, fail("retry must not run")) ===
      ((10.0, false, 0, 0)))
  }

  test("split pair that reconciles: transient episode, min of three, unflagged") {
    // slow-fast: the retry lands near the fast sample → the two best
    // agree → the episode was transient, min is evidence
    assert(run(18.9, 6.3, 6.5) === ((6.3, false, 1, 1)))
    // fast-slow order must behave identically
    assert(run(6.3, 18.9, 6.5) === ((6.3, false, 1, 1)))
  }

  test("split pair that stays split: sustained drift, flagged") {
    // the r16 d128 mode: builds swinging 1.7->6.3 s same-code — no two
    // of three agree within 1.5x → the row self-flags
    assert(run(18.9, 6.3, 12.0) === ((6.3, true, 1, 1)))
    // degenerate: retry slower than both
    assert(run(4.0, 9.0, 22.0) === ((4.0, true, 1, 1)))
  }

  test("retry agreeing with the SLOW sample flags too (the fast one was the outlier)") {
    // two agreeing slow samples vs one fast: best-of rule still
    // reports the fast min (the plan's cost) but the flag marks the
    // number as non-evidentiary — min/flag are decided independently
    assert(run(4.0, 18.0, 18.5) === ((4.0, true, 1, 1)))
  }

  // ── Compact-line byte budget (VERDICT r17 #1) ──────────────────────
  //
  // The driver keeps a 2,000 B tail of console output that also holds
  // sbt's "[success] Total time: ..." line; r17's 1,926 B compact line
  // lost its head to it and the official artifact parsed null. These
  // pins hold the line under Bench.CompactBudgetBytes (1,800) at
  // WORST-CASE field widths, and verify the drop cascade keeps the
  // output complete JSON (never a truncation) when a pathological run
  // overflows anyway.

  /** Worst-case-width value per compact key, matched 1:1 against the
    * emitters in Bench.main (fmt decimals, key spellings, list caps).
    * Widths are DOCUMENTED ceilings, each 3-10x above the worst value
    * the committed artifact history (BENCH_r06-r17 + docs/probes)
    * ever recorded on this box — e.g. corpus rows cap at 99.9 s vs a
    * 33.7 s worst observed, builds at 99.9 s vs 38.1 s, the canary at
    * 9.999 ms vs 0.44 ms (a 10 ms canary is a 30x-degraded box whose
    * run is non-evidentiary anyway). The drift list sits at its
    * 3+overflow cap with the longest flag names the suite can emit.
    * A new top-level field cannot bypass this table: assembleCompact
    * rejects any key set that differs from Bench.CompactKeys. */
  private def worstCase: Map[String, String] = {
    // probeCompact: 10 keys, qps to 5 digits (observed max 18,638),
    // p50 to 99.99 ms (observed max 13.45)
    val probe = """{"xq":99999,"fq":99999,"iq":99999,"ir":0.999,"p50_ms":99.99,"ivf_p50":99.99,"pqq":99999,"pqr":0.999,"s8p":99.99,"s8r":0.999}"""
    // hnswProbeOn compact: build to 99.9 s (observed max 38.1)
    val hnsw = """{"build_s":99.9,"p50":99.99,"rec":0.99,"qps":99999}"""
    val hnswD128 = """{"build_s":99.9,"ref_build_s":99.9,"p50":99.99,"rec":0.99,"qps":99999}"""
    // corpusCompact: 19 row keys, each to 99.9 s (observed max 33.7)
    val corpusKeys = Seq("curate_s", "contam_s", "qual_s", "pii_s",
      "line_s", "surp_s", "pack_s", "span_s", "span_h_s", "nfc_s",
      "bloom_s", "zord_s", "contam_h_s", "dsir_s", "gopher_s", "c4_s",
      "gopher_rep_s", "substr_s", "html_s")
    val corpus = corpusKeys.map(k => s""""$k":99.9""").mkString("{", ",", "}")
    // driftCompact cap: 2 longest flag names + the overflow marker
    val drift = Seq.fill(2)("\"corpus_500k:span_mask_hashed\"")
      .mkString("[", ",", ",\"+99 more\"]")
    Map(
      "metric" -> "\"total\"",
      "value" -> "9999.999",
      "unit" -> "\"sec\"",
      "protocol" -> "2",
      "contended" -> "false",
      "canary_ms" -> "[9.999,9.999]",
      "attr" -> "\"idp/idp\"",
      "bw_gbps" -> "999",
      "n_queries" -> "999",
      "slowest" -> """{"multimodal_decode_mpg":99.9,"ingest_stream_curated":99.9}""",
      "failed" -> """["ingest_stream_curated","multimodal_decode_mpg"]""",
      "batch_knn_qps" -> "99999",
      "engine_100k" -> """{"rest_p50":99.999,"ins_s":99.99,"sbuild_s":99.99}""",
      "hnsw_100k" -> hnsw,
      "hnsw_100k_clustered" -> hnsw,
      "hnsw_100k_d128" -> hnswD128,
      "hnsw_1m" -> hnsw,
      "drift" -> drift,
      "sent_ms" -> """{"ref":9.999,"min":9.999,"max":9.999,"jf_ref":999.9,"shf_ref":99999}""",
      "knn_10k" -> probe,
      "knn_100k" -> probe,
      "knn_1m" -> probe,
      "knn_10m_pq" -> """{"pqq":99999,"prq":99999,"prec":0.999,"reg":0.9999,"p50_ms":99.99,"pb":99,"rf":999}""",
      "dedup_stored" -> """{"b":99.9,"q":99.9}""",
      "cc_10m" -> """{"n":99999999,"s":99.9}""",
      "corpus_500k" -> corpus,
      "events_5m" -> """{"asof_s":99.9,"range_s":99.9}""",
      "sf" -> "\"sf0.001\"")
  }

  private def braceBalanced(s: String): Boolean = {
    var depth = 0
    var inStr = false
    s.foreach { c =>
      if (c == '"') inStr = !inStr
      else if (!inStr && c == '{') depth += 1
      else if (!inStr && c == '}') depth -= 1
    }
    depth == 0 && !inStr
  }

  test("compact line: worst-case field widths fit the 1,800 B budget with ZERO drops") {
    val line = Bench.assembleCompact(worstCase)
    assert(line.getBytes("UTF-8").length <= Bench.CompactBudgetBytes,
      s"worst-case compact line is ${line.length} B — a sub-block grew; " +
        "shrink it or move detail to bench_latest.json (VERDICT r17 #1)")
    // nothing was dropped: every canonical key is present
    Bench.CompactKeys.foreach(k => assert(line.contains("\"" + k + "\":"), k))
    assert(line.startsWith("""{"metric":"total"""") && line.endsWith("}"))
    assert(braceBalanced(line))
  }

  test("compact line: pathological overflow drops whole blocks in order, output stays complete JSON") {
    // inflate one block far past the budget: the cascade must drop
    // CompactDropOrder entries until the line fits, never truncate
    val fat = worstCase.updated("corpus_500k",
      "{" + (1 to 60).map(i => s""""row_$i":999.9""").mkString(",") + "}")
    val line = Bench.assembleCompact(fat)
    assert(line.getBytes("UTF-8").length <= Bench.CompactBudgetBytes)
    assert(braceBalanced(line))
    assert(line.startsWith("""{"metric":"total"""") && line.endsWith("}"))
    // the first drop-order entry went first
    assert(!line.contains("\"events_5m\":"))
    // the graded headline blocks survive every cascade
    Seq("hnsw_100k_d128", "engine_100k", "knn_10k", "drift", "sf")
      .foreach(k => assert(line.contains("\"" + k + "\":"), k))
  }

  test("compact line: a field key outside the canonical inventory is rejected") {
    intercept[IllegalArgumentException](
      Bench.assembleCompact(worstCase.updated("new_block", "{}")))
    intercept[IllegalArgumentException](
      Bench.assembleCompact(worstCase - "corpus_500k"))
  }

  test("stored long-build references mirror bench_diff's CROSS_ROUND_REFS") {
    // the Bench-side self-flag and the gate-side fatal check must
    // judge the same rows against the same healthy values — parse the
    // python source so the two cannot drift apart silently
    val py = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/bench_diff.py")), "UTF-8")
    val ref = """"(\w+)\.build_sec":\s*\(([0-9.]+),""".r
    val gateRefs = ref.findAllMatchIn(py)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(gateRefs === Bench.LongBuildRefSec,
      "tools/bench_diff.py CROSS_ROUND_REFS build rows != Bench.LongBuildRefSec")
  }
}
