#!/usr/bin/env python3
"""Cross-artifact bench coherence check (VERDICT r13 #7).

r13 produced two same-HEAD bench artifacts that disagreed 2-3.6x on
disjoint row sets, and adjudicating that cost the judge real work. This
tool diffs two bench JSONs, canary-normalizes the time-valued rows, and
flags everything still >1.5x apart — turning the adjudication into one
command:

    python3 tools/bench_diff.py bench_latest.json BENCH_r13.json

Accepted input shapes (auto-detected):
  - the full artifact graft.Bench writes (bench_latest.json),
  - the compact stdout line (same keys, abbreviated names — aliased),
  - the driver's BENCH_rN.json wrapper: uses its "parsed" block, or
    salvage-parses the (possibly mid-JSON-truncated) "tail" text.

Canary normalization: each artifact carries a frozen single-thread
kernel p50 that moves only with the machine. For time-valued rows
(sec / ms) the expected cross-artifact factor is canaryB/canaryA; for
throughput rows (qps / per_sec) its inverse. A row is flagged when its
ratio exceeds 1.5x the canary-expected factor in either direction.
Recall/fraction rows are compared absolutely (flag at |diff| > 0.05).
"""
import json, re, sys

FLAG_RATIO = 1.5
RECALL_DIFF = 0.05

# compact-line key -> full-artifact key (per nested block)
ALIASES = {
    "p50_ms": "single_query_p50_ms",
    "ivf_p50_ms": "ivf_serving_p50_ms",
    "pq_qps": "pq_adc_qps",
    "pq_recall": "pq_refined_score_recall_at_10",
    "pq_ref_qps": "pq_refined_qps",
    "pq_regret": "pq_kth_score_regret",
    "pq_p50_ms": "pq_serving_p50_ms",
    "probes": "n_probe",
    "rf": "refine_factor",
    # r17-and-earlier knn compact keys
    "ivf_recall": "ivf_score_recall_at_10",
    "sq8_p50": "sq8_serving_p50_ms",
    "sq8_rec": "sq8_refined_score_recall_at_10",
    # r18 knn compact keys (VERDICT r17 #1 shrank the line; the full
    # names these map to are the bench_latest.json spellings)
    "xq": "exact_qps",
    "fq": "serving_fleet_qps",
    "ifq": "ivf_fleet_qps",
    "iq": "ivf_qps",
    "ir": "ivf_score_recall_at_10",
    "ivf_p50": "ivf_serving_p50_ms",
    "pqq": "pq_adc_qps",
    "pqr": "pq_refined_score_recall_at_10",
    "s8p": "sq8_serving_p50_ms",
    "s8r": "sq8_refined_score_recall_at_10",
    # hnsw compact keys (unaliased these ended in bare "_s", which
    # kind() classified as "skip" — build rows in compact/salvaged
    # artifacts were silently never compared)
    "build_s": "build_sec",
    "ref_build_s": "build_ref_m16_sec",
    "rec": "recall",
    # engine_100k compact keys (r18)
    "rest_p50": "rest_search_p50_ms",
    "ins_s": "insert_100k_sec",
    "sbuild_s": "serving_build_100k_sec",
    # knn_10m_pq compact keys (r18)
    "prq": "pq_refined_qps",
    "prec": "pq_refined_score_recall_at_10",
    "reg": "pq_kth_score_regret",
    "pb": "n_probe",
    # corpus_500k compact keys
    "curate_s": "curate_sec",
    "contam_s": "contamination_sec",
    "qual_s": "quality_filter_sec",
    "pii_s": "pii_redact_sec",
    "line_s": "line_dedup_sec",
    "surp_s": "surprisal_sec",
    "pack_s": "pack_sequences_sec",
    "span_s": "span_mask_sec",
    "span_h_s": "span_mask_hashed_sec",
    "nfc_s": "nfc_clean_sec",
    "bloom_s": "bloom_dedup_sec",
    "zord_s": "zorder_write_sec",
    "contam_h_s": "contam_hashed_sec",
    "dsir_s": "dsir_sec",
    "gopher_s": "gopher_sec",
    "c4_s": "c4_sec",
    "gopher_rep_s": "gopher_rep_sec",
    "substr_s": "substr_spans_sec",
    "html_s": "html_extract_sec",
    # events_5m compact keys
    "asof_s": "asof_join_sec",
    "range_s": "range_join_sec",
}

# Stored cross-round settled references (VERDICT r17 #2/#3): rows whose
# healthy value is known to creep across rounds with every SAME-RUN
# sentinel clean (hnsw_1m build 30.2 -> 38.1 s r16 -> r17 re-pair-clean
# both times; span tile 10.1 -> 16.3/17.8 s with an agreeing A/A pair).
# --gate checks artifact A (the candidate) against these: a row past
# ref x band that the artifact did NOT self-flag is a FATAL gate
# failure; a row below ref / band prints an update-the-ref note.
# Band 1.5 = DriftRatio everywhere else in the suite, and covers the
# box's observed same-code swing envelope (builds 30.2-38.1 = 1.26x;
# span settled 8.9-11.6 s across r14-r17 healthy runs). Provenance:
# docs/probes/span_refs_r18.txt (fresh settled probes at r18 HEAD) and
# the committed artifact history (BENCH_r16/r17 + docs/probes/bench_*).
# multimodal_decode_mpg: healthy 0.91-1.07 s across r15/r16/r18 runs
# (docs/probes/mpg_ref_r18.txt); the r17 published 4.6 s is the one
# outlier — the ref makes any future unflagged return there gate-fatal
# and retro-excuses the r17->r18 recovery pairwise flag.
CROSS_ROUND_REFS = {
    "hnsw_1m.build_sec": (34.7, 1.5),
    "knn_10m_pq.build_sec": (34.1, 1.5),
    "corpus_500k.span_mask_sec": (10.5, 1.5),
    "corpus_500k.span_mask_hashed_sec": (10.5, 1.5),
    "queries.multimodal_decode_mpg": (1.0, 1.5),
}


def salvage(tail):
    """Parse key:number pairs out of a possibly-truncated compact JSON
    line, preserving one level of {block:{...}} nesting."""
    flat = {}
    # nested blocks: "name":{...} (no deeper nesting in the compact line
    # except frontier lists, which we drop)
    for m in re.finditer(r'"([a-z0-9_]+)":\{(.*?)\}(?=,"|\}|$)', tail, re.S):
        block, body = m.group(1), m.group(2)
        body = re.sub(r'\[[^\]]*\]', '[]', body)  # strip lists
        for km in re.finditer(r'"([a-z0-9_]+)":(-?\d+(?:\.\d+)?)', body):
            flat[f"{block}.{km.group(1)}"] = float(km.group(2))
    # top-level scalars (before any block)
    head = tail.split('":{', 1)[0]
    for km in re.finditer(r'"([a-z0-9_]+)":(-?\d+(?:\.\d+)?)', head):
        flat[km.group(1)] = float(km.group(2))
    cm = re.search(r'"canary_ms":\[(\d+\.?\d*),(\d+\.?\d*)\]', tail)
    canary = min(float(cm.group(1)), float(cm.group(2))) if cm else None
    return flat, canary


def flatten(obj, prefix=""):
    flat = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            flat.update(flatten(v, f"{prefix}{k}." if prefix or isinstance(v, dict) else f"{k}."))
    return flat


def unify(flat):
    """slowest.* (compact) == queries.* (full); alias abbreviated keys."""
    out = {}
    for k, v in flat.items():
        parts = k.split(".")
        if parts[0] == "slowest":
            parts[0] = "queries"
        if len(parts) > 1 and parts[-1] in ALIASES:
            parts[-1] = ALIASES[parts[-1]]
        out[".".join(parts)] = v
    return out


def load(path):
    """-> (flat {key: number}, canary_p50_ms or None, label)"""
    d = json.load(open(path))
    if set(d.keys()) >= {"tail", "rc"}:  # driver wrapper
        if isinstance(d.get("parsed"), dict):
            return load_obj(d["parsed"], path)
        flat, canary = salvage(d.get("tail", ""))
        return unify(flat), canary, path + " (salvaged tail)"
    return load_obj(d, path)


def load_obj(d, label):
    flat = {}

    def walk(o, pre):
        if isinstance(o, dict):
            for k, v in o.items():
                walk(v, f"{pre}{k}" if not pre else f"{pre}.{k}")
        elif isinstance(o, (int, float)) and not isinstance(o, bool):
            flat[pre] = float(o)

    walk(d, "")
    canary = None
    c = d.get("canary")
    if isinstance(c, dict) and "kernel_p50_ms_start" in c:
        canary = min(c["kernel_p50_ms_start"], c.get("kernel_p50_ms_end", c["kernel_p50_ms_start"]))
    elif isinstance(d.get("canary_ms"), list) and d["canary_ms"]:
        canary = min(d["canary_ms"])
    return unify(flat), canary, label


def kind(key):
    leaf = key.rsplit(".", 1)[-1]
    if any(t in leaf for t in ("recall", "fraction", "regret", "ratio", "share")):
        return "abs"
    if any(t in leaf for t in ("qps", "per_sec")):
        return "throughput"
    if leaf.endswith("_sec") or leaf.endswith("_ms") or key.startswith("queries.") or leaf in ("value",):
        return "time"
    return "skip"  # counts, configs, flags


def drift_list(path):
    """Self-flagged drift rows from an artifact: full form carries
    "drift_blocks", the compact line and the driver wrapper's parsed
    block carry "drift". Entries are block names ("ann_ivf") or
    block:row ids ("corpus_500k:dsir", "hnsw_100k_d128:build")."""
    try:
        d = json.load(open(path))
    except Exception:
        return []
    if set(d.keys()) >= {"tail", "rc"} and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    out = d.get("drift_blocks") or d.get("drift") or []
    if isinstance(d.get("tail"), str):  # salvage path
        m = re.search(r'"drift":\[([^\]]*)\]', d["tail"])
        if m:
            out = [s.strip('" ') for s in m.group(1).split(",") if s.strip('" ')]
    return [str(x) for x in out if isinstance(x, str)]


# key-stem spelling variants for one measured row: the _docs_per_sec
# twins of two corpus rows drop the suffixed stem, and the d128 ref
# build has a config-qualified full name
_ROW_CANON = {
    "quality": "quality_filter",       # quality_docs_per_sec
    "pii": "pii_redact",               # pii_docs_per_sec
    "substr": "substr_spans",          # substr_docs_per_sec
    "html": "html_extract",            # html_docs_per_sec
    "build_ref_m16": "build_ref",      # hnsw_100k_d128 ref-config build
}


def _row_token(key):
    """The measured-row stem of a (unified, full-name) key: the leaf
    minus its unit/metric suffix, canonicalized across spelling
    variants of the same row."""
    leaf = key.rsplit(".", 1)[-1]
    for suf in ("_docs_per_sec", "_events_per_sec", "_per_sec",
                "_sec", "_qps", "_ms", "_s"):
        if leaf.endswith(suf):
            leaf = leaf[: -len(suf)]
            break
    return _ROW_CANON.get(leaf, leaf)


def excused_by(key, drift):
    """True if a flagged row belongs to a block (or block:row) either
    artifact self-flagged as drifted — the --gate mode's excuse rule:
    the sentinel machinery already marked those numbers non-evidentiary,
    so the cross-artifact gate must not double-count them.

    The block:row match is DELIMITER-AWARE (ADVICE r17): the flagged
    row must equal the key's row stem exactly — the old substring test
    let corpus_500k:span_mask excuse span_mask_hashed rows and
    hnsw_100k_d128:build excuse build_ref_m16_sec."""
    for d in drift:
        block, _, row = d.partition(":")
        if key == block or key.startswith(block + ".") \
                or key == f"queries.{block}":
            if not row:
                return True
            # cc_10m:episodic (and any future :episodic) marks the
            # whole block's measurement window, not one named row
            if row == "episodic":
                return True
            if _row_token(key) == row:
                return True
        # span_aa flags the corpus block's A/A pair (both twins — the
        # ratio is a property of the pair, not of one row)
        if d == "span_aa" and key.startswith("corpus_500k.") \
                and _row_token(key) in (
                    "span_mask", "span_mask_hashed", "span_aa_ratio"):
            return True
    return False


def check_cross_round_refs(fa, drift, gate):
    """VERDICT r17 #2/#3: judge artifact A's creep-prone rows against
    the stored settled references. Returns (fatal, excused, improved)
    row lists; only --gate treats breaches as fatal."""
    fatal, excused, improved = [], [], []
    for key, (ref, band) in sorted(CROSS_ROUND_REFS.items()):
        va = fa.get(key)
        if va is None or va <= 0:
            continue
        if va > ref * band:
            (excused if (gate and excused_by(key, drift)) else fatal).append(
                (key, va, ref, va / ref))
        elif va < ref / band:
            improved.append((key, va, ref, va / ref))
    return fatal, excused, improved


def main():
    gate = "--gate" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--gate"]
    if len(argv) != 2:
        sys.exit(__doc__ + "\n\n--gate: same diff, but rows inside blocks either "
                 "artifact SELF-FLAGGED as drift are excused (printed, not "
                 "fatal); exit 1 only on unflagged disagreements (VERDICT r16 #6).")
    sys.argv[1:3] = argv
    (fa, ca, la), (fb, cb, lb) = load(sys.argv[1]), load(sys.argv[2])
    drift = drift_list(sys.argv[1]) + drift_list(sys.argv[2]) if gate else []
    # retroactive adjudication via the stored references: if the OLD
    # artifact (B) breaches a CROSS_ROUND_REF band, B was the drifted
    # side — a pairwise disagreement on that row is A recovering, not
    # A regressing, and must not fail the gate (the r17 span rows were
    # published unflagged at 1.55-1.70x of the settled reference;
    # the round that fixed the guard should not fail its own gate on
    # the recovery)
    b_ref_breaches = {k for k, (ref, band) in CROSS_ROUND_REFS.items()
                      if gate and fb.get(k, 0) > ref * band}
    factor = (cb / ca) if (ca and cb) else 1.0
    print(f"A = {la}  (canary {ca if ca else '?'} ms)")
    print(f"B = {lb}  (canary {cb if cb else '?'} ms)")
    print(f"canary-expected time factor B/A = {factor:.3f}"
          + ("" if ca and cb else "  [no canary on one side — factor 1.0]"))
    shared = sorted(set(fa) & set(fb))
    flagged, compared = [], 0
    for k in shared:
        va, vb = fa[k], fb[k]
        kd = kind(k)
        if kd == "skip" or va <= 0 or vb <= 0:
            if kd == "abs" and abs(va - vb) > RECALL_DIFF:
                flagged.append((k, va, vb, abs(va - vb), "abs"))
            continue
        if kd == "abs":
            compared += 1
            if abs(va - vb) > RECALL_DIFF:
                flagged.append((k, va, vb, abs(va - vb), "abs"))
            continue
        compared += 1
        expected = factor if kd == "time" else 1.0 / factor
        ratio = (vb / va) / expected
        if ratio > FLAG_RATIO or ratio < 1.0 / FLAG_RATIO:
            flagged.append((k, va, vb, ratio, kd))
    def ref_excuse(key):
        # same-row spelling variants: a stored-ref breach on
        # corpus_500k.span_mask_sec also covers span_mask_docs_per_sec
        return any(key.split(".")[0] == rk.split(".")[0]
                   and _row_token(key) == _row_token(rk)
                   for rk in b_ref_breaches)
    excused = [f for f in flagged
               if excused_by(f[0], drift) or ref_excuse(f[0])]
    fatal = [f for f in flagged if f not in excused]
    print(f"\n{compared} shared numeric rows compared; {len(flagged)} flagged (>|{FLAG_RATIO}x| canary-normalized, or recall diff > {RECALL_DIFF}):\n")
    if not flagged:
        print("  COHERENT — no row disagrees beyond the canary-expected factor.")
    for k, va, vb, r, kd in sorted(fatal, key=lambda x: -(x[3] if x[4] != "abs" else 99)):
        unit = "norm-ratio" if kd != "abs" else "abs-diff"
        print(f"  {k:<55} A={va:<12g} B={vb:<12g} {unit}={r:.2f} [{kd}]")
    if gate and excused:
        # keep the two excuse provenances distinct in the ledger: a
        # SELF-FLAG means the artifact's own sentinels marked the row
        # non-evidentiary; a RETRO-excuse means the OLD artifact (B)
        # breached a stored settled reference, so the disagreement is
        # A recovering, not A regressing
        by_drift = [f for f in excused if excused_by(f[0], drift)]
        by_ref = [f for f in excused if f not in by_drift]
        if by_drift:
            print(f"\n  excused by self-flagged drift {sorted(set(drift))}:")
            for k, va, vb, r, kd in by_drift:
                unit = "norm-ratio" if kd != "abs" else "abs-diff"
                print(f"    {k:<53} A={va:<12g} B={vb:<12g} {unit}={r:.2f} [excused]")
        if by_ref:
            print(f"\n  retro-excused — OLD artifact (B) breaches a stored settled ref"
                  f" {sorted(b_ref_breaches)}:")
            for k, va, vb, r, kd in by_ref:
                unit = "norm-ratio" if kd != "abs" else "abs-diff"
                print(f"    {k:<53} A={va:<12g} B={vb:<12g} {unit}={r:.2f} [B drifted]")
    # stored-reference check on artifact A, the candidate (VERDICT r17
    # #2/#3): creep that is re-pair-clean WITHIN each run has no
    # same-run twin to catch it — these rows are judged against
    # committed settled references with a documented noise band
    ref_fatal, ref_excused, ref_improved = check_cross_round_refs(fa, drift, gate)
    if ref_fatal or ref_excused or ref_improved:
        print("\nstored cross-round references (fatal past ref x band, see CROSS_ROUND_REFS):")
        for k, va, ref, r in ref_fatal:
            print(f"  {k:<55} A={va:<10g} ref={ref:<8g} x{r:.2f} [OVER, unflagged{' — FATAL' if gate else ''}]")
        for k, va, ref, r in ref_excused:
            print(f"  {k:<55} A={va:<10g} ref={ref:<8g} x{r:.2f} [over, self-flagged — excused]")
        for k, va, ref, r in ref_improved:
            print(f"  {k:<55} A={va:<10g} ref={ref:<8g} x{r:.2f} [improved — update the stored ref]")
    if gate:
        fatal_n = len(fatal) + len(ref_fatal)
        print(f"\nGATE: {'PASS' if not fatal_n else 'FAIL'} — "
              f"{len(fatal)} unflagged disagreement(s), {len(excused)} excused, "
              f"{len(ref_fatal)} stored-ref breach(es)")
        sys.exit(1 if fatal_n else 0)
    sys.exit(1 if fatal else 0)


if __name__ == "__main__":
    main()
