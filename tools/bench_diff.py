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


def excused_by(key, drift):
    """True if a flagged row belongs to a block (or block:row) either
    artifact self-flagged as drifted — the --gate mode's excuse rule:
    the sentinel machinery already marked those numbers non-evidentiary,
    so the cross-artifact gate must not double-count them."""
    for d in drift:
        block, _, row = d.partition(":")
        if key == block or key.startswith(block + ".") \
                or key == f"queries.{block}":
            if not row or row in key:
                return True
        # span_aa flags the corpus block's A/A pair
        if d == "span_aa" and key.startswith("corpus_500k.span_"):
            return True
    return False


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
    excused = [f for f in flagged if excused_by(f[0], drift)]
    fatal = [f for f in flagged if not excused_by(f[0], drift)]
    print(f"\n{compared} shared numeric rows compared; {len(flagged)} flagged (>|{FLAG_RATIO}x| canary-normalized, or recall diff > {RECALL_DIFF}):\n")
    if not flagged:
        print("  COHERENT — no row disagrees beyond the canary-expected factor.")
    for k, va, vb, r, kd in sorted(fatal, key=lambda x: -(x[3] if x[4] != "abs" else 99)):
        unit = "norm-ratio" if kd != "abs" else "abs-diff"
        print(f"  {k:<55} A={va:<12g} B={vb:<12g} {unit}={r:.2f} [{kd}]")
    if gate and excused:
        print(f"\n  excused by self-flagged drift {sorted(set(drift))}:")
        for k, va, vb, r, kd in excused:
            unit = "norm-ratio" if kd != "abs" else "abs-diff"
            print(f"    {k:<53} A={va:<12g} B={vb:<12g} {unit}={r:.2f} [excused]")
    if gate:
        print(f"\nGATE: {'PASS' if not fatal else 'FAIL'} — "
              f"{len(fatal)} unflagged disagreement(s), {len(excused)} excused")
    sys.exit(1 if fatal else 0)


if __name__ == "__main__":
    main()
