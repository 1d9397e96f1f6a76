#!/usr/bin/env python3
"""Testdata schema-drift canary (VERDICT r8 #7).

Round 8 lost seven oracle entries because /root/testdata was regenerated
mid-round with `events.ts` flipped from INT64 nanoseconds to
timestamp[us] — and nothing noticed until queries died at bench time.
This pre-flight diffs every testdata table's parquet schema against the
committed snapshot so a regeneration fails loudly in the verify flow.

    python3 tools/check_schemas.py            # check all SFs, exit 1 on drift
    python3 tools/check_schemas.py --update   # rewrite the snapshot

Snapshot: tools/testdata_schemas.json  {table: {field: type_str}}.
Schemas must also agree across SF dirs (same generator ⇒ same schema).
"""
import json, os, sys
import pyarrow.parquet as pq

SNAP = os.path.join(os.path.dirname(__file__), "testdata_schemas.json")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def live(sf_dir):
    out = {}
    for t in TABLES:
        s = pq.read_schema(f"{sf_dir}/{t}.parquet")
        out[t] = {f.name: str(f.type) for f in s}
    return out

def main():
    if "--update" in sys.argv:
        json.dump(live(SF_DIRS[1]), open(SNAP, "w"), indent=1, sort_keys=True)
        print(f"SCHEMA-SNAPSHOT written: {SNAP}")
        return
    snap = json.load(open(SNAP))
    drifted = False
    for sf_dir in SF_DIRS:
        cur = live(sf_dir)
        for t in TABLES:
            if cur[t] != snap.get(t):
                drifted = True
                want, got = snap.get(t, {}), cur[t]
                for col in sorted(set(want) | set(got)):
                    if want.get(col) != got.get(col):
                        print(f"SCHEMA-DRIFT {sf_dir}/{t}.parquet "
                              f"col={col} snapshot={want.get(col)} live={got.get(col)}")
    if drifted:
        sys.exit("SCHEMA-DRIFT detected — testdata was regenerated; re-run "
                 "verify end-to-end, fix any type-brittle sites (see "
                 "graft.functions.EventTime), then tools/check_schemas.py --update")
    print(f"schemas ok ({len(TABLES)} tables x {len(SF_DIRS)} SFs match snapshot)")

if __name__ == "__main__":
    main()
