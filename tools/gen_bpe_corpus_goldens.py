#!/usr/bin/env python3
"""Corpus-level BPE goldens — the value oracle for the `bpe_tokens`
correctness entry (VERDICT r8 #3: upgrade from rows-only).

Greedy BPE is not SQL-expressible, so the DuckDB oracle cannot recompute
it. Instead, this script runs the INDEPENDENT transcription of the
published algorithm (gen_bpe_goldens.py — Sennrich 2016 + subword-nmt
conventions, written from the paper, not from the Scala code) over each
/root/testdata documents corpus with the exact `bpe_tokens` query
hyperparameters (nMerges=50, maxVocab=5000, minPairFreq=2), and commits
the per-document results as a parquet the oracle SQL joins against:

    WITH fp AS (SELECT md5(string_agg(text, chr(31) ORDER BY doc_id)) AS m
                FROM documents)
    SELECT g.doc_id, g.n_tokens, g.first_token, g.tokens_md5
    FROM read_parquet('/root/repo/tools/bpe_corpus_goldens.parquet') g, fp
    WHERE g.corpus_md5 = fp.m ORDER BY g.doc_id

Keying on the corpus md5 (not the SF path) means: same corpus → same
golden rows wherever it lives; a REGENERATED corpus matches nothing →
the entry fails loudly with 0 oracle rows instead of silently grading
stale values. On regeneration: rerun this script, commit the parquet
(tools/check_schemas.py will have flagged the drift first).

Pre-tokenization parity with graft.textanalysis.Bpe: lowercase +
whitespace split. The testdata corpus is pure ASCII (checked here), so
Python str.lower()/str.split() and Spark lower()/split('\\s+') agree
exactly; the script refuses non-ASCII corpora rather than risk silent
locale divergence.
"""
import hashlib, os, sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_bpe_goldens import learn_bpe, encode_word

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "bpe_corpus_goldens.parquet")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
N_MERGES, MAX_VOCAB, MIN_PAIR_FREQ = 50, 5000, 2
SEP = "\x1f"  # unit separator, = chr(31) in the oracle SQL


def corpus_rows(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    for _, text in rows:
        if text is not None and any(ord(c) > 127 for c in text):
            sys.exit(f"{sf_dir}: non-ASCII text — lowercase parity with the "
                     "Spark side is no longer guaranteed; extend the parity "
                     "analysis before regenerating goldens")
    return rows


def golden_for(rows):
    texts = [t if t is not None else "" for _, t in rows]
    # fingerprint matches DuckDB's string_agg(text, chr(31)) EXACTLY:
    # string_agg skips NULL elements AND their separators, so join only
    # the non-null texts (a NULL-text corpus would otherwise never
    # match its golden)
    corpus_md5 = hashlib.md5(
        SEP.join(t for _, t in rows if t is not None).encode("utf-8")).hexdigest()
    freqs = Counter(w for t in texts for w in t.lower().split())
    # Bpe.train's vocab cap: top maxVocab by (count desc, word asc)
    capped = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_VOCAB]
    merges = learn_bpe(capped, N_MERGES, MIN_PAIR_FREQ)
    memo = {}
    out = []
    for doc_id, text in rows:
        toks = []
        for w in (text or "").lower().split():
            if w not in memo:
                memo[w] = encode_word(w, merges)
            toks.extend(memo[w])
        out.append({
            "corpus_md5": corpus_md5,
            "doc_id": doc_id,
            "n_tokens": len(toks),
            "first_token": toks[0] if toks else None,
            "tokens_md5": hashlib.md5(SEP.join(toks).encode("utf-8")).hexdigest(),
        })
    return corpus_md5, out


def main():
    seen, all_rows = set(), []
    for sf_dir in SF_DIRS:
        fp, rows = golden_for(corpus_rows(sf_dir))
        if fp in seen:
            print(f"{sf_dir}: corpus md5 {fp} already covered (identical corpus)")
            continue
        seen.add(fp)
        all_rows.extend(rows)
        print(f"{sf_dir}: corpus md5 {fp}, {len(rows)} docs, "
              f"sample n_tokens={rows[0]['n_tokens']}")
    schema = pa.schema([("corpus_md5", pa.string()), ("doc_id", pa.int64()),
                        ("n_tokens", pa.int32()), ("first_token", pa.string()),
                        ("tokens_md5", pa.string())])
    table = pa.Table.from_pylist(all_rows, schema=schema)
    pq.write_table(table, OUT)
    print(f"wrote {OUT}: {table.num_rows} rows, {len(seen)} corpora")


if __name__ == "__main__":
    main()
