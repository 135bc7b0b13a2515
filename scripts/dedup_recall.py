"""Precision/recall curves for the dedup thresholds (VERDICT r04 #8).

The knobs a deployment tunes — MinHash `threshold` (estimated word-
3-gram Jaccard) and SimHash `max_hamming` — had no documented
operating curve.  This script plants a DETERMINISTIC near-dup ladder:
`bases` base documents of 60 words each (base-private vocabulary, so
cross-base similarity is exactly 0), and for each base a partner with a
ladder-controlled fraction of word positions substituted (positions
chosen by md5, no RNG).  Ground truth = exact word-3-gram Jaccard
(identical shingle definition to `minhash_signatures`) >= `gt_jaccard`.

For each MinHash threshold / SimHash hamming radius it reports
precision and recall of the detected pair set against that ground
truth.  Numbers land in BENCH.md; monotonicity + endpoint behavior are
pytest-pinned (`test_dedup_recall_ladder_monotone`).

Usage: python3 scripts/dedup_recall.py [bases]
"""
from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# substitution fractions: >= gt 0.5 on the left of the ladder, sliding
# under it on the right (3-gram jaccard decays ~3x faster than the word
# substitution rate)
LADDER = [0.0, 0.02, 0.04, 0.06, 0.08, 0.10, 0.14, 0.20, 0.30, 0.50]
WORDS = 60


def _frac(s: str) -> float:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                          "little") / float(1 << 64)


def build_ladder(bases: int):
    """[(doc_id, text)], plus planted partner map {base: (id_a, id_b)}."""
    rows, pairs = [], {}
    for i in range(bases):
        rate = LADDER[i % len(LADDER)]
        a = [f"b{i}x{j}" for j in range(WORDS)]
        b = [f"m{i}x{j}" if _frac(f"sub-{i}-{j}") < rate else a[j]
             for j in range(WORDS)]
        rows.append((2 * i, " ".join(a)))
        rows.append((2 * i + 1, " ".join(b)))
        pairs[i] = (2 * i, 2 * i + 1)
    return rows, pairs


def exact_jaccard(ta: str, tb: str, k: int = 3) -> float:
    from geonames_rdf_spark.operators.dedup import _shingles

    sa, sb = _shingles(ta, k), _shingles(tb, k)
    return len(sa & sb) / len(sa | sb) if sa | sb else 1.0


def sweep(spark, docs, truth: set, minhash_ts, hammings):
    from pyspark.sql import functions as F

    from geonames_rdf_spark.operators import dedup

    out = {"minhash": [], "simhash": []}
    base = dedup.minhash_near_dups(docs, threshold=0.0).collect()
    for t in minhash_ts:
        got = {(r.id_a, r.id_b) for r in base if r.est_jaccard >= t}
        tp = len(got & truth)
        out["minhash"].append({
            "threshold": t, "detected": len(got),
            "precision": round(tp / len(got), 3) if got else None,
            "recall": round(tp / len(truth), 3)})
    for h in hammings:
        got = {(r.id_a, r.id_b)
               for r in dedup.simhash_near_dups(docs, max_hamming=h)
               .collect()}
        tp = len(got & truth)
        out["simhash"].append({
            "max_hamming": h, "detected": len(got),
            "precision": round(tp / len(got), 3) if got else None,
            "recall": round(tp / len(truth), 3)})
    return out


def main() -> None:
    bases = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    gt_jaccard = 0.5

    from geonames_rdf_spark.session import get_spark

    spark = get_spark()
    rows, pairs = build_ladder(bases)
    texts = dict(rows)
    truth = {pairs[i] for i in pairs
             if exact_jaccard(texts[pairs[i][0]], texts[pairs[i][1]])
             >= gt_jaccard}
    planted_j = {i: round(exact_jaccard(texts[pairs[i][0]],
                                        texts[pairs[i][1]]), 3)
                 for i in range(min(len(LADDER), bases))}
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    result = sweep(spark, docs, truth,
                   minhash_ts=[0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9],
                   hammings=[0, 1, 2, 3, 4, 6, 8])
    print(json.dumps({"bases": bases, "gt_jaccard": gt_jaccard,
                      "ladder_exact_jaccard_first_cycle": planted_j,
                      "true_pairs": len(truth), **result}))


if __name__ == "__main__":
    main()
