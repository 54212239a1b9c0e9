#!/usr/bin/env python
"""Per-query bench regression gate (VERDICT r01 task #5).

Compares a BENCH_r{N}.json (or a fresh `python bench.py` output line)
against the frozen per-query baseline in BASELINE.md and renders the
ratio table the judge reads; exits 1 if ANY query (not just the
total) exceeds the 2x gate.

Usage:
  python tools/bench_compare.py BENCH_r02.json        # a driver record
  python bench.py | python tools/bench_compare.py -   # fresh run
"""

from __future__ import annotations

import json
import sys

# Frozen per-query baseline (BASELINE.md table, commit 5b5ec4a@sf0.1),
# extended in round 4 with the heavy representatives added to the
# bench set (BASELINE.md "Round-4 re-freeze"; commit 227a6cb@sf0.1).
# The original six keep their r1-frozen values — the 2× gate on them
# is unchanged; the three additions are gated against their own
# first-measurement freeze.
BASELINE = {
    "agg_groupby": 0.656,
    "join_multiway": 0.789,
    "topk_per_group": 0.202,
    "stream_tumbling": 0.247,
    "sim_topk_exact": 1.675,
    "text_stats": 0.288,
    # round-4 freeze
    "events_rfm": 2.403,
    "tpch_q21": 1.250,
    "dedup_minhash_relational": 0.987,
    # round-5 freeze (BASELINE.md "Round-5 re-freeze"): first
    # measurement at HEAD for the retrieval and passage-dedup
    # families, previously unrepresented in the bench set
    "sim_hybrid_rrf": 1.489,
    "dedup_substring_spans": 1.519,
    # round-6 freeze (BASELINE.md "Round-6 re-freeze"): iterative
    # pointer-jumping components representative
    "text_near_dup_cluster": 2.39,
    # round-7 freeze (BASELINE.md "Round-7 re-freeze"): Arrow-batched
    # multimodal decode/segmentation representative
    "multimodal_energy_segments": 0.774,
    # round-8 freeze (BASELINE.md "Round-8 re-freeze"): the ECDF-grid
    # prefix-machine representative
    "stat_wasserstein_1d": 1.009,
    # round-9 freeze (BASELINE.md "Round-9 re-freeze"): the dense
    # 2-D dominance-grid survival representative (VERDICT r14 caught
    # this entry missing — the tool gated 14 of the 15 bench queries
    # and divided a 15-query total by a 14-query baseline)
    "ml_survival_cindex": 0.862,
}
BASELINE_TOTAL = round(sum(BASELINE.values()), 3)  # 16.540 (15 queries)
GATE = 2.0


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "-"
    raw = sys.stdin.read() if src == "-" else open(src).read()
    # accept a driver BENCH_r{N}.json wrapper, a bare bench.py JSON
    # line, or bench.py output with leading log noise
    bench = None
    try:
        doc = json.loads(raw)
        bench = doc.get("parsed", doc) if isinstance(doc, dict) else None
    except json.JSONDecodeError:
        for line in raw.strip().splitlines():
            try:
                bench = json.loads(line)
            except json.JSONDecodeError:
                continue
    if not bench or "queries" not in bench:
        print("no bench JSON found in input", file=sys.stderr)
        return 2

    rows, worst = [], 0.0
    for q, base in BASELINE.items():
        cur = bench["queries"].get(q)
        if cur is None:
            rows.append((q, base, None, None, "MISSING"))
            worst = max(worst, GATE + 1)
            continue
        ratio = cur / base
        worst = max(worst, ratio)
        flag = "OVER-2x" if ratio > GATE else ("warn" if ratio > 1.5 else "ok")
        rows.append((q, base, cur, ratio, flag))
    total = bench.get("value", sum(v for _, _, v, _, _ in rows if v))
    total_ratio = total / BASELINE_TOTAL

    print(f"| query | baseline s | current s | ratio | gate({GATE}x) |")
    print("|---|---|---|---|---|")
    for q, base, cur, ratio, flag in rows:
        cur_s = f"{cur:.3f}" if cur is not None else "-"
        ratio_s = f"{ratio:.2f}x" if ratio is not None else "-"
        print(f"| {q} | {base:.3f} | {cur_s} | {ratio_s} | {flag} |")
    print(
        f"| **total** | {BASELINE_TOTAL:.3f} | {total:.3f} "
        f"| {total_ratio:.2f}x | {'OVER-2x' if total_ratio > GATE else 'ok'} |"
    )
    return 1 if worst > GATE or total_ratio > GATE else 0


if __name__ == "__main__":
    sys.exit(main())
