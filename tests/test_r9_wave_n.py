"""Independent-recomputation properties for the round-9 wave-N keys
(Gehan-Wilcoxon survival test, exact Shapley attribution)."""

from __future__ import annotations

import math
from collections import defaultdict
from itertools import permutations

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_gehan_wilcoxon_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT user_id % 2,
               min(CAST(ts AS DATE)),
               min(CASE WHEN event_type = 'purchase'
                   THEN CAST(ts AS DATE) END),
               max(CAST(ts AS DATE))
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
    """).fetchall()
    subjects = []
    for grp, entry, p_day, last in rows:
        if p_day is not None:
            subjects.append(((p_day - entry).days, grp, True))
        else:
            subjects.append(((last - entry).days, grp, False))
    grid = defaultdict(lambda: [0, 0, 0, 0])  # d1 d0 a1 a0
    for t, g, dead in subjects:
        cell = grid[t]
        cell[2 + (1 - g)] += 1
        if dead:
            cell[1 - g] += 1
    nu1 = sum(c[2] for c in grid.values())
    nu0 = sum(c[3] for c in grid.values())
    n1, n0 = nu1, nu0
    oe = 0
    v = 0
    for t in sorted(grid):
        d1, d0, a1, a0 = grid[t]
        if d1 + d0 > 0 and n1 > 0 and n0 > 0:
            nn = n1 + n0
            dd = d1 + d0
            oe += math.floor(nn * (d1 - dd * n1 / nn) * 1e9 + 0.5)
            if nn > 1:
                v += math.floor(
                    nn * nn * dd * n1 * n0 * (nn - dd) / nn / nn / (nn - 1)
                    * 1e9 + 0.5
                )
        n1 -= a1
        n0 -= a0
    row = REGISTRY["events_gehan_wilcoxon"].build(spark, sf_dir).collect()[0]
    assert (row["n_grp1"], row["n_grp0"]) == (nu1, nu0)
    assert abs(row["weighted_oe"] - oe / 1e9) < max(1e-3, abs(oe / 1e9) * 1e-4)
    if v > 0:
        z = (oe / 1e9) / math.sqrt(v / 1e9)
        assert abs(row["z"] - z) < 5e-3
        assert row["rejected"] == (abs(z) > 1.96)
    else:
        # degenerate fixture (a group empty or no uncensored deaths):
        # the variance fold is 0 and z is NULL/NaN on both engines
        assert row["z"] is None or math.isnan(row["z"])


def test_shapley_attribution_matches_python(spark, sf_dir):
    rows = duckdb.execute(f"""
        SELECT user_id, event_type, ts FROM '{sf_dir}/events.parquet'
    """).fetchall()
    first_p = {}
    for uid, et, ts in rows:
        if et == "purchase" and (uid not in first_p or ts < first_p[uid]):
            first_p[uid] = ts
    touch_sets = defaultdict(set)
    for uid, et, ts in rows:
        if uid in first_p and et != "purchase" and ts < first_p[uid]:
            touch_sets[uid].add(et)
    per_ch = defaultdict(lambda: [0, 0])
    for uid, chans in touch_sets.items():
        for c in chans:
            per_ch[c][0] += 1
            per_ch[c][1] += math.floor(1 / len(chans) * 1e9 + 0.5)
    got = {
        r["channel"]: r
        for r in REGISTRY["events_attribution_shapley"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(per_ch)
    totq = sum(sq for _, sq in per_ch.values())
    for c, (nt, sq) in per_ch.items():
        row = got[c]
        assert row["conversions_touched"] == nt
        assert abs(row["shapley_credit"] - sq / 1e9) < 2e-4
        assert abs(row["credit_share"] - sq / totq) < 2e-4
        assert row["n_conv"] == len(touch_sets)
        assert row["n_unattributed"] == len(first_p) - len(touch_sets)
    # efficiency: credits sum to the number of attributed conversions
    total_credit = sum(r["shapley_credit"] for r in got.values())
    assert abs(total_credit - len(touch_sets)) < 1e-3


def test_equal_split_is_the_subset_game_shapley():
    """Brute-force check of the closed form: for the characteristic
    function v(S) = conversions with touch set a subset of S, the
    exact permutation-average Shapley value equals equal-split."""
    convs = [
        frozenset({"a"}),
        frozenset({"a", "b"}),
        frozenset({"b", "c"}),
        frozenset({"a", "b", "c"}),
        frozenset({"c"}),
    ]
    players = ["a", "b", "c"]

    def v(S):
        S = set(S)
        return sum(1 for t in convs if t <= S)

    shap = dict.fromkeys(players, 0.0)
    perms = list(permutations(players))
    for order in perms:
        seen = []
        for p in order:
            before = v(seen)
            seen.append(p)
            shap[p] += (v(seen) - before) / len(perms)
    for p in players:
        expected = sum(1 / len(t) for t in convs if p in t)
        assert abs(shap[p] - expected) < 1e-12
