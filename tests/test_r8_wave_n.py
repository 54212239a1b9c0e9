"""Independent-recomputation properties for the round-8 wave-N keys
(t-closeness, md5-salted permutation test)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_t_closeness_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT c_nationkey, c_mktsegment,"
        " CAST(floor(c_acctbal / 1000) AS BIGINT)"
        f" FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    cells = Counter((n, s, b) for n, s, b in rows)
    groups = Counter((n, s) for n, s, _ in rows)
    bands = Counter(b for _, _, b in rows)
    n_all = len(rows)
    out = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in REGISTRY["etl_t_closeness"].build(spark, sf_dir).collect()
    }
    assert set(out) == set(groups)
    for (n, s), n_g in groups.items():
        tv = 0.5 * sum(
            abs(cells.get((n, s, b), 0) / n_g - bands[b] / n_all)
            for b in bands
        )
        row = out[(n, s)]
        assert row["group_n"] == n_g
        assert abs(row["t_dist"] - tv) < 1e-3
        if abs(tv - 0.2) > 1e-9:  # away from the fence: verdict is exact
            assert row["t_close"] == (tv <= 0.2)
        assert 0.0 <= row["t_dist"] <= 1.0


def test_permutation_test_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT event_id, event_type,"
        " CAST(floor(value*100 + 0.5) AS BIGINT)"
        f" FROM '{sf_dir}/events.parquet'"
        " WHERE event_type IN ('click', 'purchase')"
    ).fetchall()

    def mean(vals):
        return sum(vals) / len(vals)

    g0 = [v for _, t, v in rows if t == "click"]
    g1 = [v for _, t, v in rows if t == "purchase"]
    obs = mean(g0) - mean(g1)
    n_geq = 0
    for salt in range(1, 21):
        buckets = defaultdict(list)
        for eid, _, v in rows:
            h = hashlib.md5(f"{salt}|{eid}".encode()).hexdigest()[:6]
            buckets[int(h, 16) % 2].append(v)
        d = mean(buckets[0]) - mean(buckets[1])
        if abs(d) >= abs(obs):
            n_geq += 1
    row = REGISTRY["stat_permutation_test"].build(spark, sf_dir).collect()[0]
    assert row["n_perms"] == 20
    assert abs(row["obs_diff"] - obs / 100.0) < 1e-3
    assert row["n_geq"] == n_geq
    assert abs(row["p_value"] - (n_geq + 1) / 21) < 1e-3
    # click vs purchase values are same-distributed in the fixture
    # generator, so the randomization test should not scream
    assert 0.0 < row["p_value"] <= 1.0
