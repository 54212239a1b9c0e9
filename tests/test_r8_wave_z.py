"""Independent-recomputation properties for the round-8 wave-Z keys
(two-way ANOVA, simplified silhouette, frequency moments)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_two_way_anova_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        "SELECT l_returnflag, l_linestatus,"
        " CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) / 100.0"
        f" FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    y = np.array([r[2] for r in rows])
    a = np.array([r[0] for r in rows])
    b = np.array([r[1] for r in rows])
    gm = y.mean()
    nt = len(y)
    ka, kb = len(set(a)), len(set(b))
    cells = sorted({(x, z) for x, z in zip(a, b)})
    ss_cells = sum(
        (m := (a == x) & (b == z)).sum() * (y[m].mean() - gm) ** 2
        for x, z in cells
    )
    ss_a = sum((m := a == x).sum() * (y[m].mean() - gm) ** 2 for x in set(a))
    ss_b = sum((m := b == z).sum() * (y[m].mean() - gm) ** 2 for z in set(b))
    ss_t = ((y - gm) ** 2).sum()
    ss_w = ss_t - ss_cells
    ss_ab = ss_cells - ss_a - ss_b
    ms_w = ss_w / (nt - len(cells))
    row = REGISTRY["stat_two_way_anova"].build(spark, sf_dir).collect()[0]
    assert row["n"] == nt and row["ka"] == ka and row["kb"] == kb
    assert abs(row["f_a"] - ss_a / (ka - 1) / ms_w) < max(
        2e-3, 1e-4 * abs(row["f_a"])
    )
    assert abs(row["f_b"] - ss_b / (kb - 1) / ms_w) < max(
        2e-3, 1e-4 * abs(row["f_b"])
    )
    assert abs(
        row["f_ab"] - ss_ab / ((ka - 1) * (kb - 1)) / ms_w
    ) < max(2e-3, 1e-4 * abs(row["f_ab"]))
    assert abs(row["eta2_a"] - ss_a / ss_t) < 2e-4
    assert abs(row["eta2_b"] - ss_b / ss_t) < 2e-4
    assert abs(row["eta2_ab"] - ss_ab / ss_t) < 2e-4
    # effect sizes partition at most the total variance
    assert row["eta2_a"] + row["eta2_b"] + row["eta2_ab"] <= 1.0 + 1e-9


def test_silhouette_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    labels = np.array([r[1] for r in rows])
    emb = np.array([r[2] for r in rows], dtype=np.float64)
    embq = np.floor(emb * 1e6 + 0.5)
    cents = {}
    for lab in np.unique(labels):
        m = labels == lab
        cents[lab] = embq[m].sum(axis=0) / 1e6 / m.sum()
    sil_by_label = defaultdict(list)
    for i in range(len(rows)):
        d = {
            lab: float(np.sqrt(((emb[i] - c) ** 2).sum()))
            for lab, c in cents.items()
        }
        a = d[labels[i]]
        bdist = min(v for lab, v in d.items() if lab != labels[i])
        s = (bdist - a) / max(a, bdist)
        sil_by_label[int(labels[i])].append(
            np.floor(s * 1e9 + 0.5) / 1e9
        )
    got = {
        r["label"]: r
        for r in REGISTRY["ml_silhouette_simplified"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(sil_by_label)
    for lab, sils in sil_by_label.items():
        row = got[lab]
        assert row["n"] == len(sils)
        assert abs(row["mean_silhouette"] - np.mean(sils)) < 2e-4
        assert row["n_misplaced"] == sum(1 for s in sils if s < 0)
        assert -1.0 <= row["mean_silhouette"] <= 1.0


def test_frequency_moments_match_python(spark, sf_dir):
    keys = [
        r[0]
        for r in duckdb.execute(
            f"SELECT l_partkey FROM '{sf_dir}/lineitem.parquet'"
        ).fetchall()
    ]
    c = Counter(keys)
    f0 = len(c)
    f1 = sum(c.values())
    f2 = sum(v * v for v in c.values())
    f3 = sum(v**3 for v in c.values())
    row = REGISTRY["agg_frequency_moments"].build(spark, sf_dir).collect()[0]
    assert row["f0"] == f0 and row["f1"] == f1
    assert row["f2"] == f2 and row["f3"] == f3
    assert row["f_inf"] == max(c.values())
    assert abs(row["gini_simpson"] - (1 - f2 / f1**2)) < 2e-4
    assert abs(row["skew_factor"] - (f2 / f0) / (f1 / f0) ** 2) < 2e-4
    # moment hierarchy: F2/F1 >= F1/F0 (Cauchy-Schwarz)
    assert f2 * f0 >= f1 * f1
