"""Properties for the round-7 wave-K LLM-pipeline keys: contamination
ratios re-derived with plain Python sets, Mahalanobis OOD scores with
numpy."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_contamination_matches_python(spark, sf_dir):
    from etl_cnc_spark.llm.text import CONTAM_N

    rows = _con(sf_dir).execute(
        "SELECT doc_id, text FROM documents"
    ).fetchall()
    train: set[str] = set()
    eval_sh: dict[int, set[str]] = {}
    for doc_id, text in rows:
        w = text.split(" ")
        if len(w) < CONTAM_N:
            continue
        sh = {
            " ".join(w[i : i + CONTAM_N])
            for i in range(len(w) - CONTAM_N + 1)
        }
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16) % 10
        if b == 9:
            eval_sh[doc_id] = sh
        else:
            train |= sh
    got = {
        r["doc_id"]: r
        for r in REGISTRY["text_contamination_check"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(eval_sh)
    for doc_id, sh in eval_sh.items():
        hit = len(sh & train)
        assert got[doc_id]["n_shingles"] == len(sh)
        assert got[doc_id]["n_hit"] == hit
        assert abs(got[doc_id]["hit_ratio"] - hit / len(sh)) < 1e-4
        assert got[doc_id]["contaminated"] == (hit / len(sh) >= 0.2)


def test_mahalanobis_matches_numpy(spark, sf_dir):
    from etl_cnc_spark.llm.similarity import OOD_TOP

    rows = _con(sf_dir).execute(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    X = np.array([np.asarray(v, dtype=np.float64) for _, _, v in rows])
    mu = X.mean(axis=0)
    var = X.var(axis=0)
    d2 = (((X - mu) ** 2) / var).sum(axis=1)
    order = sorted(
        range(len(rows)), key=lambda i: (-d2[i], rows[i][0])
    )[:OOD_TOP]
    got = REGISTRY["embed_mahalanobis_ood"].build(spark, sf_dir).collect()
    assert len(got) == OOD_TOP
    for row, i in zip(got, order):
        assert row["vec_id"] == rows[i][0]
        assert row["label"] == rows[i][1]
        assert abs(row["maha_d2"] - d2[i]) < 1e-2
