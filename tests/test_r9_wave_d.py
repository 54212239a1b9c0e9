"""Independent-recomputation properties for the round-9 wave-D keys
(corpus boilerplate segments, script profile, intrinsic dimension)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def test_boilerplate_segments_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    seg_docs = defaultdict(set)
    doc_segs = {}
    for doc_id, source, text in rows:
        ws = text.split(" ")
        segs = [
            hashlib.md5(" ".join(ws[i : i + 8]).encode()).hexdigest()
            for i in range(0, len(ws), 8)
        ]
        doc_segs[doc_id] = (source, segs)
        for h in segs:
            seg_docs[h].add(doc_id)
    per_source = defaultdict(lambda: [0, 0, 0, 0.0, 0])
    for doc_id, (source, segs) in doc_segs.items():
        n_bp = sum(1 for h in segs if len(seg_docs[h]) >= 3)
        st = per_source[source]
        st[0] += 1
        st[1] += len(segs)
        st[2] += n_bp
        st[3] += math.floor(n_bp / len(segs) * 1e9 + 0.5) / 1e9
        st[4] += 1 if 2 * n_bp >= len(segs) else 0
    got = {
        r["source"]: r
        for r in REGISTRY["text_boilerplate_segments"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(per_source)
    for src, (nd, ns, nb, fsum, nmaj) in per_source.items():
        row = got[src]
        assert row["n_docs"] == nd
        assert row["n_segments"] == ns
        assert row["n_boilerplate"] == nb
        assert abs(row["avg_bp_fraction"] - fsum / nd) < 2e-4
        assert row["n_docs_majority_bp"] == nmaj
        # fraction bounds
        assert 0.0 <= row["avg_bp_fraction"] <= 1.0


def test_script_profile_matches_python(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    per_lang = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for lang, text in rows:
        st = per_lang[lang]
        st[0] += 1
        st[1] += len(text)
        st[2] += len(re.findall(r"[a-zA-Z]", text))
        st[3] += len(re.findall(r"[0-9]", text))
        st[4] += len(re.findall(r"[ \t\r\n]", text))
        st[5] += len(re.findall(r"[!-/:-@\[-`{-~]", text))
    got = {
        r["lang"]: r
        for r in REGISTRY["text_unicode_script_profile"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(per_lang)
    for lang, (nd, nc, nl, ndig, nsp, npct) in per_lang.items():
        row = got[lang]
        assert row["n_docs"] == nd and row["n_chars"] == nc
        assert abs(row["frac_letter"] - nl / nc) < 2e-4
        assert abs(row["frac_digit"] - ndig / nc) < 2e-4
        assert abs(row["frac_space"] - nsp / nc) < 2e-4
        assert abs(row["frac_punct"] - npct / nc) < 2e-4
        other = (nc - nl - ndig - nsp - npct) / nc
        assert abs(row["frac_other"] - other) < 2e-4
        assert row["script_mismatch"] == (other > 0.2)
        # the five fractions partition the text
        total = (
            row["frac_letter"]
            + row["frac_digit"]
            + row["frac_space"]
            + row["frac_punct"]
            + row["frac_other"]
        )
        assert abs(total - 1.0) < 5e-4


def test_intrinsic_dim_matches_numpy(spark, sf_dir):
    rows = duckdb.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    V = {vid: np.array(e, dtype=np.float64) for vid, e in rows}
    ids = []
    k = 10
    for qid, qe in V.items():
        if qid % 25 != 0:
            continue
        d2 = sorted(
            (float(((qe - ce) ** 2).sum()), cid)
            for cid, ce in V.items()
            if cid != qid and ((qe - ce) ** 2).sum() > 0
        )[:k]
        dk = d2[-1][0]
        lnsum = sum(math.log(dk / dj) for dj, _ in d2[:-1])
        ids.append(2.0 * (k - 1) / lnsum)
    idq = [math.floor(v * 1e6 + 0.5) / 1e6 for v in ids]
    row = REGISTRY["embed_intrinsic_dim"].build(spark, sf_dir).collect()[0]
    assert row["n_anchors"] == len(ids)
    assert row["k"] == k
    assert abs(row["mean_intrinsic_dim"] - sum(idq) / len(idq)) < 2e-4
    assert abs(row["min_id"] - min(idq)) < 2e-4
    assert abs(row["max_id"] - max(idq)) < 2e-4
    # ID of a 64-dim embedding must be positive and cannot exceed ~64
    # by much more than estimator noise
    assert 0 < row["mean_intrinsic_dim"] < 100
