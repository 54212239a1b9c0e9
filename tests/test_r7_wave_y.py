"""Properties for the round-7 wave-Y keys (min_by/max_by argextremes,
compression-quality bands, candidate periodogram) re-derived with
plain Python/numpy/zlib."""

from __future__ import annotations

import math
import zlib
from collections import defaultdict

import duckdb
import numpy as np

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_min_max_by_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT l_returnflag,"
        " CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),"
        " l_orderkey, l_linenumber FROM lineitem"
    ).fetchall()
    by = defaultdict(list)
    for f, c, k, ln in rows:
        by[f].append((c, k, ln))
    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_min_max_by"].build(spark, sf_dir).collect()
    }
    for f, vs in by.items():
        top = max(vs)
        bot = min(vs)
        r = got[f]
        assert r["top_orderkey"] == top[1]
        assert r["top_cents"] == top[0]
        assert r["bottom_orderkey"] == bot[1]
        assert r["bottom_cents"] == bot[0]


def test_compression_bands_match_zlib(spark, sf_dir):
    from etl_cnc_spark.llm.text import COMP_BANDS

    texts = [
        r[0]
        for r in _con(sf_dir).execute(
            "SELECT text FROM documents"
        ).fetchall()
    ]
    bands: dict[int, list[int]] = defaultdict(list)
    for t in texts:
        raw = t.encode("utf-8")
        pct = 100 * len(zlib.compress(raw, 6)) // max(1, len(raw))
        b = len(COMP_BANDS) - 2
        for i in range(len(COMP_BANDS) - 1):
            if pct < COMP_BANDS[i + 1]:
                b = i
                break
        bands[b].append(pct)
    got = {
        r["band"]: r
        for r in REGISTRY["text_compression_quality"]
        .build(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(bands)
    for b, pcts in bands.items():
        assert got[b]["n_docs"] == len(pcts)
        assert got[b]["min_pct"] == min(pcts)
        assert got[b]["max_pct"] == max(pcts)


def test_periodogram_matches_numpy(spark, sf_dir):
    from etl_cnc_spark.operators.stats import PERIOD_HOURS

    rows = _con(sf_dir).execute(
        "SELECT date_trunc('hour', ts),"
        " sum(CAST(floor(value * 100 + 0.5) AS BIGINT))"
        " FROM events GROUP BY 1 ORDER BY 1"
    ).fetchall()
    y = np.array([float(v) for _, v in rows])
    n = len(y)
    xc = y - y.mean()
    t = np.arange(n)
    got = {
        r["period_h"]: r
        for r in REGISTRY["stat_periodogram"].build(spark, sf_dir).collect()
    }
    amps = {}
    for p in PERIOD_HOURS:
        th = 2 * math.pi * t / p
        c = (xc * np.cos(th)).sum()
        s = (xc * np.sin(th)).sum()
        amp = math.sqrt(c * c + s * s) / n
        amps[p] = amp
        assert got[p]["n"] == n
        assert abs(got[p]["amplitude_dollars"] - amp / 100) < 1e-2
    dom = max(amps, key=amps.get)
    assert got[dom]["is_dominant"]
    assert sum(1 for r in got.values() if r["is_dominant"]) == 1


def test_cluster_nmi_matches_numpy(spark, sf_dir):
    rows = _con2_embeddings(sf_dir).execute(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    n_total = len(rows)
    step = max(64, -(-n_total // 4096))
    cents = [(r[0], np.asarray(r[2], dtype=np.float64)) for r in rows
             if r[0] % step == 0]
    assign = {}
    for vid, label, emb in rows:
        x = np.asarray(emb, dtype=np.float64)
        best, bd = None, None
        for cid, ce in cents:
            d = ((x - ce) ** 2).sum()
            if bd is None or d < bd - 1e-12 or (abs(d - bd) <= 1e-12 and cid < best):
                best, bd = cid, d
        assign[vid] = (best, label)
    from collections import Counter

    cm = Counter(assign.values())
    n = sum(cm.values())
    cells = Counter(c for c, _ in assign.values())
    labels = Counter(l for _, l in assign.values())

    def H(counts):
        return -sum((c / n) * math.log(c / n) for c in counts.values())

    hc, hl, hj = H(cells), H(labels), H(cm)
    nmi = (hc + hl - hj) / math.sqrt(hc * hl)
    purity = sum(
        max(v for (cc, _), v in cm.items() if cc == c) for c in cells
    ) / n
    out = REGISTRY["ml_cluster_nmi"].build(spark, sf_dir).collect()[0]
    assert out["n_vecs"] == n
    assert out["n_cells"] == len(cells)
    assert abs(out["purity"] - purity) < 1e-3
    assert abs(out["nmi"] - nmi) < 1e-3
    assert 0.0 <= out["nmi"] <= 1.0 + 1e-9


def _con2_embeddings(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM"
        f" '{sf_dir}/embeddings.parquet'"
    )
    return con
