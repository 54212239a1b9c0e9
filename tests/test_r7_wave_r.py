"""Properties for the round-7 wave-R keys (haversine bands, HHI,
round-robin interleave) re-derived with plain Python/math."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("customer", "orders", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_haversine_matches_python(spark, sf_dir):
    keys = [
        r[0]
        for r in _con(sf_dir).execute(
            "SELECT c_custkey FROM customer"
        ).fetchall()
    ]
    lat0, lon0, R = 48.8566, 2.3522, 6371.0
    bands = defaultdict(list)
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        lat = (int(h[:6], 16) % 18000) / 100.0 - 90.0
        lon = (int(h[6:12], 16) % 36000) / 100.0 - 180.0
        km = (
            2.0
            * R
            * math.asin(
                math.sqrt(
                    math.sin(math.radians(lat - lat0) / 2.0) ** 2
                    + math.cos(math.radians(lat0))
                    * math.cos(math.radians(lat))
                    * math.sin(math.radians(lon - lon0) / 2.0) ** 2
                )
            )
        )
        bands[int(km // 2000)].append(km)
    got = {
        r["band"]: r
        for r in REGISTRY["fn_haversine"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(bands)
    for b, kms in bands.items():
        assert got[b]["n_cust"] == len(kms)
        assert abs(got[b]["min_km"] - min(kms)) < 1e-3
        assert abs(got[b]["max_km"] - max(kms)) < 1e-3


def test_herfindahl_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        """SELECT c.c_mktsegment, c.c_nationkey,
               sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2"""
    ).fetchall()
    by = defaultdict(dict)
    for seg, nat, cents in rows:
        by[seg][nat] = cents
    got = {
        r["c_mktsegment"]: r
        for r in REGISTRY["orders_herfindahl"].build(spark, sf_dir).collect()
    }
    for seg, nats in by.items():
        t = sum(nats.values())
        hhi = sum((c / t) ** 2 for c in nats.values())
        assert got[seg]["n_nations"] == len(nats)
        assert abs(got[seg]["hhi"] - hhi) < 1e-4
        assert got[seg]["concentrated"] == (hhi > 0.25)
        # HHI lower bound: 1/k for k players
        assert got[seg]["hhi"] >= 1.0 / len(nats) - 1e-9


def test_interleave_matches_python(spark, sf_dir):
    rows = _con(sf_dir).execute(
        "SELECT doc_id, source FROM documents"
    ).fetchall()
    by = defaultdict(list)
    for doc_id, srcx in rows:
        by[srcx].append(doc_id)
    sources = sorted(by)
    order = []
    for srcx in sources:
        for r, doc in enumerate(sorted(by[srcx])):
            order.append((r * len(sources) + sources.index(srcx), doc, srcx))
    order.sort()
    got = REGISTRY["pipeline_interleave_roundrobin"].build(
        spark, sf_dir
    ).collect()
    assert len(got) == 30
    for row, (pos, doc, srcx) in zip(got, order[:30]):
        assert row["pos"] == pos
        assert row["doc_id"] == doc
        assert row["source"] == srcx
